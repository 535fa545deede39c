"""Worker-side state handler for q426.

Kept module-level (not a closure) so cloudpickle serializes it by
reference and Python workers import it from the installed cli_spark
package path rather than re-pickling the function body — worker
processes do not share the driver's cwd, so by-reference import is
the only reliable transport for stateful handlers."""

from __future__ import annotations

GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, microseconds
GAP_MS = GAP_US // 1000


def session_timeout_handler(key, pdf_iter, state):
    """Sessionize one user's events with an event-time timeout.

    State: (t0_us, t1_us, n_rows) of the currently-open session.
    Emits a row per CLOSED session via three paths: in-batch gap
    split, state.hasTimedOut (watermark passed last+gap with no new
    rows), and the already-expired short-circuit (watermark passed
    last+gap within the same batch that delivered the rows —
    setTimeoutTimestamp would raise there, per its > watermark
    contract)."""
    import pandas as pd

    user = key[0]
    out: list[tuple[int, int, int, int]] = []
    if state.hasTimedOut:
        t0, t1, n = state.get
        out.append((user, n, t0, t1))
        state.remove()
    else:
        frames = [pdf for pdf in pdf_iter if len(pdf)]
        if frames:
            df = pd.concat(frames).sort_values("ts")
            ts_us = (df["ts"].astype("int64") // 1000).astype("int64")
            if state.exists:
                t0, t1, n = state.get
            else:
                t0 = t1 = None
                n = 0
            for u in ts_us:
                u = int(u)
                if t0 is None:
                    t0 = t1 = u
                    n = 1
                elif u - t1 > GAP_US:
                    out.append((user, n, t0, t1))
                    t0 = t1 = u
                    n = 1
                else:
                    t1 = u
                    n += 1
            wm_ms = state.getCurrentWatermarkMs()
            expiry_ms = t1 // 1000 + GAP_MS
            if expiry_ms <= wm_ms:
                out.append((user, n, t0, t1))
                state.remove()
            else:
                state.update((t0, t1, n))
                state.setTimeoutTimestamp(expiry_ms)
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "n_rows", "t0_us", "t1_us"]
        )
