"""Unit tests for the q426 event-time-timeout session handler — pure
Python via a fake GroupState, no Spark session needed. Covers the
three emission paths (in-batch gap split, hasTimedOut callback,
already-expired short-circuit) and the setTimeoutTimestamp re-arm."""

import pandas as pd

from cli_spark.streaming.round10_handlers import (
    GAP_MS,
    GAP_US,
    session_timeout_handler,
)


class FakeState:
    def __init__(self, value=None, timed_out=False, wm_ms=0):
        self._v = value
        self.hasTimedOut = timed_out
        self._wm = wm_ms
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v, self.removed = None, True

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ms):
        if ms <= self._wm:
            raise ValueError("timeout must be > watermark")
        self.timeout_ms = ms


def _run(state, ts_us_rows):
    pdf = pd.DataFrame({"ts": pd.to_datetime([u * 1000 for u in ts_us_rows])})
    return list(session_timeout_handler((7,), iter([pdf]), state))


def test_gap_split_emits_closed_session_and_arms_timeout():
    t0 = 1_000_000_000_000  # us
    state = FakeState(wm_ms=0)
    out = _run(state, [t0, t0 + 60_000_000, t0 + 60_000_000 + GAP_US + 1])
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["n_rows"], row["t0_us"], row["t1_us"]) == (2, t0, t0 + 60_000_000)
    # open session re-armed at last + gap
    last = t0 + 60_000_000 + GAP_US + 1
    assert state.get == (last, last, 1)
    assert state.timeout_ms == last // 1000 + GAP_MS


def test_timed_out_state_emits_and_removes():
    state = FakeState(value=(100, 200, 3), timed_out=True)
    out = list(session_timeout_handler((7,), iter([]), state))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["user_id"], row["n_rows"], row["t0_us"], row["t1_us"]) == (7, 3, 100, 200)
    assert state.removed


def test_already_expired_short_circuit_never_calls_set_timeout():
    # watermark already past last+gap: handler must emit directly —
    # setTimeoutTimestamp would raise (contract: timestamp > watermark)
    t0 = 1_000_000_000_000
    wm_ms = t0 // 1000 + GAP_MS + 999_999
    state = FakeState(wm_ms=wm_ms)
    out = _run(state, [t0])
    assert len(out) == 1
    assert out[0].iloc[0]["n_rows"] == 1
    assert state.timeout_ms is None
    assert not state.exists


def test_state_continues_across_batches():
    t0 = 1_000_000_000_000
    state = FakeState(value=(t0, t0, 2), wm_ms=0)
    out = _run(state, [t0 + 1_000_000])  # within gap: extends, no emit
    assert out == []
    assert state.get == (t0, t0 + 1_000_000, 3)
