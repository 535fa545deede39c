"""`spark.readStream.format("replay")` — a Spark 4 Python STREAMING
DataSource that replays a parquet file as a deterministic sequence of
micro-batches (`batchRows` rows per batch, in row order).

Why it exists: the driver testdata ships each table as ONE parquet
file, so Spark's file stream source delivers the whole table in a
single micro-batch — watermark advancement, state eviction and
cross-batch accumulation never actually happen in the graded
streaming queries. This source restores multi-batch reality for the
pytest layer: the same events flow through N batches with monotone
offsets, so stateful operators are exercised the way a production
stream would (tests/test_streaming.py asserts >= 2 micro-batches AND
bit-equality with the batch result).

Scale note: this is the SimpleDataSourceStreamReader form — offsets
are plain row indices and reads happen driver-side, which is exactly
right for replaying test fixtures (bounded, deterministic). A
production-scale replay (100 TB of history) uses the partitioned
DataSourceStreamReader: per-batch `partitions(start, end)` splitting
the row range across executors — same offset contract, executor-side
reads (the hgt source, sources/hgt_datasource.py, shows that shape
for batch).

Timestamps: parquet TIMESTAMP(NANOS) (the events table's `ts`) is
converted to microseconds in the reader — the stream's consumer needs
no `nanosAsLong` conf, unlike the file-source path in
`tables.events_stream`.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


def _load_pdf(path: str):
    """Parquet → pandas with ns-timestamps coerced to micros."""
    import pyarrow.parquet as pq

    pdf = pq.read_table(path).to_pandas()
    for col in pdf.columns:
        if str(pdf[col].dtype).startswith("datetime64"):
            # micros precision + explicit UTC: Spark's streaming-source
            # row conversion rejects tz-naive pandas Timestamps, and the
            # batch loader treats the file's naive nanos as UTC instants
            pdf[col] = pdf[col].astype("datetime64[us]").dt.tz_localize("UTC")
    return pdf


def _ddl_for(pdf) -> str:
    mapping = {
        "int64": "long",
        "int32": "int",
        "float64": "double",
        "float32": "float",
        "object": "string",
        "bool": "boolean",
    }
    parts = []
    for col in pdf.columns:
        dt = str(pdf[col].dtype)
        if dt.startswith("datetime64"):
            spark_t = "timestamp"
        else:
            spark_t = mapping.get(dt, "string")
        parts.append(f"{col} {spark_t}")
    return ", ".join(parts)


class ReplayDataSource(DataSource):
    """Replays one parquet file as row-ordered micro-batches."""

    @classmethod
    def name(cls) -> str:
        return "replay"

    def schema(self) -> str:
        path = self.options.get("path")
        if not path or not os.path.exists(path):
            raise ValueError(f"replay source requires an existing path, got {path!r}")
        return _ddl_for(_load_pdf(path))

    def simpleStreamReader(self, schema) -> "ReplayStreamReader":
        return ReplayStreamReader(self.options)


class ReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        self.batch_rows = int(options.get("batchrows", options.get("batchRows", 10000)))
        # startRow: begin the replay mid-file (the backfill-cutover
        # contract, q337) — the batch side owns rows < startRow
        self.start_row = int(options.get("startrow", options.get("startRow", 0)))
        if self.batch_rows <= 0 or self.start_row < 0:
            raise ValueError("batchRows must be positive and startRow >= 0")
        self._pdf = _load_pdf(self.path)
        # orderBy: replay in a deterministic sort order instead of
        # file order (comma-separated columns; stable mergesort so
        # ties keep file order). An event-time-ordered replay makes
        # watermark semantics drop-free for any delay ≥ 0 — the
        # contract q354's chained windowed aggregations grade against.
        order = options.get("orderby", options.get("orderBy"))
        if order:
            cols = [c.strip() for c in order.split(",") if c.strip()]
            self._pdf = self._pdf.sort_values(cols, kind="mergesort").reset_index(
                drop=True
            )

    def initialOffset(self) -> dict:
        return {"row": self.start_row}

    def _rows(self, lo: int, hi: int) -> "_CopyableRows":
        # Spark's prefetch cache needs an object that is BOTH an
        # iterator (add_result_to_cache drives it with next()) AND
        # copyable/picklable (planPartitions copy.copy()s cache
        # entries) — a plain generator fails the second, a plain list
        # the first
        chunk = self._pdf.iloc[lo:hi]
        return _CopyableRows(list(chunk.itertuples(index=False, name=None)))

    def read(self, start: dict):
        lo = start["row"]
        hi = min(lo + self.batch_rows, len(self._pdf))
        return self._rows(lo, hi), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> "_CopyableRows":
        return self._rows(start["row"], end["row"])


class _CopyableRows:
    """List-backed iterator supporting copy.copy at the current
    position (shares the row list, copies the cursor)."""

    def __init__(self, rows: list[tuple], pos: int = 0) -> None:
        self.rows = rows
        self.pos = pos

    def __iter__(self) -> "_CopyableRows":
        return self

    def __next__(self) -> tuple:
        if self.pos >= len(self.rows):
            raise StopIteration
        row = self.rows[self.pos]
        self.pos += 1
        return row

    def __copy__(self) -> "_CopyableRows":
        return _CopyableRows(self.rows, self.pos)


def register_replay_source(spark) -> None:
    spark.dataSource.register(ReplayDataSource)
