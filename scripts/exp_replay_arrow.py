#!/usr/bin/env python
"""MEASURED-AND-REJECTED (round 16): a partitioned, executor-side
Arrow-RecordBatch replay source as a replacement for the simple
replay reader in the TRUE-stream sketch family.

Hypothesis (guide §4.1): the SimpleDataSourceStreamReader pickles
~batchRows tuples per trigger through the driver-side runner, so an
executor-side zero-copy Arrow slice should cut per-batch cost.

Measured result: the OPPOSITE. Spark 4.1's simple-reader wrapper
already converts the prefetched rows to Arrow **in the runner** and
caches them in the JVM (python_streaming_source_runner.py imports
records_to_arrow_batches), so executors read JVM-cached Arrow with NO
per-batch Python worker. The partitioned source below ADDS one Python
worker round-trip per micro-batch task (command unpickle + parquet
slice + Arrow hand-off): paired decomposition on q476 at 8 cores
showed addBatch 239 ms/batch (simple) vs 390 ms/batch (arrow), and
paired spot timings q473 9.3→14.3 s, q476 8.4→14.9 s. The engine
keeps the simple reader; this script preserves the experiment and the
equality proof (identical batch boundaries, rows and order).

    python scripts/exp_replay_arrow.py [batchRows]
"""

from __future__ import annotations

import glob
import os
import sys
import time
from collections.abc import Iterator, Sequence

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_TABLE_CACHE: dict[tuple, object] = {}
_TABLE_CACHE_MAX = 2


def _arrow_field_type(pa_type):
    import pyarrow as pa

    if pa.types.is_timestamp(pa_type):
        return pa.timestamp("us", tz="UTC")
    if pa.types.is_large_string(pa_type):
        return pa.string()
    if pa.types.is_large_binary(pa_type):
        return pa.binary()
    return pa_type


def _spark_ddl(pa_schema) -> str:
    import pyarrow as pa

    mapping = {
        "int64": "long", "int32": "int", "double": "double",
        "float": "float", "string": "string", "large_string": "string",
        "bool": "boolean",
    }
    parts = []
    for field in pa_schema:
        if pa.types.is_timestamp(field.type):
            t = "timestamp"
        else:
            t = mapping.get(str(field.type), "string")
        parts.append(f"{field.name} {t}")
    return ", ".join(parts)


def _load_table(path: str):
    """Executor-worker cached parquet load, cast to Spark's Arrow
    schema (ns→us timestamps, UTC instants — the same values the
    simple reader produces via pandas tz_localize)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    st = os.stat(path)
    key = (path, st.st_size, st.st_mtime_ns)
    tbl = _TABLE_CACHE.get(key)
    if tbl is None:
        raw = pq.read_table(path)
        target = pa.schema(
            [pa.field(f.name, _arrow_field_type(f.type)) for f in raw.schema]
        )
        tbl = raw.cast(target).combine_chunks()
        while len(_TABLE_CACHE) >= _TABLE_CACHE_MAX:
            _TABLE_CACHE.pop(next(iter(_TABLE_CACHE)))
        _TABLE_CACHE[key] = tbl
    return tbl


class ArrowRangePartition(InputPartition):
    def __init__(self, path: str, lo: int, hi: int) -> None:
        self.path = path
        self.lo = lo
        self.hi = hi


class ReplayArrowDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "replay_arrow"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        path = self.options.get("path")
        if not path or not os.path.exists(path):
            raise ValueError(f"replay_arrow requires an existing path, got {path!r}")
        return _spark_ddl(pq.ParquetFile(path).schema_arrow)

    def streamReader(self, schema) -> "ReplayArrowStreamReader":
        return ReplayArrowStreamReader(self.options)


class ReplayArrowStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        import pyarrow.parquet as pq

        self.path = options.get("path")
        self.batch_rows = int(options.get("batchrows", options.get("batchRows", 10000)))
        if self.batch_rows <= 0:
            raise ValueError("batchRows must be positive")
        self.n_rows = pq.ParquetFile(self.path).metadata.num_rows
        self._floor = 0

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        return {"row": min(self.n_rows, self._floor + self.batch_rows)}

    def commit(self, end: dict) -> None:
        self._floor = max(self._floor, end["row"])

    def partitions(self, start: dict, end: dict) -> Sequence[ArrowRangePartition]:
        lo, hi = start["row"], end["row"]
        self._floor = max(self._floor, hi)
        return [ArrowRangePartition(self.path, lo, hi)]

    def read(self, partition: ArrowRangePartition) -> Iterator:
        if partition.hi <= partition.lo:
            return iter(())
        tbl = _load_table(partition.path)
        return iter(tbl.slice(partition.lo, partition.hi - partition.lo).to_batches())


def main() -> None:
    from pyspark.sql import functions as F

    from cli_spark.session import get_spark
    from cli_spark.sources.replay_datasource import register_replay_source
    from cli_spark.tables import load_table as load

    batch_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 257
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("replay-arrow-ab")
    spark.sparkContext.setLogLevel("ERROR")
    register_replay_source(spark)
    spark.dataSource.register(ReplayArrowDataSource)

    import tempfile

    d = tempfile.mkdtemp(prefix="replay_arrow_ab_") + "/file"
    e = load(spark, sf_dir, "events")
    (
        e.select("event_type", "event_id", "ts",
                 F.expr("CAST(floor(value * 100.0) AS BIGINT)").alias("cents"))
        .repartition(1)
        .sortWithinPartitions(F.unix_micros("ts"), F.col("event_id"))
        .write.mode("overwrite").parquet(d)
    )
    [part] = glob.glob(os.path.join(d, "part-*.parquet"))

    def drain(fmt: str):
        batches = []

        def sink(batch_df, batch_id):
            batches.append((batch_id, batch_df.collect()))

        stream = (
            spark.readStream.format(fmt)
            .option("path", part).option("batchRows", batch_rows).load()
        )
        t0 = time.perf_counter()
        q = stream.writeStream.foreachBatch(sink).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return batches, time.perf_counter() - t0

    for rep in range(2):
        simple, t_simple = drain("replay")
        arrow, t_arrow = drain("replay_arrow")
        assert [b for b, _ in arrow] == [b for b, _ in simple]
        for (_, ra), (_, rs) in zip(arrow, simple):
            assert ra == rs
        print(f"rep{rep}: batch sequences IDENTICAL over {len(simple)} batches; "
              f"simple {t_simple:.2f}s vs arrow {t_arrow:.2f}s", flush=True)


if __name__ == "__main__":
    main()
