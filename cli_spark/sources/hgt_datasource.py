"""`spark.read.format("hgt")` — a Spark 4 Python DataSource for SRTM
elevation grids, the idiomatic final form of the A6 grid scan.

Where `sources/hgt.py` composes binaryFile + mapInPandas (two plan
nodes), this registers a first-class source: the planner asks
:meth:`HgtReader.partitions` for the file list (one input partition
per 1°-cell file — the natural parallelism unit; a 100 TB corpus is
~28M cells → ~28M independent splits, schedulable across any number
of executors), and each task decodes its file vectorized in numpy and
ships Arrow RecordBatches straight into the scan node — no Python row
loop anywhere.

Semantics are identical to `hgt.decode_points` (north-edge-first rows,
S/W-signed corners, fencepost grid, void→NULL) and asserted equal in
tests/test_hgt.py.

Usage::

    register_hgt_source(spark)          # once per session
    df = spark.read.format("hgt").load("/data/srtm/")
    # ├─ cell: string   ├─ lat: double  ├─ lng: double  ├─ alt: int (NULL = void)
"""

from __future__ import annotations

import glob
import math
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

VOID = -32768

SCHEMA = "cell string, lat double, lng double, alt int"


class HgtDataSource(DataSource):
    """Python DataSource (Spark 4 API) for directories of `.hgt` files."""

    @classmethod
    def name(cls) -> str:
        return "hgt"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "HgtReader":
        return HgtReader(self.options)


class HgtReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("hgt source requires a path: .load('/dir/of/hgt')")

    def partitions(self) -> list[InputPartition]:
        """One partition per cell file — planner-side listing only
        (names and sizes, never content)."""
        if os.path.isdir(self.path):
            files = sorted(glob.glob(os.path.join(self.path, "*.hgt")))
        else:
            files = [self.path]
        if not files:
            raise FileNotFoundError(f"no .hgt files under {self.path}")
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition) -> Iterator:
        """Decode one cell file → Arrow RecordBatch (vectorized)."""
        import numpy as np
        import pyarrow as pa

        from cli_spark.sources.hgt import parse_cell_name

        path = partition.value
        cell = os.path.basename(path).replace(".hgt", "")
        corner_lat, corner_lng = parse_cell_name(cell)
        with open(path, "rb") as fh:
            buf = fh.read()
        n2 = len(buf) // 2
        n = math.isqrt(n2)
        if n * n != n2:
            raise ValueError(f"{cell}: size {len(buf)} is not a square grid")
        grid = np.frombuffer(buf, dtype=">i2").astype(np.int32)
        step = 1.0 / (n - 1)
        lats = corner_lat + 1 - np.arange(n) * step  # row 0 = north edge
        lngs = corner_lng + np.arange(n) * step
        lat_m, lng_m = np.meshgrid(lats, lngs, indexing="ij")
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([cell] * (n * n), type=pa.string()),
                pa.array(lat_m.ravel(), type=pa.float64()),
                pa.array(lng_m.ravel(), type=pa.float64()),
                pa.array(grid, type=pa.int32(), mask=(grid == VOID)),
            ],
            names=["cell", "lat", "lng", "alt"],
        )


def register_hgt_source(spark) -> None:
    """Make ``format("hgt")`` available on this session (idempotent)."""
    spark.dataSource.register(HgtDataSource)
