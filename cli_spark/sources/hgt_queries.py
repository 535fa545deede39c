"""Graded queries over the HGT source (rows-only checks — the DuckDB
oracle's views are fixed to the driver tables, so these self-contained
Tier-A queries are verified by golden pytest assertions instead;
see tests/test_hgt.py).

Fixtures are generated deterministically under the repo's own
`.fixtures/` dir (gitignored) — never outside /root/repo.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.plans.registry import register
from cli_spark.sources import hgt

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".fixtures", "hgt")


def _raw(spark: SparkSession) -> DataFrame:
    hgt.ensure_fixtures(FIXTURE_DIR)
    return hgt.read_hgt(spark, FIXTURE_DIR)


@register(
    "q110_hgt_decode_stats",
    oracle=None,  # self-contained source (not a driver view) — golden-tested in pytest
    tags=("hgt", "tier_a", "source"),
)
def q110_hgt_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-grid scan [A6] + void normalization [A8] rolled up per
    cell: sample counts, void counts, min/max/sum elevation. Exercises
    filename parse [A4], shape inference [A5], numpy mapInPandas
    decode, and NULL semantics of the void sentinel."""
    pts = hgt.decode_points(_raw(spark))
    return (
        pts.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.count("alt").alias("n_valid"),
            (F.count(F.lit(1)) - F.count("alt")).alias("n_void"),
            F.min("alt").alias("min_alt"),
            F.max("alt").alias("max_alt"),
            F.sum("alt").cast("long").alias("sum_alt"),
            F.round(F.min("lat"), 6).alias("min_lat"),
            F.round(F.max("lat"), 6).alias("max_lat"),
            F.round(F.min("lng"), 6).alias("min_lng"),
            F.round(F.max("lng"), 6).alias("max_lng"),
        )
        .orderBy("cell")
    )


@register(
    "q111_hgt_point_lookup",
    oracle=None,
    tags=("hgt", "tier_a", "lookup"),
)
def q111_hgt_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O(1) point lookups [A7] — NW corner, center, SE corner of each
    cell — decoded via byte-slice expressions on the raw content
    (no grid decode). The reference's `gmalt-hgtread` equivalent."""
    raw = _raw(spark)
    probes = [
        ("nw_corner", lambda la, ln: (la + 1.0, ln + 0.0)),
        ("center", lambda la, ln: (la + 0.5, ln + 0.5)),
        ("se_corner", lambda la, ln: (la + 0.0, ln + 1.0)),
    ]
    outs = []
    for cell, _phase in hgt.FIXTURE_CELLS:
        corner_lat, corner_lng = hgt.parse_cell_name(cell)
        for label, fn in probes:
            plat, plng = fn(corner_lat, corner_lng)
            outs.append(
                raw.filter(F.col("cell") == cell).select(
                    "cell",
                    F.lit(label).alias("probe"),
                    F.lit(float(plat)).alias("lat"),
                    F.lit(float(plng)).alias("lng"),
                    hgt.point_lookup_col(plat, plng).alias("alt"),
                )
            )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result.orderBy("cell", "probe")


@register(
    "q112_hgt_tiles",
    oracle=None,
    tags=("hgt", "tier_a", "tiles"),
)
def q112_hgt_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile iterator [A9] (`--sample 50 50` equivalent): per cell,
    tile count and value-conservation stats (total values across
    tiles == grid size; per-tile dims recorded)."""
    tiles = hgt.decode_tiles(_raw(spark), width=50, height=50)
    return (
        tiles.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.countDistinct("tile_row").alias("tile_rows"),
            F.countDistinct("tile_col").alias("tile_cols"),
            F.sum(F.size("values")).cast("long").alias("total_values"),
            F.max("width").alias("max_w"),
            F.min("width").alias("min_w"),
            F.max("height").alias("max_h"),
            F.min("height").alias("min_h"),
        )
        .orderBy("cell")
    )
