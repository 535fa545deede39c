"""Synthetic scale-up for scale-proofing benchmarks.

The driver's testdata tops out at sf0.1 (~600k lineitem rows).
`ensure_scaled` manufactures an sf1-equivalent dataset (10× rows) by
unioning REPLICAS shifted copies of every sf0.1 table with
join-consistent key offsets, so the same registry queries run
unmodified at 10× — bench.py times a subset there and reports the
sf1/sf0.1 ratio per class (a super-linear ratio flags an operator
whose plan wouldn't survive the next 100×).

Replica construction preserves each query's complexity class:

* fact/dim keys shift by ``replica * _STRIDE`` on BOTH sides of every
  join (orders↔lineitem on orderkey, customer↔orders on custkey, …),
  so join fan-outs stay 1:1 with the original;
* nation/region stay single-copy (real dims don't grow with fact
  volume) — FK columns that point at them are left unshifted;
* document text gets a per-replica marker appended to every 5th word:
  ≥60% of word-3-gram shingles differ between replicas, so replica
  pairs sit far below the 0.5/0.7 near-dup thresholds and the dedup
  benches (q70/q73/q151) keep their true candidate distribution
  instead of finding every doc 10×-duplicated;
* embeddings get a per-replica epsilon so vector identity isn't
  degenerate, small enough (1e-3) to leave the cosine geometry alone.

Everything is pure DataFrame lineage — one read, REPLICAS projected
unions, one parquet write per table; no driver-side rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.tables import TABLE_NAMES, load_table

REPLICAS = 10
_STRIDE = 100_000_000  # >> any sf0.1 key; 10 replicas stay far under 2^63

# key columns shifted per replica, per table (join-consistent)
_SHIFT: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

# version tag: bump when the construction changes so stale caches regen
_MARKER = "_SCALE_COMPLETE_v1"


def _replica(df: DataFrame, table: str, i: int) -> DataFrame:
    if i == 0:
        return df
    out = df
    for key in _SHIFT.get(table, ()):
        out = out.withColumn(key, (F.col(key) + F.lit(i * _STRIDE)).cast("long"))
    if table == "documents":
        # marker on every 5th word; n_chars re-derived to stay consistent
        out = out.withColumn(
            "text",
            F.expr(
                "array_join(transform(split(text, ' '), (w, j) -> "
                f"CASE WHEN j % 5 = 4 THEN concat(w, 'r{i}') ELSE w END), ' ')"
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings":
        out = out.withColumn(
            "embedding",
            F.expr(f"transform(embedding, x -> cast(x + {i} * 0.001 as float))"),
        )
    return out


def ensure_scaled(spark: SparkSession, src_dir: str, dst_dir: str,
                  replicas: int = REPLICAS) -> str:
    """Materialize the scaled dataset under dst_dir (idempotent: a
    marker file skips regeneration). ``replicas`` sets the scale-up
    factor (10 = the bench's sf1 tier; 30 = the sf3 tier the
    near-linear classes are swept at). Returns dst_dir."""
    marker = os.path.join(dst_dir, _MARKER)
    if os.path.exists(marker):
        return dst_dir
    if replicas * _STRIDE >= 2 ** 62:
        raise ValueError(f"replicas={replicas} would overflow shifted keys")
    os.makedirs(dst_dir, exist_ok=True)
    for table in TABLE_NAMES:
        base = load_table(spark, src_dir, table)
        if table in ("region", "nation"):
            scaled = base
        else:
            scaled = base
            for i in range(1, replicas):
                scaled = scaled.unionByName(_replica(base, table, i))
        scaled.write.mode("overwrite").parquet(os.path.join(dst_dir, f"{table}.parquet"))
    with open(marker, "w") as f:
        f.write(f"replicas={replicas} stride={_STRIDE} src={src_dir}\n")
    return dst_dir
