"""Grid-bucketed spatial operators.

The scale pattern behind every distributed spatial join (GeoSpark /
Sedona, ESRI Hive, Magellan — all public systems): never compare all
point pairs; snap points to a fixed grid and equi-join each probe
point's cell against the 3×3 neighborhood cells of the build side.
Catalyst executes it as an ordinary shuffled hash join on the cell
key — the pair space is bounded by grid density, not N².

Coordinates here are synthetic-deterministic (md5-derived bytes in
[0, 256), the testdata ships no geo columns) so both engines derive
identical integer point sets; distances are exact integer squared
Euclidean — no floating point, no trig.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# md5-derived uniform byte in [0, 256) — same portable construction
# as sampling.py (hex digit 1 * 16 + hex digit 2).
_BYTE = (
    "(instr('0123456789abcdef', substr(md5({key}), 1, 1)) - 1) * 16"
    " + instr('0123456789abcdef', substr(md5({key}), 2, 1)) - 1"
)

_CELL = 32  # grid pitch; 256/32 = 8×8 cells

_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

_SQL_OFFSETS = ", ".join(f"({dx}, {dy})" for dx, dy in _OFFSETS)


@register(
    "q275_grid_nn_join",
    oracle=f"""
WITH cust AS (
  SELECT c_custkey,
         {_BYTE.format(key="'cx' || CAST(c_custkey AS VARCHAR)")} AS x,
         {_BYTE.format(key="'cy' || CAST(c_custkey AS VARCHAR)")} AS y
  FROM customer
),
supp AS (
  SELECT s_suppkey,
         {_BYTE.format(key="'sx' || CAST(s_suppkey AS VARCHAR)")} AS sx,
         {_BYTE.format(key="'sy' || CAST(s_suppkey AS VARCHAR)")} AS sy
  FROM supplier
),
neigh AS (
  SELECT s.s_suppkey, s.sx, s.sy,
         s.sx // {_CELL} + d.dx AS cx,
         s.sy // {_CELL} + d.dy AS cy
  FROM supp s CROSS JOIN (VALUES {_SQL_OFFSETS}) AS d(dx, dy)
),
cand0 AS (
  SELECT c.c_custkey, c.x, c.y, n.s_suppkey,
         (c.x - n.sx) * (c.x - n.sx) + (c.y - n.sy) * (c.y - n.sy) AS dist2
  FROM cust c
  JOIN neigh n ON c.x // {_CELL} = n.cx AND c.y // {_CELL} = n.cy
),
cand AS (
  SELECT c_custkey, x, y, s_suppkey, dist2,
         ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY dist2 ASC, s_suppkey ASC) AS rn
  FROM cand0
)
SELECT c.c_custkey, c.x, c.y,
       k.s_suppkey AS nn_suppkey,
       k.dist2 AS nn_dist2
FROM cust c
LEFT JOIN (SELECT * FROM cand WHERE rn = 1) k ON c.c_custkey = k.c_custkey
""",
    tags=("spatial", "join", "grid"),
)
def q275_grid_nn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed nearest-neighbor join: every customer point finds
    its nearest supplier point, searching ONLY the 3×3 grid cells
    around the customer's cell. The build side explodes 9× into
    (cell, point) rows and the probe side equi-joins on its own cell —
    a shuffled hash join whose candidate count is bounded by grid
    occupancy, never a cross join (at 100 TB, pick the pitch so a cell
    holds ~10²–10³ build points and the same plan holds). Customers
    whose neighborhood is empty survive with NULLs via the final left
    join. Distances are exact integer squared Euclidean; ties break on
    s_suppkey so both engines elect the same neighbor."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(_BYTE.format(key="'cx' || CAST(c_custkey AS STRING)")).alias("x"),
        F.expr(_BYTE.format(key="'cy' || CAST(c_custkey AS STRING)")).alias("y"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.expr(_BYTE.format(key="'sx' || CAST(s_suppkey AS STRING)")).alias("sx"),
        F.expr(_BYTE.format(key="'sy' || CAST(s_suppkey AS STRING)")).alias("sy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _OFFSETS
        ]
    )
    neigh = supp.select(
        "s_suppkey", "sx", "sy", F.explode(offsets).alias("d")
    ).select(
        "s_suppkey",
        "sx",
        "sy",
        (F.expr(f"sx div {_CELL}") + F.col("d.dx")).alias("cx"),
        (F.expr(f"sy div {_CELL}") + F.col("d.dy")).alias("cy"),
    )
    cand = cust.join(
        neigh,
        (F.expr(f"x div {_CELL}") == F.col("cx"))
        & (F.expr(f"y div {_CELL}") == F.col("cy")),
    ).select(
        "c_custkey",
        "x",
        "y",
        "s_suppkey",
        (
            (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx"))
            + (F.col("y") - F.col("sy")) * (F.col("y") - F.col("sy"))
        ).alias("dist2"),
    )
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("dist2").asc(), F.col("s_suppkey").asc()
    )
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", F.col("s_suppkey").alias("nn_suppkey"),
                F.col("dist2").alias("nn_dist2"))
    )
    return cust.join(best, "c_custkey", "left").select(
        "c_custkey", "x", "y", "nn_suppkey", "nn_dist2"
    )


# q388: geohash in pure integer arithmetic. 15-bit quantizers per
# axis; interleave lon-first MSB-down into a 30-bit cell id; 6 chars
# of the standard base32 alphabet. Identical text runs in both
# engines except the integer-divide spelling.
_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _gh_interleave(div: str) -> str:
    """30-bit geohash cell id from lon_q/lat_q (15-bit each):
    bit (29-2i) = lon bit (14-i), bit (28-2i) = lat bit (14-i)."""
    terms = []
    for i in range(15):
        terms.append(f"(((lon_q {div} {2 ** (14 - i)}) % 2) * {2 ** (29 - 2 * i)})")
        terms.append(f"(((lat_q {div} {2 ** (14 - i)}) % 2) * {2 ** (28 - 2 * i)})")
    return "(" + " + ".join(terms) + ")"


def _gh_chars(div: str) -> str:
    parts = [
        f"substr('{_GH_ALPHABET}', CAST((g {div} {2 ** (25 - 5 * j)}) % 32 AS INTEGER) + 1, 1)"
        for j in range(6)
    ]
    return " || ".join(parts)


_GH_CORE = """
WITH pts AS (
  SELECT user_id, event_id,
         (user_id * 37) % 18000 AS lat_cd,
         (event_id * 91) % 36000 AS lon_cd
  FROM events
),
q AS (
  SELECT user_id,
         (lat_cd * 32768) {div} 18000 AS lat_q,
         (lon_cd * 32768) {div} 36000 AS lon_q
  FROM pts
),
cells AS (SELECT user_id, {inter} AS g FROM q),
hashed AS (SELECT user_id, {chars} AS geohash FROM cells),
pre AS (
  SELECT substr(geohash, 1, 3) AS prefix,
         COUNT(*) AS n_events,
         COUNT(DISTINCT user_id) AS n_users,
         MIN(geohash) AS min_hash
  FROM hashed GROUP BY substr(geohash, 1, 3)
)
SELECT prefix, CAST(n_events AS BIGINT) AS n_events,
       CAST(n_users AS BIGINT) AS n_users, min_hash
FROM pre
ORDER BY n_events DESC, prefix
LIMIT 10
"""


@register(
    "q388_geohash_encode",
    oracle=_GH_CORE.format(
        div="//", inter=_gh_interleave("//"), chars=_gh_chars("//")
    ),
    tags=("geo", "geohash", "bucketing"),
)
def q388_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding (Niemeyer's public base32 Z-curve — the geo
    bucketing standard Spark has no native function for): coordinates
    quantize to 15 bits/axis, interleave longitude-first MSB-down
    into a 30-bit cell id, and emit 6 base32 chars — every shared
    PREFIX is a containing cell, which is what makes geohash the
    join/partition key for proximity work (q275's grid join with a
    standard, truncatable spelling; q113's z-order with a public
    alphabet). Coordinates here derive deterministically from event
    ids in integer centidegrees, so the whole pipeline — quantize,
    interleave, base32 — is exact integer arithmetic + substr on
    both engines, zero floats. Graded: top-10 3-char prefixes with
    event/user counts (the bucketing histogram a geo-partitioner
    would plan from). All codegen-able expressions, one exchange for
    the prefix census."""
    from cli_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_GH_CORE.format(
        div="div", inter=_gh_interleave("div"), chars=_gh_chars("div")
    ))
