"""Graded queries over the HGT source. The DuckDB oracle's views are
fixed to the driver tables, but the fixture grids are DETERMINISTIC,
so each query's expected output is a closed-form literal: the oracles
are VALUES relations recomputed with independent numpy arithmetic
(the same ground-truth style as tests/test_hgt.py), making these
Tier-A checks hash-graded rather than rows-only.

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
    # The fixture is deterministic (synth_grid: seeded trig field, no
    # RNG), so the expected rollup is a closed-form literal. The VALUES
    # below were recomputed with INDEPENDENT numpy arithmetic (not by
    # running the engine) — same ground-truth style as tests/test_hgt.py
    # — which upgrades this Tier-A check from rows-only to hash-graded.
    oracle="""
SELECT * FROM (VALUES
  ('N00E000', 58081, 57482, 599, -1499, 1499, -2644097, 0.0, 1.0, 0.0, 1.0),
  ('N46E007', 58081, 57482, 599, -1499, 1499, 2867479, 46.0, 47.0, 7.0, 8.0),
  ('S01W072', 58081, 57482, 599, -1498, 1498, 1578258, -1.0, 0.0, -72.0, -71.0)
) AS t(cell, n_points, n_valid, n_void, min_alt, max_alt, sum_alt,
       min_lat, max_lat, min_lng, max_lng)
""",
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
    # Independent numpy goldens over the deterministic fixture (see
    # q110 note). NW corners land on a void lattice index (row 0, col
    # 0 is index 0, and synth_grid voids every 97th flat index
    # starting at 0) → NULL.
    oracle="""
SELECT * FROM (VALUES
  ('N00E000', 'center',    0.5,  0.5,  687),
  ('N00E000', 'nw_corner', 1.0,  0.0,  NULL),
  ('N00E000', 'se_corner', 0.0,  1.0,  -139),
  ('N46E007', 'center',    46.5, 7.5,  -778),
  ('N46E007', 'nw_corner', 47.0, 7.0,  NULL),
  ('N46E007', 'se_corner', 46.0, 8.0,  -51),
  ('S01W072', 'center',    -0.5, -71.5, -641),
  ('S01W072', 'nw_corner', 0.0,  -72.0, NULL),
  ('S01W072', 'se_corner', -1.0, -71.0, -1347)
) AS t(cell, probe, lat, lng, alt)
""",
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
    # Independent closed-form goldens: 241/50 → 5 tile rows/cols of
    # width 50 with a 41-wide remainder; values conserve the 241²
    # grid exactly (see q110 note).
    oracle="""
SELECT * FROM (VALUES
  ('N00E000', 25, 5, 5, 58081, 50, 41, 50, 41),
  ('N46E007', 25, 5, 5, 58081, 50, 41, 50, 41),
  ('S01W072', 25, 5, 5, 58081, 50, 41, 50, 41)
) AS t(cell, n_tiles, tile_rows, tile_cols, total_values,
       max_w, min_w, max_h, min_h)
""",
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


@register(
    "q265_hgt_slope_stats",
    # Ground truth recomputed with INDEPENDENT numpy arithmetic from
    # the deterministic fixture definition (central differences over
    # the synth trig field, voids masked from BOTH step endpoints) —
    # the same VALUES-literal oracle style as q110–q112.
    oracle="""
SELECT * FROM (VALUES
  ('N00E000', 56647, 56647, 3588184, 5128423, 100, 143, 22317, 20297),
  ('N46E007', 56647, 56647, 3575198, 5126561, 100, 143, 22312, 20298),
  ('S01W072', 56647, 56647, 3620347, 5166145, 100, 143, 23107, 19619)
) AS t(cell, n_dx, n_dy, sum_abs_dx, sum_abs_dy, max_abs_dx, max_abs_dy,
       n_steep_dx, n_steep_dy)
""",
    tags=("hgt", "tier_a", "terrain"),
)
def q265_hgt_slope_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terrain-derivative pass over the decoded elevation grid [A6]:
    per cell, the adjacent-sample difference field (the discrete
    slope a hillshade/gradient product computes) — step counts, total
    and maximum absolute rise in both axes, and steep-step censuses
    (|Δ| > 80 east-west, > 120 north-south). A step is valid only if
    BOTH endpoints are non-void [A8]. The differences are vectorized
    numpy inside the same Arrow-batched mapInPandas as the grid
    decode — one pass over the raw bytes, no point-level shuffle (the
    per-cell stats aggregate inside the decoder), and the tiny
    3-row rollup is the only thing that leaves Python."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    raw = _raw(spark).select("path", "content")
    schema = (
        "cell string, n_dx long, n_dy long, sum_abs_dx long, sum_abs_dy long, "
        "max_abs_dx long, max_abs_dy long, n_steep_dx long, n_steep_dy long"
    )

    def _slopes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {k: [] for k in
                    ("cell", "n_dx", "n_dy", "sum_abs_dx", "sum_abs_dy",
                     "max_abs_dx", "max_abs_dy", "n_steep_dx", "n_steep_dy")}
            for path, content in zip(pdf["path"], pdf["content"]):
                cell = os.path.splitext(os.path.basename(path))[0]
                buf = np.frombuffer(bytes(content), dtype=">i2")
                n = int(np.sqrt(buf.size))
                g = buf.reshape(n, n).astype(np.int64)
                valid = g != hgt.VOID
                both_h = valid[:, 1:] & valid[:, :-1]
                both_v = valid[1:, :] & valid[:-1, :]
                dx = (g[:, 1:] - g[:, :-1])[both_h]
                dy = (g[1:, :] - g[:-1, :])[both_v]
                recs["cell"].append(cell)
                recs["n_dx"].append(int(both_h.sum()))
                recs["n_dy"].append(int(both_v.sum()))
                recs["sum_abs_dx"].append(int(np.abs(dx).sum()))
                recs["sum_abs_dy"].append(int(np.abs(dy).sum()))
                recs["max_abs_dx"].append(int(np.abs(dx).max()))
                recs["max_abs_dy"].append(int(np.abs(dy).max()))
                recs["n_steep_dx"].append(int((np.abs(dx) > 80).sum()))
                recs["n_steep_dy"].append(int((np.abs(dy) > 120).sum()))
            yield pd.DataFrame(recs)

    return raw.mapInPandas(_slopes, schema).orderBy("cell")


ACQUIRE_DIR = os.path.join(os.path.dirname(FIXTURE_DIR), "hgt_acquire")


@register(
    "q266_hgt_acquire_pipeline",
    # Same closed-form literals as q110: the acquire path must land
    # byte-identical grids (catalog → fetch → unzip → decode), so the
    # decode rollup equals the direct-read rollup exactly.
    oracle="""
SELECT * FROM (VALUES
  ('N00E000', 58081, 57482, 599, -1499, 1499, -2644097),
  ('N46E007', 58081, 57482, 599, -1499, 1499, 2867479),
  ('S01W072', 58081, 57482, 599, -1498, 1498, 1578258)
) AS t(cell, n_points, n_valid, n_void, min_alt, max_alt, sum_alt)
""",
    tags=("hgt", "tier_a", "acquire"),
)
def q266_hgt_acquire_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full acquire pipeline as ONE graded lineage
    [A1→A2→A3→A6→A8]: dataset catalog JSON → distributed fetch
    (file:// URLs in this offline env; skip-if-exists semantics) →
    zip extract fused with the binaryFile scan → numpy grid decode →
    per-cell rollup. The rollup literals equal q110's direct-read
    numbers, proving the acquire path lands byte-identical grids.
    Fetch parallelism is Spark tasks over the catalog relation (the
    reference's worker pool [A13] replaced by the scheduler);
    everything below the catalog is the same mapInPandas decode as
    q110."""
    import json

    src = os.path.join(ACQUIRE_DIR, "remote")
    dest = os.path.join(ACQUIRE_DIR, "landing")
    cat_path = os.path.join(ACQUIRE_DIR, "catalog.json")
    marker = os.path.join(ACQUIRE_DIR, ".ready")
    if not os.path.exists(marker):
        os.makedirs(src, exist_ok=True)
        catalog = {}
        for cell, phase in hgt.FIXTURE_CELLS:
            zpath = hgt.write_fixture(src, cell, 241, phase, zipped=True)
            catalog[cell] = {"url": f"file://{zpath}", "zip": os.path.basename(zpath)}
        with open(cat_path, "w") as fh:
            json.dump(catalog, fh)
        with open(marker, "w") as fh:
            fh.write("ok")

    cat = hgt.load_catalog(spark, cat_path)
    hgt.fetch_catalog(cat, dest).collect()  # A2: pooled fetch, skip-if-exists
    raw = hgt.read_hgt_zips(spark, dest)    # A3: unzip fused with the scan
    pts = hgt.decode_points(raw)            # A6/A8
    return (
        pts.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.count("alt").alias("n_valid"),
            (F.count(F.lit(1)) - F.count("alt")).alias("n_void"),
            F.min("alt").alias("min_alt"),
            F.max("alt").alias("max_alt"),
            F.sum("alt").alias("sum_alt"),
        )
        .orderBy("cell")
    )


@register(
    "q277_hgt_hypsometry",
    # Ground truth recomputed with INDEPENDENT numpy arithmetic from
    # the fixture definition (np.floor(alt/500) bands over the valid
    # samples, cumulative share ×1e6 floor-divided by the valid
    # count) — the same VALUES-literal oracle style as q110–q112.
    # Regenerable: scripts_hgt_goldens.py::hypsometry_rows (pinned by
    # tests/test_hgt.py::test_terrain_goldens_match_checked_in_script).
    oracle="""
SELECT * FROM (VALUES
  ('N00E000', -3, 7744, 134720),
  ('N00E000', -2, 10993, 325962),
  ('N00E000', -1, 11811, 531435),
  ('N00E000', 0, 10633, 716415),
  ('N00E000', 1, 9470, 881162),
  ('N00E000', 2, 6831, 1000000),
  ('N46E007', -3, 6786, 118054),
  ('N46E007', -2, 9321, 280209),
  ('N46E007', -1, 10728, 466841),
  ('N46E007', 0, 11679, 670018),
  ('N46E007', 1, 11161, 864183),
  ('N46E007', 2, 7807, 1000000),
  ('S01W072', -3, 6607, 114940),
  ('S01W072', -2, 10214, 292630),
  ('S01W072', -1, 11243, 488222),
  ('S01W072', 0, 11067, 680752),
  ('S01W072', 1, 10704, 866967),
  ('S01W072', 2, 7647, 1000000)
) AS t(cell, band, n_points, cum_share_ppm)
""",
    tags=("hgt", "tier_a", "terrain"),
)
def q277_hgt_hypsometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypsometric curve per cell [A6+A8]: 500 m elevation-band census
    over the valid decoded samples with the cumulative
    share-below-band in ppm — the elevation-distribution product
    (complement of q265's gradient pass). Unlike q265, the decoded
    POINTS leave the decoder and the banding/rollup runs as ordinary
    engine aggregation: floor-banding is a scan-stage projection,
    the (cell, band) census partial-aggregates map-side, and the
    cumulative window runs over the ~7 band rows per cell — the same
    plan at any number of cells. Voids [A8] drop out via alt IS NULL
    before banding."""
    from pyspark.sql.window import Window

    pts = hgt.decode_points(_raw(spark)).filter(F.col("alt").isNotNull())
    census = pts.select(
        "cell", F.floor(F.col("alt") / F.lit(500.0)).cast("long").alias("band")
    ).groupBy("cell", "band").agg(F.count(F.lit(1)).alias("n_points"))
    w = (
        Window.partitionBy("cell")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("cell")
    return census.select(
        "cell",
        "band",
        "n_points",
        F.sum("n_points").over(w).alias("_cum"),
        F.sum("n_points").over(tot).alias("_tot"),
    ).select(
        "cell",
        "band",
        "n_points",
        F.expr("_cum * 1000000 div _tot").alias("cum_share_ppm"),
    ).orderBy("cell", "band")


@register(
    "q287_hgt_aspect_census",
    # Independent-numpy ground truth over the deterministic fixture
    # (central differences, 5-point validity mask, integer octant
    # rule) — VALUES-literal oracle style of q110–q112/q265. The
    # trig field has no doubly-flat interior point, so no FLAT rows.
    # Regenerable: scripts_hgt_goldens.py::aspect_rows (pinned by
    # tests/test_hgt.py::test_terrain_goldens_match_checked_in_script).
    oracle="""
SELECT * FROM (VALUES
  ('N00E000', 'E', 8807),
  ('N00E000', 'N', 19161),
  ('N00E000', 'S', 18272),
  ('N00E000', 'W', 7934),
  ('N46E007', 'E', 7913),
  ('N46E007', 'N', 18499),
  ('N46E007', 'S', 18920),
  ('N46E007', 'W', 8842),
  ('S01W072', 'E', 7670),
  ('S01W072', 'N', 20842),
  ('S01W072', 'S', 17477),
  ('S01W072', 'W', 8185)
) AS t(cell, aspect, n_points)
""",
    tags=("hgt", "tier_a", "terrain"),
)
def q287_hgt_aspect_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinal-aspect census per cell [A6+A8]: every interior sample
    whose 4-neighborhood is fully valid classifies by its dominant
    central-difference gradient — E/W when |Δx| ≥ |Δy| (sign of Δx),
    else N/S (sign of Δy; +row is southward in the north-first grid
    [A4 trap]) — the integer skeleton of a hillshade/aspect raster
    product. Vectorized numpy inside the decode mapInPandas (same
    one-pass shape as q265): only the per-(cell, aspect) counts leave
    Python."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    raw = _raw(spark).select("path", "content")
    schema = "cell string, aspect string, n_points long"

    def _aspects(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {"cell": [], "aspect": [], "n_points": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                cell = os.path.splitext(os.path.basename(path))[0]
                buf = np.frombuffer(bytes(content), dtype=">i2")
                n = int(np.sqrt(buf.size))
                g = buf.reshape(n, n).astype(np.int64)
                v = g != hgt.VOID
                ok = (v[1:-1, 1:-1] & v[1:-1, 2:] & v[1:-1, :-2]
                      & v[2:, 1:-1] & v[:-2, 1:-1])
                dx = (g[1:-1, 2:] - g[1:-1, :-2])[ok]
                dy = (g[2:, 1:-1] - g[:-2, 1:-1])[ok]
                flat = (dx == 0) & (dy == 0)
                ew = (~flat) & (np.abs(dx) >= np.abs(dy))
                ns = (~flat) & ~ew
                for aspect, cnt in (
                    ("E", int((ew & (dx > 0)).sum())),
                    ("W", int((ew & (dx < 0)).sum())),
                    ("S", int((ns & (dy > 0)).sum())),
                    ("N", int((ns & (dy < 0)).sum())),
                    ("FLAT", int(flat.sum())),
                ):
                    if cnt:
                        recs["cell"].append(cell)
                        recs["aspect"].append(aspect)
                        recs["n_points"].append(cnt)
            yield pd.DataFrame(recs)

    return raw.mapInPandas(_aspects, schema).orderBy("cell", "aspect")


@register(
    "q299_hgt_contour_crossings",
    # Independent-numpy goldens (level-set crossings of adjacent
    # valid sample pairs at -500/0/+500 m) — VALUES-literal oracle
    # style of q110–q112/q265/q287. Regenerable:
    # scripts_hgt_goldens.py::contour_rows (pinned by
    # tests/test_hgt.py::test_terrain_goldens_match_checked_in_script).
    oracle="""
SELECT * FROM (VALUES
  ('N00E000', -500, 1897, 2735, 4632),
  ('N00E000', 0, 1131, 2541, 3672),
  ('N00E000', 500, 1626, 2388, 4014),
  ('N46E007', -500, 1561, 2362, 3923),
  ('N46E007', 0, 1127, 2547, 3674),
  ('N46E007', 500, 1937, 2709, 4646),
  ('S01W072', -500, 1791, 2480, 4271),
  ('S01W072', 0, 1335, 2619, 3954),
  ('S01W072', 500, 1783, 2496, 4279)
) AS t(cell, level, h_crossings, v_crossings, total_crossings)
""",
    tags=("hgt", "tier_a", "terrain"),
)
def q299_hgt_contour_crossings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contour-line crossing census per cell [A6+A8]: for each level
    in {−500, 0, +500} m, count adjacent valid sample pairs that
    straddle the level (one endpoint above, one at-or-below) along
    both grid axes — the integer skeleton of marching-squares
    contouring (crossing count ≈ total contour length in sample
    units). Vectorized numpy inside the decode mapInPandas; only the
    9-row census leaves Python."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    raw = _raw(spark).select("path", "content")
    schema = (
        "cell string, level long, h_crossings long, v_crossings long, "
        "total_crossings long"
    )
    levels = (-500, 0, 500)

    def _cross(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {k: [] for k in
                    ("cell", "level", "h_crossings", "v_crossings",
                     "total_crossings")}
            for path, content in zip(pdf["path"], pdf["content"]):
                cell = os.path.splitext(os.path.basename(path))[0]
                buf = np.frombuffer(bytes(content), dtype=">i2")
                n = int(np.sqrt(buf.size))
                g = buf.reshape(n, n).astype(np.int64)
                v = g != hgt.VOID
                bh = v[:, 1:] & v[:, :-1]
                bv = v[1:, :] & v[:-1, :]
                ah, bh_ = g[:, 1:][bh], g[:, :-1][bh]
                av, bv_ = g[1:, :][bv], g[:-1, :][bv]
                for level in levels:
                    ch = int((((ah > level) & (bh_ <= level))
                              | ((ah <= level) & (bh_ > level))).sum())
                    cv = int((((av > level) & (bv_ <= level))
                              | ((av <= level) & (bv_ > level))).sum())
                    recs["cell"].append(cell)
                    recs["level"].append(level)
                    recs["h_crossings"].append(ch)
                    recs["v_crossings"].append(cv)
                    recs["total_crossings"].append(ch + cv)
            yield pd.DataFrame(recs)

    return raw.mapInPandas(_cross, schema).orderBy("cell", "level")


@register(
    "q319_hgt_flow_direction",
    # Independent-numpy goldens (D8 steepest-descent census, fixed-
    # point sqrt(2), ESRI codes, lowest-code ties, 0 = pit/flat) —
    # VALUES-literal oracle style of q110-q112/q265/q287/q299.
    # Regenerable: scripts_hgt_goldens.py::flow_rows (pinned by
    # tests/test_hgt.py::test_terrain_goldens_match_checked_in_script).
    oracle="""
SELECT * FROM (VALUES
  ('N00E000', 0, 47),
  ('N00E000', 1, 3088),
  ('N00E000', 2, 7917),
  ('N00E000', 4, 6549),
  ('N00E000', 8, 8678),
  ('N00E000', 16, 3403),
  ('N00E000', 32, 8383),
  ('N00E000', 64, 6162),
  ('N00E000', 128, 7592),
  ('N46E007', 0, 43),
  ('N46E007', 1, 3192),
  ('N46E007', 2, 8572),
  ('N46E007', 4, 6558),
  ('N46E007', 8, 7622),
  ('N46E007', 16, 2846),
  ('N46E007', 32, 7669),
  ('N46E007', 64, 6683),
  ('N46E007', 128, 8634),
  ('S01W072', 0, 35),
  ('S01W072', 1, 3063),
  ('S01W072', 2, 9197),
  ('S01W072', 4, 6999),
  ('S01W072', 8, 8705),
  ('S01W072', 16, 2882),
  ('S01W072', 32, 7343),
  ('S01W072', 64, 5864),
  ('S01W072', 128, 7731)
) AS t(cell, direction, n_points)
""",
    tags=("hgt", "tier_a", "terrain", "hydrology"),
)
def q319_hgt_flow_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 flow-direction census per cell [A6+A8] — the first step of
    every raster hydrology product (O'Callaghan & Mark 1984; the ESRI
    FlowDirection tool): each interior sample with a fully-valid 3x3
    neighborhood points at its steepest-descent neighbor by
    drop/distance, diagonal distance handled in exact fixed-point
    (cardinal weight = drop x 1414214, diagonal = drop x 1000000 --
    integer arithmetic, so both engines and the golden script agree
    bit-for-bit, no float sqrt(2)), ESRI power-of-two codes with
    lowest-code tie-break, 0 for pits/flats. Vectorized numpy inside
    the decode mapInPandas (the q287 one-pass shape): eight shifted
    subtractions, one argmax, one bincount -- only the <=9-row census
    per cell leaves Python, the same plan at any number of cells."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    raw = _raw(spark).select("path", "content")
    schema = "cell string, direction int, n_points long"
    CARD, DIAG = 1414214, 1000000
    dirs = [(1, 0, 1), (2, 1, 1), (4, 1, 0), (8, 1, -1),
            (16, 0, -1), (32, -1, -1), (64, -1, 0), (128, -1, 1)]

    def _flow(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {"cell": [], "direction": [], "n_points": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                cell = os.path.splitext(os.path.basename(path))[0]
                buf = np.frombuffer(bytes(content), dtype=">i2")
                n = int(np.sqrt(buf.size))
                g = buf.reshape(n, n).astype(np.int64)
                v = g != hgt.VOID
                ok = v[1:-1, 1:-1].copy()
                ws = []
                for code, dr, dc in dirs:  # ascending code order
                    ok &= v[1 + dr:n - 1 + dr, 1 + dc:n - 1 + dc]
                    zn = g[1 + dr:n - 1 + dr, 1 + dc:n - 1 + dc]
                    ws.append((g[1:-1, 1:-1] - zn)
                              * (CARD if dr == 0 or dc == 0 else DIAG))
                stack = np.stack(ws)
                best = np.argmax(stack, axis=0)   # first max = lowest code
                bestw = np.max(stack, axis=0)
                code_arr = np.array([c for c, _, _ in dirs])[best]
                code_arr = np.where(bestw > 0, code_arr, 0)[ok]
                uniq, counts = np.unique(code_arr, return_counts=True)
                for code, cnt in zip(uniq.tolist(), counts.tolist()):
                    recs["cell"].append(cell)
                    recs["direction"].append(int(code))
                    recs["n_points"].append(int(cnt))
            yield pd.DataFrame(recs)

    return raw.mapInPandas(_flow, schema).orderBy("cell", "direction")


@register(
    "q326_hgt_flow_accumulation",
    # Independent goldens from the checked-in script (D8 directions
    # per q319's exact fixed-point rule, then Kahn topological
    # accumulation; code-0 cells receive but do not forward).
    # Regenerable: scripts_hgt_goldens.py::accum_rows (pinned by
    # tests/test_hgt.py::test_terrain_goldens_match_checked_in_script).
    oracle="""
SELECT * FROM (VALUES
  ('N00E000', 11179, 34735, 10873, 695, 908),
  ('N46E007', 10993, 34917, 10883, 689, 907),
  ('S01W072', 10553, 35018, 11254, 657, 902)
) AS t(cell, n_sources, n_small, n_medium, n_large, max_accum)
""",
    tags=("hgt", "tier_a", "terrain", "hydrology", "iterative"),
)
def q326_hgt_flow_accumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 flow ACCUMULATION per cell [A6+A8] — q319's directions
    integrated into drainage: every cell contributes itself plus all
    cells whose steepest-descent paths pass through it (O'Callaghan &
    Mark 1984; the product behind stream extraction and watershed
    delineation). The direction grid is a forest (out-degree <= 1),
    so accumulation is one Kahn topological pass: sources (in-degree
    0) push their counts downstream, pits/flats (code 0) receive but
    never forward. Census per cell: sources / 2-10 / 11-100 / >100
    accumulation bands and the maximum channel load.

    Scale shape: per-CELL work is the in-decode pass (each 1-degree
    tile is independent — the embarrassingly parallel unit of global
    terrain processing); cross-tile drainage at planetary scale
    exchanges only border rows between neighbors, which is the same
    per-cell plan plus a 1-row-per-edge join, not a different
    algorithm."""
    import numpy as np
    import pandas as pd
    from collections import deque
    from collections.abc import Iterator

    raw = _raw(spark).select("path", "content")
    schema = ("cell string, n_sources long, n_small long, n_medium long, "
              "n_large long, max_accum long")
    CARD, DIAG = 1414214, 1000000
    dirs = [(1, 0, 1), (2, 1, 1), (4, 1, 0), (8, 1, -1),
            (16, 0, -1), (32, -1, -1), (64, -1, 0), (128, -1, 1)]

    def _accum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {k: [] for k in ("cell", "n_sources", "n_small",
                                    "n_medium", "n_large", "max_accum")}
            for path, content in zip(pdf["path"], pdf["content"]):
                cell = os.path.splitext(os.path.basename(path))[0]
                buf = np.frombuffer(bytes(content), dtype=">i2")
                n = int(np.sqrt(buf.size))
                g = buf.reshape(n, n).astype(np.int64)
                v = g != hgt.VOID
                ok = v[1:-1, 1:-1].copy()
                ws = []
                for _c, dr, dc in dirs:
                    ok &= v[1 + dr:n - 1 + dr, 1 + dc:n - 1 + dc]
                zc = g[1:-1, 1:-1]
                for code, dr, dc in dirs:
                    zn = g[1 + dr:n - 1 + dr, 1 + dc:n - 1 + dc]
                    ws.append((zc - zn)
                              * (CARD if dr == 0 or dc == 0 else DIAG))
                stack = np.stack(ws)
                best = np.argmax(stack, axis=0)
                bestw = np.max(stack, axis=0)
                code_arr = np.array([c for c, _, _ in dirs])[best]
                code_arr = np.where((bestw > 0) & ok, code_arr, 0)
                codes = np.zeros_like(g)
                codes[1:-1, 1:-1] = code_arr

                acc = np.ones_like(g)
                acc[~v] = 0
                off = {c: (dr, dc) for c, dr, dc in dirs}
                indeg = np.zeros_like(acc)
                targets = {}
                for (r, c), code in np.ndenumerate(codes):
                    if code:
                        dr, dc = off[int(code)]
                        targets[(r, c)] = (r + dr, c + dc)
                        indeg[r + dr, c + dc] += 1
                q = deque(rc for rc, _ in np.ndenumerate(codes)
                          if indeg[rc] == 0)
                while q:
                    rc = q.popleft()
                    t = targets.get(rc)
                    if t is None:
                        continue
                    acc[t] += acc[rc]
                    indeg[t] -= 1
                    if indeg[t] == 0:
                        q.append(t)
                valid = acc[v]
                recs["cell"].append(cell)
                recs["n_sources"].append(int((valid == 1).sum()))
                recs["n_small"].append(int(((valid >= 2) & (valid <= 10)).sum()))
                recs["n_medium"].append(int(((valid >= 11) & (valid <= 100)).sum()))
                recs["n_large"].append(int((valid > 100).sum()))
                recs["max_accum"].append(int(valid.max()))
            yield pd.DataFrame(recs)

    return raw.mapInPandas(_accum, schema).orderBy("cell")


MOSAIC_FIXTURE_DIR = os.path.join(os.path.dirname(FIXTURE_DIR), "hgt_mosaic")


@register(
    "q350_hgt_mosaic_seams",
    # Independent golden from the checked-in script
    # (scripts_hgt_goldens.py::mosaic_rows, pinned by tests/test_hgt.py):
    # the D8 census of the SEAMLESS 481×481 mosaic built straight from
    # the global field definition — n_on_seam counts the points ON the
    # internal shared-border lines, computable only with cross-cell
    # border exchange. A decoder that drops/duplicates the fencepost
    # lines, mis-signs a hemisphere, or skips the exchange mismatches.
    oracle="""
SELECT * FROM (VALUES
  (0, 214, 0),
  (1, 12449, 61),
  (2, 32677, 190),
  (4, 26429, 0),
  (8, 33608, 0),
  (16, 12789, 0),
  (32, 34267, 134),
  (64, 27150, 178),
  (128, 33303, 324)
) AS t(direction, n_points, n_on_seam)
""",
    tags=("hgt", "tier_a", "terrain", "mosaic", "fencepost"),
)
def q350_hgt_mosaic_seams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-cell mosaic D8 census [A6+A8 + the SURVEY §2 fencepost
    trap, graded] — VERDICT r7 #6: a 2×2 block of ADJACENT cells
    (N46/47 × E007/008, shared border samples duplicated between
    files exactly as real SRTM tiles are) is processed as ONE
    seamless terrain:

    * per cell, the interior D8 census computes in-decode (the q319
      pass — each tile independent, the embarrassingly parallel unit);
    * the cells' BORDER BANDS (outer two sample lines per edge —
      O(perimeter), not O(area)) are exchanged: deduplicated on
      global sample coordinates with a consistency census that
      RAISES on any altitude mismatch between the two copies of a
      shared line (the fencepost check, executed not assumed);
    * seam-line points get their D8 from the banded relation via
      eight broadcast-sized shifted equi-joins and a pure-Catalyst
      fixed-point argmax (lowest-code tie-break, no Python) — the
      border-row exchange q326's docstring describes, made real.

    The graded census must equal the golden computed on the seamless
    global mosaic: any discontinuity at the shared edges (dropped or
    doubled fencepost lines, wrong row order at the northern edge)
    shifts the n_on_seam column."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    hgt.ensure_mosaic_fixtures(MOSAIC_FIXTURE_DIR)
    raw = hgt.read_hgt(spark, MOSAIC_FIXTURE_DIR).select("path", "content")

    CARD, DIAG = 1414214, 1000000
    dirs = [(1, 0, 1), (2, 1, 1), (4, 1, 0), (8, 1, -1),
            (16, 0, -1), (32, -1, -1), (64, -1, 0), (128, -1, 1)]

    def _interior(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {"direction": [], "n_points": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                buf = np.frombuffer(bytes(content), dtype=">i2")
                n = int(np.sqrt(buf.size))
                g = buf.reshape(n, n).astype(np.int64)
                v = g != hgt.VOID
                ok = v[1:-1, 1:-1].copy()
                ws = []
                for code, dr, dc in dirs:
                    ok &= v[1 + dr:n - 1 + dr, 1 + dc:n - 1 + dc]
                    zn = g[1 + dr:n - 1 + dr, 1 + dc:n - 1 + dc]
                    ws.append((g[1:-1, 1:-1] - zn)
                              * (CARD if dr == 0 or dc == 0 else DIAG))
                stack = np.stack(ws)
                best = np.argmax(stack, axis=0)
                bestw = np.max(stack, axis=0)
                code_arr = np.array([c for c, _, _ in dirs])[best]
                code_arr = np.where(bestw > 0, code_arr, 0)[ok]
                uniq, counts = np.unique(code_arr, return_counts=True)
                recs["direction"].extend(int(u) for u in uniq)
                recs["n_points"].extend(int(c) for c in counts)
            yield pd.DataFrame(recs)

    def _band(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {"y": [], "x": [], "alt": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                cell = os.path.splitext(os.path.basename(path))[0]
                la, lo = hgt.parse_cell_name(cell)
                buf = np.frombuffer(bytes(content), dtype=">i2")
                n = int(np.sqrt(buf.size))
                g = buf.reshape(n, n).astype(np.int64)
                r, c = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
                band = ((r <= 1) | (r >= n - 2) | (c <= 1) | (c >= n - 2))
                y = (la + 1) * (n - 1) - r[band]
                x = lo * (n - 1) + c[band]
                vals = g[band]
                recs["y"].extend(y.tolist())
                recs["x"].extend(x.tolist())
                recs["alt"].extend(
                    None if v == hgt.VOID else int(v) for v in vals.tolist()
                )
            yield pd.DataFrame(
                {
                    "y": recs["y"],
                    "x": recs["x"],
                    "alt": pd.array(recs["alt"], dtype="Int64"),
                }
            )

    local = raw.mapInPandas(_interior, "direction int, n_points long")
    band_raw = raw.mapInPandas(_band, "y long, x long, alt int")

    # fencepost consistency: the duplicated border lines must agree
    consist = band_raw.groupBy("y", "x").agg(
        F.count(F.lit(1)).alias("copies"),
        F.countDistinct(F.coalesce("alt", F.lit(hgt.VOID))).alias("variants"),
        F.min("alt").alias("alt"),
    )
    n_mismatch = consist.filter(F.col("variants") > 1).count()
    if n_mismatch:
        raise ValueError(
            f"fencepost mismatch: {n_mismatch} shared border samples "
            f"differ between adjacent cells"
        )
    band = consist.select("y", "x", "alt")

    n = 241
    ymin, ymax = 46 * (n - 1), 48 * (n - 1)
    xmin, xmax = 7 * (n - 1), 9 * (n - 1)
    yseam, xseam = 47 * (n - 1), 8 * (n - 1)
    seam = band.filter(
        ((F.col("y") == yseam) | (F.col("x") == xseam))
        & (F.col("y") > ymin) & (F.col("y") < ymax)
        & (F.col("x") > xmin) & (F.col("x") < xmax)
    ).select(F.col("y").alias("sy"), F.col("x").alias("sx"),
             F.col("alt").alias("alt0"))
    # eight shifted broadcast equi-joins: row offset dr (southward)
    # maps to global dy = −dr
    joined = seam
    for k, (code, dr, dc) in enumerate(dirs):
        nb = band.select(
            (F.col("y") + F.lit(dr)).alias("sy"),
            (F.col("x") - F.lit(dc)).alias("sx"),
            F.col("alt").alias(f"alt{code}"),
        )
        joined = joined.join(F.broadcast(nb), ["sy", "sx"], "left")
    ok = F.col("alt0").isNotNull()
    for code, _dr, _dc in dirs:
        ok = ok & F.col(f"alt{code}").isNotNull()
    ws = {
        code: (F.col("alt0") - F.col(f"alt{code}"))
        * F.lit(CARD if dr == 0 or dc == 0 else DIAG)
        for code, dr, dc in dirs
    }
    mx = F.greatest(*ws.values())
    direction = F.when(mx <= 0, F.lit(0))
    chain = None
    for code, _dr, _dc in dirs:  # ascending code = lowest-code tie-break
        cond = ws[code] == mx
        chain = F.when(cond, F.lit(code)) if chain is None else chain.when(cond, F.lit(code))
    direction = direction.otherwise(chain)
    seam_census = (
        joined.filter(ok)
        .select(direction.alias("direction"))
        .groupBy("direction")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .select("direction", "n_points", F.col("n_points").alias("n_on_seam"))
    )
    local_census = local.groupBy("direction").agg(
        F.sum("n_points").alias("n_points"),
        F.lit(0).cast("long").alias("n_on_seam"),
    )
    return (
        local_census.unionByName(seam_census)
        .groupBy("direction")
        .agg(
            F.sum("n_points").alias("n_points"),
            F.sum("n_on_seam").alias("n_on_seam"),
        )
        .orderBy("direction")
    )


@register(
    "q372_hgt_hillshade",
    # Independent-numpy goldens (fixed-point Horn hillshade census) —
    # regenerable from scripts_hgt_goldens.py::hillshade_rows, pinned
    # by tests/test_hgt.py::test_terrain_goldens_match_checked_in_script.
    oracle="""
SELECT * FROM (VALUES
  ('N00E000', 51819, 25880, 25906, 33, 15002286168010, 14692242375934, 1364716510),
  ('N46E007', 51819, 25647, 26140, 32, 14475451855018, 15194977068152, 1364716510),
  ('S01W072', 51819, 24056, 27726, 37, 13632836283752, 16528515816308, 1363302296)
) AS t(cell, n_points, n_lit, n_shadow, n_neutral, sum_lit_load,
       sum_shadow_load, max_load)
""",
    tags=("hgt", "tier_a", "terrain", "hillshade"),
)
def q372_hgt_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horn hillshade census [A6+A8] — the relief-rendering derivative
    (Horn 1981, the GDAL `hillshade` kernel): per interior sample
    with a fully-valid 3x3 neighborhood, the Horn weighted gradient
    numerators gx = (c+2f+i)-(a+2d+g), gy = (g+2h+i)-(a+2b+c) and the
    ILLUMINATION LOAD L = 707107 x (gx + gy) -- the exact fixed-point
    numerator of cos(alt)*sin(slope)*cos(az - aspect) for the standard
    az 315 deg / alt 45 deg light (sin 315 = -cos 315 = -sqrt(2)/2).
    The hillshade normalization 1/sqrt(1+p^2+q^2) is strictly
    positive, so sign(L) partitions lit vs shadowed samples exactly
    as the float hillshade does while every graded number stays an
    exact integer (the q319 fixed-point discipline). One numpy pass
    inside the decode mapInPandas; only the 3-row census leaves
    Python -- the same plan at any cell count, with cross-cell seams
    handled by the q350 border-exchange pattern when mosaicked."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    raw = _raw(spark).select("path", "content")
    schema = (
        "cell string, n_points long, n_lit long, n_shadow long, "
        "n_neutral long, sum_lit_load long, sum_shadow_load long, "
        "max_load long"
    )
    FP = 707107

    def _shade(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {k: [] for k in
                    ("cell", "n_points", "n_lit", "n_shadow", "n_neutral",
                     "sum_lit_load", "sum_shadow_load", "max_load")}
            for path, content in zip(pdf["path"], pdf["content"]):
                cell = os.path.splitext(os.path.basename(path))[0]
                buf = np.frombuffer(bytes(content), dtype=">i2")
                n = int(np.sqrt(buf.size))
                g = buf.reshape(n, n).astype(np.int64)
                v = g != hgt.VOID
                ok = v[1:-1, 1:-1].copy()
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        ok &= v[1 + dr:n - 1 + dr, 1 + dc:n - 1 + dc]

                def w(dr, dc):
                    return g[1 + dr:n - 1 + dr, 1 + dc:n - 1 + dc]

                gx = (w(-1, 1) + 2 * w(0, 1) + w(1, 1)) \
                    - (w(-1, -1) + 2 * w(0, -1) + w(1, -1))
                gy = (w(1, -1) + 2 * w(1, 0) + w(1, 1)) \
                    - (w(-1, -1) + 2 * w(-1, 0) + w(-1, 1))
                load = (FP * (gx + gy))[ok]
                recs["cell"].append(cell)
                recs["n_points"].append(int(ok.sum()))
                recs["n_lit"].append(int((load > 0).sum()))
                recs["n_shadow"].append(int((load < 0).sum()))
                recs["n_neutral"].append(int((load == 0).sum()))
                recs["sum_lit_load"].append(int(load[load > 0].sum()))
                recs["sum_shadow_load"].append(int(-load[load < 0].sum()))
                recs["max_load"].append(int(load.max()))
            yield pd.DataFrame(recs)

    return raw.mapInPandas(_shade, schema).orderBy("cell")


@register(
    "q373_hgt_watershed_basins",
    # Independent-numpy goldens (D8 watershed basin census via pointer
    # doubling) — regenerable from scripts_hgt_goldens.py::basin_rows,
    # pinned by tests/test_hgt.py::test_terrain_goldens_match_checked_in_script.
    oracle="""
SELECT * FROM (VALUES
  ('N00E000', 5710, 908, 3504, 57482),
  ('N46E007', 5706, 907, 3367, 57482),
  ('S01W072', 5698, 902, 3079, 57482)
) AS t(cell, n_basins, max_basin_size, n_singletons, n_valid_cells)
""",
    tags=("hgt", "tier_a", "terrain", "hydrology", "watershed"),
)
def q373_hgt_watershed_basins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watershed delineation [A6+A8] — the segmentation step after
    q319's flow directions and q326's accumulation (ESRI `Watershed`
    / `Basin`): every valid sample drains along its D8 pointer chain
    to a TERMINAL cell (direction 0: pit, flat, border or
    invalid-neighborhood), and the terminal cell labels the basin.
    Labels are computed by POINTER DOUBLING (next = next[next] to
    fixpoint) -- O(log longest-path) passes, each a vectorized gather,
    the identical contraction the distributed q76/q297 connected-
    components run as keyed joins, so the per-tile numpy here and a
    1000-executor label-exchange implementation share one algorithm.
    Census per cell: basin count, largest basin, singleton count and
    the valid-cell total (basin sizes must conserve it). Basin counts
    run ~5.7k/cell on the trig fixture: pit-dense synthetic terrain,
    so the census also regression-pins the tie-break rule (lowest
    ESRI code wins) that decides which pit captures a ridge sample."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    raw = _raw(spark).select("path", "content")
    schema = (
        "cell string, n_basins long, max_basin_size long, "
        "n_singletons long, n_valid_cells long"
    )
    CARD, DIAG = 1414214, 1000000
    dirs = [(1, 0, 1), (2, 1, 1), (4, 1, 0), (8, 1, -1),
            (16, 0, -1), (32, -1, -1), (64, -1, 0), (128, -1, 1)]

    def _basins(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {k: [] for k in
                    ("cell", "n_basins", "max_basin_size",
                     "n_singletons", "n_valid_cells")}
            for path, content in zip(pdf["path"], pdf["content"]):
                cell = os.path.splitext(os.path.basename(path))[0]
                buf = np.frombuffer(bytes(content), dtype=">i2")
                n = int(np.sqrt(buf.size))
                g = buf.reshape(n, n).astype(np.int64)
                v = g != hgt.VOID
                # D8 direction grid (q319 rule: fixed-point sqrt(2),
                # lowest-code ties, 0 at border/pits/invalid nbhd)
                ok = v[1:-1, 1:-1].copy()
                ws = []
                for code, dr, dc in dirs:
                    ok &= v[1 + dr:n - 1 + dr, 1 + dc:n - 1 + dc]
                    zn = g[1 + dr:n - 1 + dr, 1 + dc:n - 1 + dc]
                    ws.append((g[1:-1, 1:-1] - zn)
                              * (CARD if dr == 0 or dc == 0 else DIAG))
                stack = np.stack(ws)
                best = np.argmax(stack, axis=0)
                bestw = np.max(stack, axis=0)
                code_arr = np.array([c for c, _, _ in dirs])[best]
                code_arr = np.where((bestw > 0) & ok, code_arr, 0)
                codes = np.zeros_like(g)
                codes[1:-1, 1:-1] = code_arr
                # pointer-doubling contraction to terminal labels
                nxt = np.arange(n * n, dtype=np.int64)
                for code, dr, dc in dirs:
                    r, c = np.nonzero(codes == code)
                    nxt[r * n + c] = (r + dr) * n + (c + dc)
                while True:
                    nxt2 = nxt[nxt]
                    if np.array_equal(nxt2, nxt):
                        break
                    nxt = nxt2
                labels = nxt[v.ravel()]
                _, sizes = np.unique(labels, return_counts=True)
                recs["cell"].append(cell)
                recs["n_basins"].append(int(sizes.size))
                recs["max_basin_size"].append(int(sizes.max()))
                recs["n_singletons"].append(int((sizes == 1).sum()))
                recs["n_valid_cells"].append(int(v.sum()))
            yield pd.DataFrame(recs)

    return raw.mapInPandas(_basins, schema).orderBy("cell")


@register(
    "q437_hgt_mosaic_watershed",
    # Independent-numpy golden over the SEAMLESS global-field mosaic
    # (scripts_hgt_goldens.py::mosaic_basin_rows, pinned by
    # tests/test_hgt.py) — 167 of the 16,304 basins span an internal
    # seam, which is exactly the structure a per-cell watershed
    # (q373) cannot produce.
    oracle="""
SELECT * FROM (VALUES
  (16304, 228976, 1367, 167, 26833)
) AS t(n_basins, n_valid_cells, max_basin_size, n_seam_spanning,
       seam_spanning_mass)
""",
    tags=("hgt", "tier_a", "terrain", "hydrology", "watershed",
          "mosaic", "fencepost"),
)
def q437_hgt_mosaic_watershed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-cell watershed delineation on the 2×2 mosaic — q373's
    basins composed with q350's border exchange (VERDICT r9 #6), so
    basins FLOW ACROSS the shared cell edges instead of being cut at
    file boundaries:

    * per cell, the decode kernel contracts every OWNED sample's D8
      chain by pointer doubling (O(area) work, zero shuffle) down to
      either a local terminal (basin root) or an EXIT onto a seam
      line whose D8 the cell cannot know — emitting only aggregated
      (root, member-count) and (seam-exit, member-count) rows plus a
      near-seam resolution map, all O(perimeter);
    * the cells' border bands are exchanged exactly as q350 (outer
      two lines, deduplicated on global coordinates, altitude
      consistency RAISED on mismatch), seam-line samples get their
      D8 from eight broadcast shifted equi-joins;
    * the seam graph (seam sample → resolved target, ~10³ rows at
      any cell count) is contracted by distributed pointer jumping —
      self-joins to fixpoint, the same O(log path) recursion q76's
      connected components run — then exit masses fold onto their
      cross-seam roots.

    Census: basin count, valid-sample conservation total, largest
    basin, and the seam-spanning basin count/mass that per-cell
    processing gets structurally wrong (it would report 0 spanning
    basins and split their mass). Ownership of a sample is canonical
    ((min((y−ymin)/(n−1),1), min((x−xmin)/(n−1),1)) — north/east cell
    claims a seam line), so every valid sample is counted exactly
    once across the fleet of per-cell kernels."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    hgt.ensure_mosaic_fixtures(MOSAIC_FIXTURE_DIR)
    raw = hgt.read_hgt(spark, MOSAIC_FIXTURE_DIR).select("path", "content")

    CARD, DIAG = 1414214, 1000000
    dirs = [(1, 0, 1), (2, 1, 1), (4, 1, 0), (8, 1, -1),
            (16, 0, -1), (32, -1, -1), (64, -1, 0), (128, -1, 1)]
    GID = 100000  # gid = y * GID + x (global sample coordinates)

    def _local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Per-cell contraction. Emits a tagged union:
        rel='B' a=root_gid  b=count      c=owner_cell_idx
        rel='X' a=seam_gid  b=count      c=owner_cell_idx
        rel='C' a=gid       b=target_gid c=kind (0 terminal, 1 seam)"""
        for pdf in batches:
            rel, av, bv, cv = [], [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                cell = os.path.splitext(os.path.basename(path))[0]
                la, lo = hgt.parse_cell_name(cell)
                la, lo = int(la), int(lo)
                buf = np.frombuffer(bytes(content), dtype=">i2")
                n = int(np.sqrt(buf.size))
                g = buf.reshape(n, n).astype(np.int64)
                v = g != hgt.VOID
                ymin_g, ymax_g = 46 * (n - 1), 48 * (n - 1)
                xmin_g, xmax_g = 7 * (n - 1), 9 * (n - 1)
                yseam, xseam = 47 * (n - 1), 8 * (n - 1)
                cell_idx = (la - 46) * 2 + (lo - 7)
                # interior D8 (q373 rule) + in-file pointer doubling;
                # file-edge lines are absorbing (their D8 is either
                # border-terminal or seam — classified globally below)
                ok = v[1:-1, 1:-1].copy()
                ws = []
                for _c, dr, dc in dirs:
                    ok &= v[1 + dr:n - 1 + dr, 1 + dc:n - 1 + dc]
                zc = g[1:-1, 1:-1]
                for code, dr, dc in dirs:
                    zn = g[1 + dr:n - 1 + dr, 1 + dc:n - 1 + dc]
                    ws.append((zc - zn) * (CARD if dr == 0 or dc == 0 else DIAG))
                stack = np.stack(ws)
                best = np.argmax(stack, axis=0)
                bestw = np.max(stack, axis=0)
                code_arr = np.array([c for c, _, _ in dirs])[best]
                code_arr = np.where((bestw > 0) & ok, code_arr, 0)
                codes = np.zeros_like(g)
                codes[1:-1, 1:-1] = code_arr
                nxt = np.arange(n * n, dtype=np.int64)
                for code, dr, dc in dirs:
                    r, c = np.nonzero(codes == code)
                    nxt[r * n + c] = (r + dr) * n + (c + dc)
                while True:
                    nxt2 = nxt[nxt]
                    if np.array_equal(nxt2, nxt):
                        break
                    nxt = nxt2
                # global coordinates and sample classes
                rr = np.arange(n * n) // n
                cc = np.arange(n * n) % n
                y = (la + 1) * (n - 1) - rr
                x = lo * (n - 1) + cc
                gid = y * GID + x
                on_border = ((y == ymin_g) | (y == ymax_g)
                             | (x == xmin_g) | (x == xmax_g))
                on_seam = (((y == yseam) | (x == xseam)) & ~on_border)
                owner = (np.minimum((y - ymin_g) // (n - 1), 1) * 2
                         + np.minimum((x - xmin_g) // (n - 1), 1))
                owned = v.ravel() & ~on_seam & (owner == cell_idx)
                fin = nxt[np.nonzero(owned)[0]]
                exit_mask = on_seam[fin]
                # 'B': members whose chain ends at a terminal root
                roots, cnts = np.unique(gid[fin[~exit_mask]],
                                        return_counts=True)
                rel.extend("B" for _ in roots)
                av.extend(roots.tolist())
                bv.extend(cnts.tolist())
                cv.extend(cell_idx for _ in roots)
                # 'X': members whose chain exits onto a seam sample
                seams, scnts = np.unique(gid[fin[exit_mask]],
                                         return_counts=True)
                rel.extend("X" for _ in seams)
                av.extend(seams.tolist())
                bv.extend(scnts.tolist())
                cv.extend(cell_idx for _ in seams)
                # 'C': near-seam resolution map (everything a seam
                # sample's D8 can point to, minus seam samples)
                near = owned & ((np.abs(y - yseam) <= 1)
                                | (np.abs(x - xseam) <= 1))
                idx = np.nonzero(near)[0]
                f2 = nxt[idx]
                rel.extend("C" for _ in idx)
                av.extend(gid[idx].tolist())
                bv.extend(gid[f2].tolist())
                cv.extend(np.where(on_seam[f2], 1, 0).tolist())
            yield pd.DataFrame({"rel": rel, "a": av, "b": bv, "c": cv})

    def _band(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {"y": [], "x": [], "alt": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                cell = os.path.splitext(os.path.basename(path))[0]
                la, lo = hgt.parse_cell_name(cell)
                buf = np.frombuffer(bytes(content), dtype=">i2")
                n = int(np.sqrt(buf.size))
                g = buf.reshape(n, n).astype(np.int64)
                r, c = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
                band = ((r <= 1) | (r >= n - 2) | (c <= 1) | (c >= n - 2))
                recs["y"].extend(((la + 1) * (n - 1) - r[band]).tolist())
                recs["x"].extend((lo * (n - 1) + c[band]).tolist())
                recs["alt"].extend(
                    None if val == hgt.VOID else int(val)
                    for val in g[band].tolist()
                )
            yield pd.DataFrame({
                "y": recs["y"], "x": recs["x"],
                "alt": pd.array(recs["alt"], dtype="Int64"),
            })

    tagged = raw.mapInPandas(
        _local, "rel string, a long, b long, c long").persist()
    band_raw = raw.mapInPandas(_band, "y long, x long, alt int")
    consist = band_raw.groupBy("y", "x").agg(
        F.countDistinct(F.coalesce("alt", F.lit(hgt.VOID))).alias("variants"),
        F.min("alt").alias("alt"),
    )
    if consist.filter(F.col("variants") > 1).count():
        raise ValueError("fencepost mismatch on shared border samples")
    band = consist.select("y", "x", "alt")

    n = 241
    ymin_g, ymax_g = 46 * (n - 1), 48 * (n - 1)
    xmin_g, xmax_g = 7 * (n - 1), 9 * (n - 1)
    yseam, xseam = 47 * (n - 1), 8 * (n - 1)
    seam = band.filter(
        ((F.col("y") == yseam) | (F.col("x") == xseam))
        & (F.col("y") > ymin_g) & (F.col("y") < ymax_g)
        & (F.col("x") > xmin_g) & (F.col("x") < xmax_g)
        # void seam samples are not basin members and (all-valid D8
        # rule) can never be pointer targets — drop them here
        & F.col("alt").isNotNull()
    ).select(F.col("y").alias("sy"), F.col("x").alias("sx"),
             F.col("alt").alias("alt0"))
    joined = seam
    for code, dr, dc in dirs:
        nb = band.select(
            (F.col("y") + F.lit(dr)).alias("sy"),
            (F.col("x") - F.lit(dc)).alias("sx"),
            F.col("alt").alias(f"alt{code}"),
        )
        joined = joined.join(F.broadcast(nb), ["sy", "sx"], "left")
    okc = F.col("alt0").isNotNull()
    for code, _dr, _dc in dirs:
        okc = okc & F.col(f"alt{code}").isNotNull()
    ws = {
        code: (F.col("alt0") - F.col(f"alt{code}"))
        * F.lit(CARD if dr == 0 or dc == 0 else DIAG)
        for code, dr, dc in dirs
    }
    mx = F.greatest(*ws.values())
    chain = None
    for code, _dr, _dc in dirs:
        cond = ws[code] == mx
        chain = (F.when(cond, F.lit(code)) if chain is None
                 else chain.when(cond, F.lit(code)))
    direction = F.when(~okc | (mx <= 0), F.lit(0)).otherwise(chain)
    # next-gid per direction: row offset dr (southward) is global -dy
    ngid = F.lit(None).cast("long")
    for code, dr, dc in dirs:
        ngid = F.when(
            direction == code,
            (F.col("sy") - F.lit(dr)) * GID + (F.col("sx") + F.lit(dc)),
        ).otherwise(ngid)
    sgid = F.col("sy") * GID + F.col("sx")
    seam_next = joined.select(
        sgid.alias("s"), direction.alias("dir"), ngid.alias("ng"),
        F.col("sy").alias("y"), F.col("sx").alias("x"),
    ).persist()

    seam_ids = seam_next.select(F.col("s").alias("sid2"))
    near_map = tagged.filter(F.col("rel") == "C").select(
        F.col("a").alias("cg"), F.col("b").alias("ct"), F.col("c").alias("ck")
    )
    e0 = (
        seam_next
        .join(F.broadcast(seam_ids), F.col("ng") == F.col("sid2"), "left")
        .join(F.broadcast(near_map), F.col("ng") == F.col("cg"), "left")
        .select(
            "s",
            F.when(F.col("dir") == 0, F.lit(0))
            .when(F.col("sid2").isNotNull(), F.lit(1))
            .otherwise(F.col("ck")).alias("kind"),
            F.when(F.col("dir") == 0, F.col("s"))
            .when(F.col("sid2").isNotNull(), F.col("ng"))
            .otherwise(F.col("ct")).alias("t"),
        )
    )
    if e0.filter(F.col("kind").isNull()).count():
        raise ValueError("seam D8 target missing from exchange relations")

    # distributed pointer jumping over the seam graph (O(log path))
    r = e0.localCheckpoint(eager=True)
    for _ in range(24):
        if r.filter(F.col("kind") == 1).count() == 0:
            break
        hop = r.select(F.col("s").alias("s2"), F.col("kind").alias("k2"),
                       F.col("t").alias("t2"))
        r = (
            r.join(F.broadcast(hop), F.col("t") == F.col("s2"), "left")
            .select(
                "s",
                F.when(F.col("kind") == 1, F.col("k2"))
                .otherwise(F.col("kind")).alias("kind"),
                F.when(F.col("kind") == 1, F.col("t2"))
                .otherwise(F.col("t")).alias("t"),
            )
            .localCheckpoint(eager=True)
        )
    else:
        raise ValueError("seam pointer jumping did not converge")
    resolve = r.select(F.col("s").alias("rs"), F.col("t").alias("root"))

    owner_expr = (
        F.least((F.col("y") - F.lit(ymin_g)) / F.lit(n - 1), F.lit(1.0))
        .cast("long") * 2
        + F.least((F.col("x") - F.lit(xmin_g)) / F.lit(n - 1), F.lit(1.0))
        .cast("long")
    )
    members = (
        tagged.filter(F.col("rel") == "B")
        .select(F.col("a").alias("root"), F.col("b").alias("cnt"),
                F.col("c").alias("owner"))
        .unionByName(
            tagged.filter(F.col("rel") == "X")
            .join(F.broadcast(resolve), F.col("a") == F.col("rs"))
            .select("root", F.col("b").alias("cnt"),
                    F.col("c").alias("owner"))
        )
        .unionByName(
            seam_next
            .join(F.broadcast(resolve), F.col("s") == F.col("rs"))
            .select("root", F.lit(1).alias("cnt"),
                    owner_expr.alias("owner"))
        )
    )
    basins = members.groupBy("root").agg(
        F.sum("cnt").alias("size"),
        F.expr("bit_or(shiftleft(1, cast(owner as int)))").alias("mask"),
    )
    out = basins.agg(
        F.count(F.lit(1)).alias("n_basins"),
        F.sum("size").cast("long").alias("n_valid_cells"),
        F.max("size").cast("long").alias("max_basin_size"),
        F.sum(F.when(F.expr("bit_count(mask)") > 1, 1).otherwise(0))
        .cast("long").alias("n_seam_spanning"),
        F.sum(F.when(F.expr("bit_count(mask)") > 1, F.col("size"))
              .otherwise(0)).cast("long").alias("seam_spanning_mass"),
    )
    # Materialize the one-row census (collect + local rebuild keeps
    # AQE in the plan, unlike an eager localCheckpoint), then release
    # the cached blocks (ADVICE r10: persisted frames leaked for the
    # session lifetime — noticeable in 400-query parity sessions); the
    # pointer-jumping localCheckpoints are freed by the ContextCleaner
    # once unreferenced.
    from cli_spark.session import materialize_local

    res = materialize_local(out)
    tagged.unpersist()
    seam_next.unpersist()
    return res


@register(
    "q439_hgt_mosaic_accumulation",
    # Independent-numpy golden over the seamless global-field mosaic
    # (scripts_hgt_goldens.py::mosaic_accum_rows, pinned by
    # tests/test_hgt.py) — max accumulation ON an internal seam line
    # is 35: drainage demonstrably crosses the shared cell edges.
    oracle="""
SELECT * FROM (VALUES
  (38600, 133712, 52802, 3862, 1367, 35)
) AS t(n_sources, n_small, n_medium, n_large, max_accum,
       max_accum_on_seam)
""",
    tags=("hgt", "tier_a", "terrain", "hydrology", "accumulation",
          "mosaic", "fencepost"),
)
def q439_hgt_mosaic_accumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-cell D8 flow ACCUMULATION on the 2×2 mosaic — q326's
    per-cell accumulation composed with the q350/q437 border
    exchange, closing the Tier-A hydrology set (direction q319 →
    accumulation q326 → watershed q373, each now with a seamed
    mosaic counterpart). Unlike q437's labels, accumulation is a
    MASS flow: every valid sample's unit drains downhill, so seam
    and border samples receive water from MULTIPLE cells and
    transit mass re-enters downstream cells. The decomposition:

    * pass 1 (per cell, decode kernel): local Kahn accumulation of
      the cell's interior units; emits the O(perimeter) arrival
      masses at edge lines plus the near-seam routing map
      (entry → absorbing target, classed interior/seam/border);
    * seam graph: M0(s) = 1 + local arrivals; contracted edges
      (seam→seam, directly or through a cell transit) closed by
      pointer-doubled transitive closure, so acc(s) = M0(s) +
      Σ M0(upstream) — an exact path-sum without iterating the
      terrain's longest chain;
    * border samples: acc(b) = 1 + arrivals from BOTH adjacent
      files + direct seam inflow (the fencepost line is the
      exchange point, not a wall);
    * pass 2 (per cell): re-run local accumulation with the seam
      graph's transit masses INJECTED at their interior entry
      points (shipped to the kernel as a broadcast-joined list
      column — no driver-side fact rows), censusing owned interior
      samples whose totals now include cross-cell water.

    Census: source count, accumulation bands, global max, and max
    accumulation ON a seam line — a number a per-cell plan
    structurally reports as unavailable."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    hgt.ensure_mosaic_fixtures(MOSAIC_FIXTURE_DIR)
    raw = hgt.read_hgt(spark, MOSAIC_FIXTURE_DIR).select("path", "content")

    CARD, DIAG = 1414214, 1000000
    dirs = [(1, 0, 1), (2, 1, 1), (4, 1, 0), (8, 1, -1),
            (16, 0, -1), (32, -1, -1), (64, -1, 0), (128, -1, 1)]
    GID = 100000
    N_FIX = 241
    YMIN, YMAX = 46 * (N_FIX - 1), 48 * (N_FIX - 1)
    XMIN, XMAX = 7 * (N_FIX - 1), 9 * (N_FIX - 1)
    YSEAM, XSEAM = 47 * (N_FIX - 1), 8 * (N_FIX - 1)

    def _grid_ctx(path: str, content: bytes):
        """Shared per-file decode: codes, absorbing pointer map and
        the global-coordinate arrays."""
        from collections import deque

        cell = os.path.splitext(os.path.basename(path))[0]
        la, lo = (int(v) for v in hgt.parse_cell_name(cell))
        buf = np.frombuffer(bytes(content), dtype=">i2")
        n = int(np.sqrt(buf.size))
        g = buf.reshape(n, n).astype(np.int64)
        v = g != hgt.VOID
        ok = v[1:-1, 1:-1].copy()
        ws = []
        for _c, dr, dc in dirs:
            ok &= v[1 + dr:n - 1 + dr, 1 + dc:n - 1 + dc]
        zc = g[1:-1, 1:-1]
        for code, dr, dc in dirs:
            zn = g[1 + dr:n - 1 + dr, 1 + dc:n - 1 + dc]
            ws.append((zc - zn) * (CARD if dr == 0 or dc == 0 else DIAG))
        stack = np.stack(ws)
        best = np.argmax(stack, axis=0)
        bestw = np.max(stack, axis=0)
        code_arr = np.array([c for c, _, _ in dirs])[best]
        code_arr = np.where((bestw > 0) & ok, code_arr, 0)
        codes = np.zeros_like(g)
        codes[1:-1, 1:-1] = code_arr
        rr = np.arange(n * n) // n
        cc = np.arange(n * n) % n
        y = (la + 1) * (n - 1) - rr
        x = lo * (n - 1) + cc
        return cell, n, g, v, codes, y, x, deque

    def _kahn(codes: np.ndarray, n: int, acc: np.ndarray, deque):
        """In-file mass propagation along interior pointers (edge
        lines absorb). Mutates acc in place."""
        nxt = np.full(n * n, -1, dtype=np.int64)
        for code, dr, dc in dirs:
            r, c = np.nonzero(codes == code)
            nxt[r * n + c] = (r + dr) * n + (c + dc)
        indeg = np.zeros(n * n, dtype=np.int64)
        valid_nxt = nxt[nxt >= 0]
        np.add.at(indeg, valid_nxt, 1)
        q = deque(np.nonzero(indeg == 0)[0].tolist())
        flat = acc.ravel()
        while q:
            u = q.popleft()
            t = nxt[u]
            if t < 0:
                continue
            flat[t] += flat[u]
            indeg[t] -= 1
            if indeg[t] == 0:
                q.append(int(t))

    def _pass1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """rel='X' a=edge_gid b=arrived_mass
        rel='C' a=gid b=absorb_target_gid c=kind
                (0 interior-terminal, 1 seam, 2 border, 3 self-border)"""
        for pdf in batches:
            rel, av, bv, cv = [], [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                _cell, n, _g, v, codes, y, x, deque = _grid_ctx(path, content)
                gid = y * GID + x
                on_border = ((y == YMIN) | (y == YMAX)
                             | (x == XMIN) | (x == XMAX))
                on_seam = (((y == YSEAM) | (x == XSEAM)) & ~on_border)
                rr = np.arange(n * n) // n
                cc = np.arange(n * n) % n
                interior = ((rr >= 1) & (rr <= n - 2)
                            & (cc >= 1) & (cc <= n - 2))
                acc = np.zeros((n, n), dtype=np.int64)
                acc.ravel()[interior & v.ravel()] = 1
                _kahn(codes, n, acc, deque)
                edge = ~interior
                arrived = acc.ravel()[edge]
                egid = gid[edge]
                nz = arrived > 0
                rel.extend("X" for _ in range(int(nz.sum())))
                av.extend(egid[nz].tolist())
                bv.extend(arrived[nz].tolist())
                cv.extend(0 for _ in range(int(nz.sum())))
                # near-seam routing map over OWNED valid samples
                owner = (np.minimum((y - YMIN) // (n - 1), 1) * 2
                         + np.minimum((x - XMIN) // (n - 1), 1))
                la, lo = (int(t) for t in hgt.parse_cell_name(
                    os.path.splitext(os.path.basename(path))[0]))
                cell_idx = (la - 46) * 2 + (lo - 7)
                owned = v.ravel() & ~on_seam & (owner == cell_idx)
                near = owned & ((np.abs(y - YSEAM) <= 1)
                                | (np.abs(x - XSEAM) <= 1))
                # absorbing map via pointer doubling
                nxt = np.arange(n * n, dtype=np.int64)
                for code, dr, dc in dirs:
                    r, c = np.nonzero(codes == code)
                    nxt[r * n + c] = (r + dr) * n + (c + dc)
                while True:
                    nxt2 = nxt[nxt]
                    if np.array_equal(nxt2, nxt):
                        break
                    nxt = nxt2
                idx = np.nonzero(near)[0]
                f2 = nxt[idx]
                kind = np.where(
                    on_border[idx], 3,
                    np.where(on_seam[f2], 1,
                             np.where(on_border[f2], 2, 0)))
                rel.extend("C" for _ in idx)
                av.extend(gid[idx].tolist())
                bv.extend(gid[f2].tolist())
                cv.extend(kind.tolist())
            yield pd.DataFrame({"rel": rel, "a": av, "b": bv, "c": cv})

    def _pass2(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Final interior census with injected transit masses."""
        for pdf in batches:
            recs = {k: [] for k in ("n_sources", "n_small", "n_medium",
                                    "n_large", "mx")}
            for path, content, injs in zip(pdf["path"], pdf["content"],
                                           pdf["injs"]):
                _cell, n, _g, v, codes, y, x, deque = _grid_ctx(path, content)
                la, lo = (int(t) for t in hgt.parse_cell_name(_cell))
                rr = np.arange(n * n) // n
                cc = np.arange(n * n) % n
                interior = ((rr >= 1) & (rr <= n - 2)
                            & (cc >= 1) & (cc <= n - 2))
                acc = np.zeros((n, n), dtype=np.int64)
                acc.ravel()[interior & v.ravel()] = 1
                if injs is not None and len(injs):
                    for inj in injs:
                        gy, gx = inj["gid"] // GID, inj["gid"] % GID
                        r = (la + 1) * (n - 1) - gy
                        c = gx - lo * (n - 1)
                        acc[r, c] += inj["mass"]
                _kahn(codes, n, acc, deque)
                sel = acc.ravel()[interior & v.ravel()]
                recs["n_sources"].append(int((sel == 1).sum()))
                recs["n_small"].append(int(((sel >= 2) & (sel <= 10)).sum()))
                recs["n_medium"].append(int(((sel >= 11) & (sel <= 100)).sum()))
                recs["n_large"].append(int((sel > 100).sum()))
                recs["mx"].append(int(sel.max()))
            yield pd.DataFrame(recs)

    tagged = raw.mapInPandas(
        _pass1, "rel string, a long, b long, c long").persist()

    # --- band relation + seam D8 (the q350/q437 exchange) ---
    def _band(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {"y": [], "x": [], "alt": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                cell = os.path.splitext(os.path.basename(path))[0]
                la, lo = hgt.parse_cell_name(cell)
                buf = np.frombuffer(bytes(content), dtype=">i2")
                n = int(np.sqrt(buf.size))
                g = buf.reshape(n, n).astype(np.int64)
                r, c = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
                band = ((r <= 1) | (r >= n - 2) | (c <= 1) | (c >= n - 2))
                recs["y"].extend(((la + 1) * (n - 1) - r[band]).tolist())
                recs["x"].extend((lo * (n - 1) + c[band]).tolist())
                recs["alt"].extend(
                    None if val == hgt.VOID else int(val)
                    for val in g[band].tolist()
                )
            yield pd.DataFrame({
                "y": recs["y"], "x": recs["x"],
                "alt": pd.array(recs["alt"], dtype="Int64"),
            })

    band_raw = raw.mapInPandas(_band, "y long, x long, alt int")
    consist = band_raw.groupBy("y", "x").agg(
        F.countDistinct(F.coalesce("alt", F.lit(hgt.VOID))).alias("variants"),
        F.min("alt").alias("alt"),
    )
    if consist.filter(F.col("variants") > 1).count():
        raise ValueError("fencepost mismatch on shared border samples")
    band = consist.select("y", "x", "alt")
    seam = band.filter(
        ((F.col("y") == YSEAM) | (F.col("x") == XSEAM))
        & (F.col("y") > YMIN) & (F.col("y") < YMAX)
        & (F.col("x") > XMIN) & (F.col("x") < XMAX)
        & F.col("alt").isNotNull()
    ).select(F.col("y").alias("sy"), F.col("x").alias("sx"),
             F.col("alt").alias("alt0"))
    joined = seam
    for code, dr, dc in dirs:
        nb = band.select(
            (F.col("y") + F.lit(dr)).alias("sy"),
            (F.col("x") - F.lit(dc)).alias("sx"),
            F.col("alt").alias(f"alt{code}"),
        )
        joined = joined.join(F.broadcast(nb), ["sy", "sx"], "left")
    okc = F.col("alt0").isNotNull()
    for code, _dr, _dc in dirs:
        okc = okc & F.col(f"alt{code}").isNotNull()
    ws = {
        code: (F.col("alt0") - F.col(f"alt{code}"))
        * F.lit(CARD if dr == 0 or dc == 0 else DIAG)
        for code, dr, dc in dirs
    }
    mx = F.greatest(*ws.values())
    chain = None
    for code, _dr, _dc in dirs:
        cond = ws[code] == mx
        chain = (F.when(cond, F.lit(code)) if chain is None
                 else chain.when(cond, F.lit(code)))
    direction = F.when(~okc | (mx <= 0), F.lit(0)).otherwise(chain)
    ngid = F.lit(None).cast("long")
    for code, dr, dc in dirs:
        ngid = F.when(
            direction == code,
            (F.col("sy") - F.lit(dr)) * GID + (F.col("sx") + F.lit(dc)),
        ).otherwise(ngid)
    seam_next = joined.select(
        (F.col("sy") * GID + F.col("sx")).alias("s"),
        direction.alias("dir"), ngid.alias("ng"),
    ).persist()

    # --- seam node initial masses and contracted edges ---
    gy = F.col("a").cast("long") / GID
    exits = tagged.filter(F.col("rel") == "X").select(
        F.col("a").alias("xg"), F.col("b").alias("mass"),
        F.floor(gy).cast("long").alias("ey"),
        (F.col("a") % GID).alias("ex"),
    )
    is_border = ((F.col("ey") == YMIN) | (F.col("ey") == YMAX)
                 | (F.col("ex") == XMIN) | (F.col("ex") == XMAX))
    exits_seam = exits.filter(~is_border).groupBy("xg").agg(
        F.sum("mass").alias("mass"))
    exits_border = exits.filter(is_border).groupBy("xg").agg(
        F.sum("mass").alias("mass"))
    m0 = (
        seam_next.select("s")
        .join(F.broadcast(exits_seam), F.col("s") == F.col("xg"), "left")
        .select("s", (F.lit(1) + F.coalesce("mass", F.lit(0))).alias("m0"))
    )
    near = tagged.filter(F.col("rel") == "C").select(
        F.col("a").alias("cg"), F.col("b").alias("ct"),
        F.col("c").alias("ck"))
    seam_ids = seam_next.select(F.col("s").alias("sid2"))
    routed = (
        seam_next.filter(F.col("dir") != 0)
        .join(F.broadcast(seam_ids), F.col("ng") == F.col("sid2"), "left")
        .join(F.broadcast(near), F.col("ng") == F.col("cg"), "left")
    )
    if routed.filter(F.col("sid2").isNull() & F.col("cg").isNull()).count():
        raise ValueError("seam D8 target missing from exchange relations")
    # closure edges: seam -> seam (direct, or transiting a cell)
    edges = routed.filter(
        F.col("sid2").isNotNull() | (F.col("ck") == 1)
    ).select(
        F.col("s").alias("u"),
        F.when(F.col("sid2").isNotNull(), F.col("ng"))
        .otherwise(F.col("ct")).alias("d"),
    )
    # border inflow edges: seam -> border sample
    border_in = routed.filter(
        F.col("sid2").isNull() & F.col("ck").isin(2, 3)
    ).select(
        F.col("s").alias("u"),
        F.when(F.col("ck") == 3, F.col("ng"))
        .otherwise(F.col("ct")).alias("b"),
    )
    # cell-entry injections: seam -> interior sample (ck 0/1/2)
    entries = routed.filter(
        F.col("sid2").isNull() & F.col("ck").isin(0, 1, 2)
    ).select(F.col("s").alias("u"), F.col("ng").alias("entry"))

    # transitive closure over the contracted seam forest (doubling)
    pairs = edges.select(F.col("u"), F.col("d")).localCheckpoint(eager=True)
    for _ in range(24):
        hop = pairs.select(F.col("u").alias("u2"), F.col("d").alias("d2"))
        grown = (
            pairs.unionByName(
                pairs.join(F.broadcast(hop), F.col("d") == F.col("u2"))
                .select("u", F.col("d2").alias("d"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        if grown.count() == pairs.count():
            pairs = grown
            break
        pairs = grown
    else:
        raise ValueError("seam closure did not converge")
    acc_seam = (
        m0.alias("t")
        .join(
            F.broadcast(
                pairs.join(m0.select(F.col("s").alias("u"),
                                     F.col("m0").alias("um")), "u")
                .groupBy("d").agg(F.sum("um").alias("upstream"))
            ),
            F.col("t.s") == F.col("d"), "left",
        )
        .select(
            F.col("t.s").alias("s"),
            (F.col("m0") + F.coalesce("upstream", F.lit(0))).alias("acc"),
        )
        .persist()
    )
    # border accumulation: 1 + file arrivals + direct seam inflow
    border_pop = band.filter(
        ((F.col("y") == YMIN) | (F.col("y") == YMAX)
         | (F.col("x") == XMIN) | (F.col("x") == XMAX))
        & F.col("alt").isNotNull()
    ).select((F.col("y") * GID + F.col("x")).alias("bg"))
    seam_to_border = (
        border_in.join(acc_seam, border_in.u == acc_seam.s)
        .groupBy("b").agg(F.sum("acc").alias("inflow"))
    )
    acc_border = (
        border_pop
        .join(F.broadcast(exits_border), F.col("bg") == F.col("xg"), "left")
        .join(F.broadcast(seam_to_border), F.col("bg") == F.col("b"), "left")
        .select(
            "bg",
            (F.lit(1) + F.coalesce("mass", F.lit(0))
             + F.coalesce("inflow", F.lit(0))).alias("acc"),
        )
    )
    # injections into pass 2, grouped per owning cell
    inj = (
        entries.join(acc_seam, entries.u == acc_seam.s)
        .groupBy("entry").agg(F.sum("acc").alias("mass"))
        .select(
            F.col("entry").alias("gid"), "mass",
            (F.lit(46) + F.floor((F.floor(F.col("entry") / GID) - YMIN)
                                 / (N_FIX - 1)).cast("long")).alias("la"),
            (F.lit(7) + F.floor(((F.col("entry") % GID) - XMIN)
                                / (N_FIX - 1)).cast("long")).alias("lo"),
        )
        .withColumn(
            "cell",
            F.concat(F.lit("N"), F.lpad(F.col("la").cast("string"), 2, "0"),
                     F.lit("E"), F.lpad(F.col("lo").cast("string"), 3, "0")),
        )
        .groupBy("cell")
        .agg(F.collect_list(F.struct("gid", "mass")).alias("injs"))
    )
    raw2 = (
        raw.withColumn(
            "cell", F.regexp_extract("path", r"([NS]\d+[EW]\d+)\.hgt", 1))
        .join(F.broadcast(inj), "cell", "left")
        .select("path", "content", "injs")
    )
    interior_census = raw2.mapInPandas(
        _pass2,
        "n_sources long, n_small long, n_medium long, n_large long, mx long",
    )

    def _bands(df, acc_col):
        return df.agg(
            F.sum(F.when(F.col(acc_col) == 1, 1).otherwise(0))
            .alias("n_sources"),
            F.sum(F.when((F.col(acc_col) >= 2) & (F.col(acc_col) <= 10), 1)
                  .otherwise(0)).alias("n_small"),
            F.sum(F.when((F.col(acc_col) >= 11) & (F.col(acc_col) <= 100), 1)
                  .otherwise(0)).alias("n_medium"),
            F.sum(F.when(F.col(acc_col) > 100, 1).otherwise(0))
            .alias("n_large"),
            F.max(acc_col).alias("mx"),
        )

    seam_census = _bands(acc_seam, "acc")
    border_census = _bands(acc_border, "acc")
    interior_total = interior_census.agg(
        F.sum("n_sources").alias("n_sources"),
        F.sum("n_small").alias("n_small"),
        F.sum("n_medium").alias("n_medium"),
        F.sum("n_large").alias("n_large"),
        F.max("mx").alias("mx"),
    )
    combined = interior_total.unionByName(seam_census).unionByName(
        border_census)
    seam_max = acc_seam.agg(F.max("acc").alias("max_accum_on_seam"))
    out = combined.agg(
        F.sum("n_sources").cast("long").alias("n_sources"),
        F.sum("n_small").cast("long").alias("n_small"),
        F.sum("n_medium").cast("long").alias("n_medium"),
        F.sum("n_large").cast("long").alias("n_large"),
        F.max("mx").cast("long").alias("max_accum"),
    ).crossJoin(F.broadcast(seam_max.select(
        F.col("max_accum_on_seam").cast("long").alias("max_accum_on_seam"))))
    # Materialize the one-row census (collect + local rebuild keeps
    # AQE in the plan), then release the cached blocks (ADVICE r10
    # persist-leak fix; closure localCheckpoints are freed by the
    # ContextCleaner once unreferenced).
    from cli_spark.session import materialize_local

    res = materialize_local(out)
    tagged.unpersist()
    seam_next.unpersist()
    acc_seam.unpersist()
    return res
