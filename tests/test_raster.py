"""A11 golden tests: PostGIS WKB raster encoding round-trips exactly
(header fields, georeference, nodata flag, sample values) against the
numpy ground-truth tile blocks."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cli_spark.sources import hgt, raster

N = 101


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hgt_raster"))
    hgt.write_fixture(d, "N46E007", N, 0.0)
    return d


def test_wkb_roundtrip_single(spark):
    vals = [10, -5, hgt.VOID, 42]
    h = raster.encode_wkb_raster(vals, 2, 2, 7.0, 47.0, 1.0 / (N - 1))
    d = raster.decode_wkb_raster(h)
    assert d["endian"] == 1 and d["version"] == 0 and d["nbands"] == 1
    assert d["pixtype"] == 5 and d["has_nodata"] and d["nodata"] == hgt.VOID
    assert d["scale_x"] == 1.0 / (N - 1) and d["scale_y"] == -1.0 / (N - 1)
    assert (d["ip_lng"], d["ip_lat"]) == (7.0, 47.0)
    assert d["srid"] == raster.SRID_WGS84
    assert d["values"] == vals


def test_tiles_to_wkb_golden(spark, fixture_dir):
    tiles = hgt.decode_tiles(hgt.read_hgt(spark, fixture_dir), width=25, height=25)
    wkb = raster.tiles_to_wkb(tiles, grid_n=N)
    row = wkb.filter((F.col("tile_row") == 1) & (F.col("tile_col") == 2)).collect()[0]
    d = raster.decode_wkb_raster(row["wkb_hex"])
    g = hgt.synth_grid(N, 0.0).astype(np.int32)
    assert d["values"] == g[25:50, 50:75].ravel().tolist()
    step = 1.0 / (N - 1)
    assert d["ip_lat"] == 46 + 1 - 25 * step  # NW corner of the tile
    assert d["ip_lng"] == 7 + 50 * step
    assert (d["width"], d["height"]) == (25, 25)
    # every tile encodes; count matches the tile grid
    assert wkb.count() == tiles.count()
