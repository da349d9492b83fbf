"""Tiling (tile-assignment parity) + point-in-polygon + zonal stats."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_index_spark.operators.pip import point_in_polygon, ray_cast_np, zonal_stats
from geo_index_spark.operators.tiling import (
    LONLAT_BOUNDS,
    parent_cell_col,
    quad_cell_col,
    quad_cell_np,
    tile_assign,
)


RNG = np.random.default_rng(9)
PTS = np.column_stack([RNG.uniform(-180, 180, 300), RNG.uniform(-90, 90, 300)])


@pytest.mark.parametrize("level", [0, 4, 8, 12, 16])
def test_tile_parity_catalyst_vs_numpy(spark, level):
    """Tile-assignment parity: Catalyst expression == frozen numpy spec."""
    rows = [(float(x), float(y)) for x, y in PTS]
    df = spark.createDataFrame(rows, "x double, y double")
    got = tile_assign(df, level=level).toPandas()
    want = quad_cell_np(got["x"].to_numpy(), got["y"].to_numpy(), level)
    assert np.array_equal(got["cell_id"].to_numpy().astype(np.uint64), want)


def test_tile_golden_values():
    """Frozen golden assignments (FIXTURES.md §7) — guards the spec."""
    x = np.array([-180.0, 0.0, 179.9, -0.1])
    y = np.array([-90.0, 0.0, 89.9, 45.0])
    got4 = quad_cell_np(x, y, 4)
    # level tag in top bits
    assert np.all(got4 >> np.uint64(58) == 4)
    # (0,0) at level 4 -> grid (8, 8) -> morton interleave
    assert int(got4[1]) & ((1 << 58) - 1) == 0b11000000
    # corners
    assert int(got4[0]) & ((1 << 58) - 1) == 0


def test_parent_cell_rollup(spark):
    rows = [(float(x), float(y)) for x, y in PTS]
    df = spark.createDataFrame(rows, "x double, y double")
    t8 = tile_assign(df, level=8)
    rolled = t8.withColumn("parent", parent_cell_col(F.col("cell_id")))
    direct = tile_assign(df, level=7).withColumnRenamed("cell_id", "direct7")
    j = rolled.join(direct, ["x", "y"])
    # parent's morton == level-7 morton; level tag differs by construction
    mism = j.filter(
        (F.col("parent").bitwiseAND(F.lit((1 << 58) - 1)))
        != (F.col("direct7").bitwiseAND(F.lit((1 << 58) - 1)))
    ).count()
    assert mism == 0


def test_ray_cast_against_shapely_free_oracle():
    """PIP kernel vs an independent scalar even-odd implementation."""
    ring = np.array([[0, 0], [10, 0], [10, 10], [5, 15], [0, 10]], dtype=float)

    def scalar_pip(px, py):
        inside = False
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                xin = (x2 - x1) * (py - y1) / (y2 - y1) + x1
                if px < xin:
                    inside = not inside
        return inside

    pts = RNG.uniform(-2, 17, size=(500, 2))
    got = ray_cast_np(pts[:, 0], pts[:, 1], ring)
    want = np.array([scalar_pip(x, y) for x, y in pts])
    assert np.array_equal(got, want)


def _square(cx, cy, r):
    return [[cx - r, cy - r], [cx + r, cy - r], [cx + r, cy + r], [cx - r, cy + r]]


def test_point_in_polygon_operator(spark):
    polys = [
        (0, _square(10.0, 10.0, 5.0), 5.0, 5.0, 15.0, 15.0),
        (1, _square(30.0, 30.0, 8.0), 22.0, 22.0, 38.0, 38.0),
    ]
    pdf = spark.createDataFrame(
        polys,
        "poly_id long, vertices array<array<double>>, minx double, miny double, maxx double, maxy double",
    )
    pts = [(0, 10.0, 10.0), (1, 14.9, 14.9), (2, 16.0, 10.0), (3, 30.0, 25.0), (4, 50.0, 50.0)]
    pts_df = spark.createDataFrame(pts, "row_id long, x double, y double")
    got = {(r.row_id, r.poly_id) for r in point_in_polygon(pts_df, pdf, grid_level=3).collect()}
    assert got == {(0, 0), (1, 0), (3, 1)}


def test_zonal_stats(spark):
    # 8x8 raster over [0,16]^2, value = row+col; one zone square [0,8]^2
    cells = []
    for r in range(8):
        for c in range(8):
            cells.append((r * 8 + c, float(c * 2), float(r * 2), float(c * 2 + 2), float(r * 2 + 2), float(r + c)))
    raster = spark.createDataFrame(
        cells, "cell_id long, minx double, miny double, maxx double, maxy double, value double"
    )
    polys = [(0, _square(4.0, 4.0, 4.0), 0.0, 0.0, 8.0, 8.0)]
    pdf = spark.createDataFrame(
        polys,
        "poly_id long, vertices array<array<double>>, minx double, miny double, maxx double, maxy double",
    )
    got = zonal_stats(raster, pdf, grid_level=2).collect()
    assert len(got) == 1
    row = got[0]
    # cells with centers inside [0,8)^2: rows 0-3, cols 0-3 -> 16 cells, sum = sum(r+c)
    assert row.n_cells == 16
    assert row.sum_value == sum(r + c for r in range(4) for c in range(4))
    assert row.min_value == 0.0 and row.max_value == 6.0


def test_tile_assignment_frozen_golden(spark):
    """FIXTURES.md §7: tile assignments pinned to the frozen golden
    table — guards the spec against accidental kernel changes, both in
    numpy and in the Catalyst twin."""
    import json
    import pathlib

    rows = json.load(open(pathlib.Path(__file__).parent / "data" / "tiles_expected.json"))
    xs = np.array([r[0] for r in rows])
    ys = np.array([r[1] for r in rows])
    lvls = np.array([r[2] for r in rows])
    want = np.array([r[3] for r in rows], dtype=np.uint64)
    for lvl in (4, 8, 12):
        m = lvls == lvl
        assert np.array_equal(quad_cell_np(xs[m], ys[m], lvl), want[m])
    df = spark.createDataFrame(
        [(float(a), float(b), int(l), int(c)) for a, b, l, c in rows],
        "x double, y double, level int, want long",
    )
    for lvl in (4, 8, 12):
        bad = (
            df.filter(F.col("level") == lvl)
            .filter(quad_cell_col(F.col("x"), F.col("y"), lvl) != F.col("want"))
            .count()
        )
        assert bad == 0


@pytest.mark.slow
def test_pip_join_variant_matches_broadcast(spark):
    """point_in_polygon_join (distributed edge join, no broadcast) must
    produce the identical pair set as the broadcast ray-cast refine."""
    import numpy as np
    from geo_index_spark.operators.pip import point_in_polygon, point_in_polygon_join

    rng = np.random.default_rng(5)
    pts = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(0, 100, (400, 2)))],
        "row_id long, x double, y double",
    )
    polys_raw = [
        (0, [[10.0, 10.0], [50.0, 5.0], [60.0, 45.0], [25.0, 55.0]]),
        (1, [[40.0, 40.0], [90.0, 35.0], [85.0, 90.0], [55.0, 80.0], [45.0, 95.0]]),  # non-convex
        (2, [[0.0, 60.0], [30.0, 60.0], [30.0, 99.0], [0.0, 99.0], [0.0, 60.0]]),  # closed ring
    ]
    rows = []
    for pid, ring in polys_raw:
        xs, ys = [p[0] for p in ring], [p[1] for p in ring]
        rows.append((pid, ring, min(xs), min(ys), max(xs), max(ys)))
    polys = spark.createDataFrame(
        rows,
        "poly_id long, vertices array<array<double>>, minx double, miny double,"
        " maxx double, maxy double",
    )
    bc = {(r.row_id, r.poly_id) for r in point_in_polygon(pts, polys, grid_level=4).collect()}
    dj = {(r.row_id, r.poly_id) for r in point_in_polygon_join(pts, polys, grid_level=4).collect()}
    assert dj == bc and len(bc) > 50
