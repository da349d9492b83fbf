"""FIXTURES.md §5/§6: guerry-analogue polygon tiling — candidate-join
set parity, PIP refinement vs an independent scalar oracle, and the
full raster<->vector zonal join vs a numpy oracle."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from geo_index_spark.fixtures import (
    admin_polygons,
    admin_polygons_df,
    kdbush_df,
    kdbush_points,
    raster_grid,
    raster_grid_df,
)
from geo_index_spark.operators import spatial_join
from geo_index_spark.operators.pip import point_in_polygon, zonal_stats


def _scalar_pip(px, py, ring):
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


def test_polygon_bbox_self_join_oracle(spark):
    """rstar-analogue: candidate self-join over polygon bboxes is
    set-equal to the DuckDB inclusive-overlap theta join
    (reference src/rtree/traversal.rs:402-483)."""
    pdf_polys = admin_polygons_df(spark).select("poly_id", "minx", "miny", "maxx", "maxy")
    got = {
        (r.left_id, r.right_id)
        for r in spatial_join(pdf_polys, pdf_polys, left_id="poly_id", right_id="poly_id").collect()
    }
    con = duckdb.connect()
    con.register("b", pdf_polys.toPandas())
    want = set(
        con.sql(
            """SELECT a.poly_id, c.poly_id FROM b a, b c
               WHERE a.minx <= c.maxx AND a.maxx >= c.minx
                 AND a.miny <= c.maxy AND a.maxy >= c.miny"""
        ).fetchall()
    )
    assert got == want
    # every polygon at least matches itself and (tiling) some neighbor
    assert all((p, p) in got for p in range(85))


def test_pip_refinement_vs_scalar_oracle(spark):
    pts = kdbush_df(spark)
    polys = admin_polygons_df(spark)
    got = {
        (r.row_id, r.poly_id)
        for r in point_in_polygon(pts, polys, grid_level=5).collect()
    }
    want = set()
    for i, (x, y) in enumerate(kdbush_points()):
        for pid, ring in admin_polygons():
            if _scalar_pip(x, y, ring):
                want.add((i, pid))
    assert got == want
    # the tiling covers [0,100]^2, so (almost) every point lands somewhere
    assert len({p for p, _ in got}) >= 95


@pytest.mark.slow
def test_zonal_stats_vs_numpy_oracle(spark):
    raster = raster_grid_df(spark)
    polys = admin_polygons_df(spark)
    got = {r.poly_id: (r.n_cells, r.sum_value) for r in zonal_stats(raster, polys, grid_level=5).collect()}

    g = raster_grid()
    centers = np.column_stack([(g[:, 3] + g[:, 5]) / 2, (g[:, 4] + g[:, 6]) / 2])
    want: dict[int, tuple[int, float]] = {}
    for pid, ring in admin_polygons():
        m = np.array([_scalar_pip(cx, cy, ring) for cx, cy in centers])
        if m.any():
            want[pid] = (int(m.sum()), float(g[m, 7].sum()))
    assert set(got) == set(want)
    for pid in want:
        assert got[pid][0] == want[pid][0], f"poly {pid} count"
        assert abs(got[pid][1] - want[pid][1]) < 1e-9, f"poly {pid} sum"
