"""Distributed operators vs goldens + DuckDB oracles + partition invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_index_spark.fixtures import (
    DATA1_SEARCH_40_60_BOXES,
    KD_RANGE_20_30_50_70_IDS,
    KD_WITHIN_50_50_R20_IDS,
    data1_boxes,
    data1_df,
    kdbush_df,
)
from geo_index_spark.operators import (
    bbox_search,
    boxes_at_level,
    global_bounds,
    hilbert_partition,
    kd_range,
    knn,
    partition_boxes,
    partitions,
    spatial_join,
    within,
)


def test_bbox_search_golden(spark):
    df = data1_df(spark)
    got = bbox_search(df, 40, 40, 60, 60).select("minx", "miny", "maxx", "maxy").collect()
    assert {tuple(r) for r in got} == DATA1_SEARCH_40_60_BOXES


def test_bbox_search_touching_edges_match(spark):
    df = spark.createDataFrame(
        [(0, 0.0, 0.0, 1.0, 1.0)], "row_id long, minx double, miny double, maxx double, maxy double"
    )
    assert bbox_search(df, 1.0, 1.0, 2.0, 2.0).count() == 1  # inclusive overlap
    assert bbox_search(df, 1.0001, 1.0, 2.0, 2.0).count() == 0


def test_kd_range_and_within_goldens(spark):
    df = kdbush_df(spark)
    got = {r.row_id for r in kd_range(df, 20, 30, 50, 70).collect()}
    assert got == KD_RANGE_20_30_50_70_IDS
    got_w = {r.row_id for r in within(df, 50, 50, 20).collect()}
    assert got_w == KD_WITHIN_50_50_R20_IDS


def test_global_bounds(spark):
    b = data1_boxes()
    got = global_bounds(data1_df(spark))
    assert got == (b[:, 0].min(), b[:, 1].min(), b[:, 2].max(), b[:, 3].max())


def test_hilbert_partition_preserves_rows_and_clusters(spark):
    df = data1_df(spark)
    hp = hilbert_partition(df, 4)
    assert hp.count() == 100
    # keys are non-decreasing within each partition (sortWithinPartitions)
    pdf = hp.select("hilbert", F.spark_partition_id().alias("pid")).toPandas()
    for _, g in pdf.groupby("pid"):
        assert (np.diff(g["hilbert"].to_numpy()) >= 0).all()


def test_partitions_matches_local_flatbush_grouping(spark):
    """X2 parity: distributed partition assignment groups the same items
    per leaf node as the local packed tree (node_size chunks of the
    Hilbert order)."""
    from geo_index_spark.localindex.flatbush import Flatbush

    boxes = data1_boxes()
    node_size = 16
    p = partitions(data1_df(spark), node_size).orderBy("hilbert", "row_id").toPandas()
    fb = Flatbush(boxes, node_size=node_size)
    local_order = fb.indices[:100]
    for pid in range(int(np.ceil(100 / node_size))):
        want = set(local_order[pid * node_size : (pid + 1) * node_size].tolist())
        got = set(p.loc[p["partition_id"] == pid, "row_id"].tolist())
        assert got == want, f"partition {pid}"


def test_with_str_order_matches_local_kernel(spark):
    """B3 parity: the distributed STR order equals the local
    flatbush._str_order leaf order item for item (unique x-centers, so
    the id tiebreak coincides with the kernel's stable input order)."""
    from geo_index_spark.localindex.flatbush import _str_order
    from geo_index_spark.operators.partitioning import with_str_order

    boxes = data1_boxes()
    node_size = 16
    want = _str_order(boxes, node_size).tolist()
    got = (
        with_str_order(data1_df(spark), node_size)
        .orderBy("str_pos")
        .select("row_id")
        .toPandas()["row_id"]
        .tolist()
    )
    assert got == want


def test_str_partition_preserves_rows_and_slices(spark):
    """Scale path: rows preserved, <= ceil(sqrt(P)) slices, and within
    each Spark partition the (slice_id, str_y) sort holds (that sort is
    what gives parquet files tight min/max stats)."""
    from geo_index_spark.operators.partitioning import str_partition

    df = data1_df(spark)
    sp = str_partition(df, 4)
    assert sp.count() == 100
    pdf = sp.select("slice_id", "str_y", F.spark_partition_id().alias("pid")).toPandas()
    assert pdf["slice_id"].nunique() <= 2  # ceil(sqrt(4))
    for _, g in pdf.groupby("pid"):
        keys = list(zip(g["slice_id"], g["str_y"]))
        assert keys == sorted(keys)


def test_partitions_five_items_node_size_two(spark):
    # reference python/tests/test_rtree.py: 5 items, node_size 2 => 3 partitions
    df = spark.createDataFrame(
        [(i, float(i), float(i), float(i) + 1, float(i) + 1) for i in range(5)],
        "row_id long, minx double, miny double, maxx double, maxy double",
    )
    p = partitions(df, 2)
    counts = p.groupBy("partition_id").count().orderBy("partition_id").collect()
    assert [r["count"] for r in counts] == [2, 2, 1]


def test_partition_boxes_cover_items(spark):
    df = data1_df(spark)
    p = partitions(df, 16)
    pb = partition_boxes(p).toPandas()
    items = p.toPandas()
    for _, row in items.iterrows():
        box = pb[pb.partition_id == row.partition_id].iloc[0]
        assert box.minx <= row.minx and box.miny <= row.miny
        assert box.maxx >= row.maxx and box.maxy >= row.maxy


def test_boxes_at_level_1_equals_partition_boxes(spark):
    df = data1_df(spark)
    got = boxes_at_level(df, 16, 1).toPandas()
    want = partition_boxes(partitions(df, 16)).toPandas()
    assert got.equals(want)


def test_knn_order_and_tiebreak(spark):
    df = kdbush_df(spark)
    got = knn(df, 50, 50, 10).toPandas()
    pts = np.array([[r.x, r.y] for _, r in got.iterrows()])
    d = np.hypot(pts[:, 0] - 50, pts[:, 1] - 50)
    assert np.all(np.diff(d) >= 0)
    # oracle via duckdb
    con = duckdb.connect()
    pdf = kdbush_df(spark).toPandas()
    con.register("pts", pdf)
    want = con.sql(
        "SELECT row_id FROM pts ORDER BY (x-50)*(x-50)+(y-50)*(y-50), row_id LIMIT 10"
    ).fetchall()
    assert list(got.row_id) == [r[0] for r in want]


def test_knn_max_distance_inclusive(spark):
    df = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 3.0, 4.0), (2, 10.0, 0.0)], "row_id long, x double, y double"
    )
    got = knn(df, 0, 0, 10, max_distance=5.0).toPandas()
    assert list(got.row_id) == [0, 1]  # dist 5 inclusive


def test_knn_haversine_doctest(spark):
    df = spark.createDataFrame(
        [(0, -74.0, 40.7), (1, -0.1, 51.5), (2, 139.7, 35.7)],
        "row_id long, x double, y double",
    )
    got = knn(df, -74.0, 40.7, 3, metric="haversine").toPandas()
    assert list(got.row_id) == [0, 1, 2]


def _duckdb_join_oracle(boxes: np.ndarray) -> set[tuple[int, int]]:
    con = duckdb.connect()
    import pandas as pd

    pdf = pd.DataFrame(boxes, columns=["minx", "miny", "maxx", "maxy"])
    pdf["row_id"] = range(len(pdf))
    con.register("b", pdf)
    rows = con.sql(
        """
        SELECT a.row_id, c.row_id FROM b a, b c
        WHERE a.minx <= c.maxx AND a.maxx >= c.minx
          AND a.miny <= c.maxy AND a.maxy >= c.miny
        """
    ).fetchall()
    return set(rows)


@pytest.mark.parametrize("grid_level", [2, 5, 8])
def test_spatial_self_join_oracle(spark, grid_level):
    """Q6/X4 parity: candidate set == DuckDB inclusive-overlap theta join
    (the reference's rstar set-parity analogue)."""
    boxes = data1_boxes()
    df = data1_df(spark)
    got = spatial_join(df, df, grid_level=grid_level).collect()
    got_set = {(r.left_id, r.right_id) for r in got}
    assert len(got) == len(got_set), "duplicate pairs emitted"
    assert got_set == _duckdb_join_oracle(boxes)


def test_spatial_join_broadcast_matches(spark):
    boxes = data1_boxes()
    df = data1_df(spark)
    got = spatial_join(df, df, grid_level=4, broadcast_side="right").collect()
    assert {(r.left_id, r.right_id) for r in got} == _duckdb_join_oracle(boxes)


def test_partition_invariance(spark):
    """Golden results identical across partition counts (FIXTURES.md §8)."""
    df = data1_df(spark)
    want = {r.row_id for r in bbox_search(df, 40, 40, 60, 60).collect()}
    for p in (1, 4, 13):
        got = {r.row_id for r in bbox_search(df.repartition(p), 40, 40, 60, 60).collect()}
        assert got == want


def test_spatial_join_salted_parity(spark):
    """salt>1 must not change the result set (skew path correctness)."""
    boxes = data1_boxes()
    df = data1_df(spark)
    want = _duckdb_join_oracle(boxes)
    got = {(r.left_id, r.right_id) for r in spatial_join(df, df, grid_level=4, salt=4).collect()}
    assert got == want


def test_distance_join_oracle(spark):
    """Two-phase candidate->refine distance join vs DuckDB oracle."""
    from geo_index_spark.operators.join import distance_join

    df = kdbush_df(spark)
    got = {(r.left_id, r.right_id) for r in distance_join(df, df, 12.0).collect()}
    con = duckdb.connect()
    con.register("p", df.toPandas())
    want = set(
        con.sql(
            """SELECT a.row_id, b.row_id FROM p a, p b
               WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 144.0"""
        ).fetchall()
    )
    assert got == want


def test_validate_null_nan_policy(spark):
    from geo_index_spark.operators.validate import drop_invalid, reject_invalid

    df = spark.createDataFrame(
        [(0, 1.0, 2.0), (1, None, 3.0), (2, float("nan"), 4.0), (3, 5.0, 6.0)],
        "row_id long, x double, y double",
    )
    kept = {r.row_id for r in drop_invalid(df, ("x", "y")).collect()}
    assert kept == {0, 3}
    with pytest.raises(ValueError, match="null/NaN"):
        reject_invalid(df, ("x", "y"))
    clean = drop_invalid(df, ("x", "y"))
    assert reject_invalid(clean, ("x", "y")) is clean


def test_knn_sequence_500_tie_free(spark):
    """FIXTURES.md §4: 500 seeded points, exact (dist, row_id) sequence
    vs numpy oracle."""
    rng = np.random.default_rng(4242)
    pts = rng.uniform(0, 1000, size=(500, 2))
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "row_id long, x double, y double",
    )
    q = (333.33, 666.66)
    got = [r.row_id for r in knn(df, *q, 50).collect()]
    d = np.hypot(pts[:, 0] - q[0], pts[:, 1] - q[1])
    want = sorted(range(500), key=lambda i: (d[i], i))[:50]
    assert got == want


class TestKnnGeometry:
    """Q5 full: kNN by query geometry vs the numpy brute-force twin."""

    PLINE = [[10.0, 10.0], [40.0, 80.0], [70.0, 20.0], [95.0, 60.0]]
    PGON = [[20.0, 20.0], [80.0, 15.0], [90.0, 70.0], [50.0, 95.0], [15.0, 60.0]]

    def _brute(self, df, vertices, geom_type, k, max_distance=None):
        import numpy as np
        from geo_index_spark.operators.knn import point_to_geom_np

        rows = df.collect()
        ids = np.array([r.row_id for r in rows])
        d = point_to_geom_np([r.x for r in rows], [r.y for r in rows], vertices, geom_type)
        order = np.lexsort((ids, d))
        out = [(int(ids[i]), float(d[i])) for i in order]
        if max_distance is not None:
            out = [(i, v) for i, v in out if v <= max_distance]
        return [(i, round(v, 9)) for i, v in out[:k]]

    @pytest.mark.parametrize("geom_type,verts", [("polyline", PLINE), ("polygon", PGON)])
    @pytest.mark.parametrize("two_phase", [True, False])
    def test_matches_bruteforce(self, spark, geom_type, verts, two_phase):
        from geo_index_spark.fixtures import kdbush_df
        from geo_index_spark.operators.knn import knn_geometry

        df = kdbush_df(spark)
        got = [
            (r.row_id, round(r.dist, 9))
            for r in knn_geometry(df, verts, 25, geom_type=geom_type, two_phase=two_phase).collect()
        ]
        assert got == self._brute(df, verts, geom_type, 25)

    def test_polygon_interior_distance_zero(self, spark):
        from geo_index_spark.operators.knn import knn_geometry

        pts = spark.createDataFrame(
            [(1, 50.0, 50.0), (2, 200.0, 200.0)], "row_id long, x double, y double"
        )
        out = {r.row_id: r.dist for r in knn_geometry(pts, self.PGON, 2, geom_type="polygon").collect()}
        assert out[1] == 0.0 and out[2] > 0.0

    def test_max_distance(self, spark):
        from geo_index_spark.fixtures import kdbush_df
        from geo_index_spark.operators.knn import knn_geometry

        df = kdbush_df(spark)
        got = [
            (r.row_id, round(r.dist, 9))
            for r in knn_geometry(df, self.PLINE, 25, max_distance=5.0).collect()
        ]
        assert got == self._brute(df, self.PLINE, "polyline", 25, max_distance=5.0)

    def test_large_geometry_arrow_path(self, spark):
        """>MAX_CODEGEN_EDGES vertices switch the exact distance to the
        Arrow numpy kernel; results must equal the Catalyst expression
        path exactly (same formula, same IEEE doubles)."""
        import importlib
        import math
        from geo_index_spark.fixtures import kdbush_df

        # the knn FUNCTION shadows the knn module on the package
        K = importlib.import_module("geo_index_spark.operators.knn")

        df = kdbush_df(spark)
        # 100-vertex polyline spiral (forces the Arrow path)
        big = [
            [50.0 + 0.4 * i * math.cos(i / 6.0), 50.0 + 0.4 * i * math.sin(i / 6.0)]
            for i in range(100)
        ]
        assert len(K._geom_edges(big, "polyline")) > K.MAX_CODEGEN_EDGES
        arrow = [
            (r.row_id, round(r.dist, 9))
            for r in K.knn_geometry(df, big, 25, geom_type="polyline").collect()
        ]
        old = K.MAX_CODEGEN_EDGES
        try:
            K.MAX_CODEGEN_EDGES = 10_000  # force the Catalyst path
            catalyst = [
                (r.row_id, round(r.dist, 9))
                for r in K.knn_geometry(df, big, 25, geom_type="polyline").collect()
            ]
        finally:
            K.MAX_CODEGEN_EDGES = old
        assert arrow == catalyst == self._brute(df, big, "polyline", 25)


class TestKnnJoin:
    """Exact distributed kNN join vs brute force."""

    def _brute(self, lrows, rrows, k):
        import numpy as np

        out = []
        for lid, lx, ly in lrows:
            ds = sorted(
                (round(float(np.hypot(lx - rx, ly - ry)), 9), rid)
                for rid, rx, ry in rrows
            )
            out.extend((lid, rid, d) for d, rid in ds[:k])
        return sorted(out)

    def test_matches_bruteforce(self, spark):
        import numpy as np
        from geo_index_spark.operators.knn import knn_join

        rng = np.random.default_rng(9)
        # clustered right side + far-away void lefts (forces multi-round)
        rpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.normal(50, 5, (300, 2)))]
        lpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(0, 100, (80, 2)))]
        lpts += [(1000, 0.5, 0.5), (1001, 99.5, 99.5)]  # deep voids
        ldf = spark.createDataFrame(lpts, "row_id long, x double, y double")
        rdf = spark.createDataFrame(rpts, "row_id long, x double, y double")
        got = sorted(
            (r.left_id, r.right_id, round(r.dist, 9))
            for r in knn_join(ldf, rdf, 5).collect()
        )
        assert got == self._brute(lpts, rpts, 5)

    def test_k_exceeds_right_count(self, spark):
        from geo_index_spark.operators.knn import knn_join

        ldf = spark.createDataFrame([(1, 0.0, 0.0), (2, 9.0, 9.0)], "row_id long, x double, y double")
        rdf = spark.createDataFrame([(7, 1.0, 1.0), (8, 2.0, 2.0)], "row_id long, x double, y double")
        got = sorted((r.left_id, r.right_id) for r in knn_join(ldf, rdf, 5).collect())
        assert got == [(1, 7), (1, 8), (2, 7), (2, 8)]


def test_haversine_distance_join_oracle(spark):
    """Meters-radius pairs over (lon, lat): candidate degree-box
    expansion must be complete (incl. high-latitude clusters where
    dlon widens) — parity vs the DuckDB exact cross join."""
    import numpy as np
    from geo_index_spark.operators.join import distance_join

    rng = np.random.default_rng(3)
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        np.column_stack([rng.uniform(-10, 10, 150), rng.uniform(40, 60, 150)])
    )]
    # high-latitude cluster: dlon expansion is much wider than dlat
    pts += [(1000 + i, float(x), float(y)) for i, (x, y) in enumerate(
        np.column_stack([rng.uniform(-30, 30, 60), rng.uniform(84.0, 89.5, 60)])
    )]
    df = spark.createDataFrame(pts, "row_id long, x double, y double")
    got = {(r.left_id, r.right_id) for r in distance_join(df, df, 300_000.0, metric="haversine").collect()}
    con = duckdb.connect()
    con.register("p", df.toPandas())
    want = set(
        con.sql(
            """SELECT a.row_id, b.row_id FROM p a, p b
               WHERE 2.0 * 6378137.0 * asin(sqrt(least(1.0,
                 pow(sin(radians(b.y - a.y)/2),2)
                 + cos(radians(a.y))*cos(radians(b.y))*pow(sin(radians(b.x - a.x)/2),2)
               ))) <= 300000.0"""
        ).fetchall()
    )
    assert got == want and len(got) > len(pts)

def test_knn_join_haversine_matches_bruteforce(spark):
    import numpy as np
    from geo_index_spark.operators.knn import knn_join

    rng = np.random.default_rng(11)
    rpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        np.column_stack([rng.uniform(-20, 20, 200), rng.uniform(30, 70, 200)])
    )]
    # high-latitude lefts exercise the dlon widening
    lpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        np.column_stack([rng.uniform(-20, 20, 40), rng.uniform(30, 88, 40)])
    )]
    ldf = spark.createDataFrame(lpts, "row_id long, x double, y double")
    rdf = spark.createDataFrame(rpts, "row_id long, x double, y double")
    got = sorted(
        (r.left_id, r.right_id, round(r.dist, 6))
        for r in knn_join(ldf, rdf, 4, metric="haversine").collect()
    )
    R = 6378137.0
    brute = []
    for lid, lx, ly in lpts:
        ds = []
        for rid, rx, ry in rpts:
            h = (np.sin(np.radians(ry - ly) / 2) ** 2
                 + np.cos(np.radians(ly)) * np.cos(np.radians(ry))
                 * np.sin(np.radians(rx - lx) / 2) ** 2)
            ds.append((2.0 * R * np.arcsin(np.sqrt(min(1.0, h))), rid))
        ds.sort()
        brute.extend((lid, rid, round(float(d), 6)) for d, rid in ds[:4])
    assert got == sorted(brute)


def test_haversine_dateline_wrap(spark):
    """Antimeridian: pairs straddling +-180 MUST be returned (wrap-aware
    candidate boxes; round 2 clamped at +-180 and silently dropped
    them). Both distance_join and knn_join vs numpy brute force."""
    import numpy as np
    from geo_index_spark.operators.join import distance_join
    from geo_index_spark.operators.knn import knn_join

    rng = np.random.default_rng(5)
    lon_east = rng.uniform(178.5, 180.0, 60)        # just west of the line
    lon_west = rng.uniform(-180.0, -178.5, 60)      # just east of it
    lon = np.concatenate([lon_east, lon_west])
    lat = rng.uniform(55.0, 65.0, 120)
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(np.column_stack([lon, lat]))]
    df = spark.createDataFrame(pts, "row_id long, x double, y double")

    R = 6378137.0

    def hav(lx, ly, rx, ry):
        h = (np.sin(np.radians(ry - ly) / 2) ** 2
             + np.cos(np.radians(ly)) * np.cos(np.radians(ry))
             * np.sin(np.radians(rx - lx) / 2) ** 2)
        return 2.0 * R * np.arcsin(np.sqrt(np.minimum(1.0, h)))

    r_m = 100_000.0
    got = {(r.left_id, r.right_id) for r in distance_join(df, df, r_m, metric="haversine").collect()}
    want = set()
    for i, lx, ly in pts:
        for j, rx, ry in pts:
            if hav(lx, ly, rx, ry) <= r_m:
                want.add((i, j))
    assert got == want
    # the fixture must actually cross the line
    crossing = {(a, b) for (a, b) in want if (pts[a][1] > 0) != (pts[b][1] > 0)}
    assert len(crossing) > 10

    got_knn = sorted(
        (r.left_id, r.right_id, round(r.dist, 6))
        for r in knn_join(df, df, 3, metric="haversine").collect()
    )
    brute = []
    for i, lx, ly in pts:
        ds = sorted((float(hav(lx, ly, rx, ry)), j) for j, rx, ry in pts)
        brute.extend((i, j, round(d, 6)) for d, j in ds[:3])
    assert got_knn == sorted(brute)
    # nearest neighbors must include cross-dateline ones
    assert any((pts[a][1] > 0) != (pts[b][1] > 0) for a, b, _ in got_knn)


def test_haversine_invalid_latitude_raises(spark):
    """|lat| > 90 breaks the degree-box completeness proof — the
    expansion now raises row-level instead of silently returning
    wrong candidates (ADVICE r2)."""
    from geo_index_spark.operators.join import distance_join

    df = spark.createDataFrame(
        [(0, 10.0, 45.0), (1, 11.0, 95.0)], "row_id long, x double, y double"
    )
    with pytest.raises(Exception, match="(?i)lat"):
        distance_join(df, df, 50_000.0, metric="haversine").collect()


def test_knn_join_max_distance(spark):
    """Inclusive max_distance prune (reference neighbors trait.rs:261):
    up to k rows per left, dist <= max_d; lefts in voids get fewer or
    zero rows; euclidean + haversine vs brute force."""
    import numpy as np
    from geo_index_spark.operators.knn import knn_join

    rng = np.random.default_rng(13)
    rpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        np.column_stack([rng.uniform(0, 100, 150), rng.uniform(0, 100, 150)])
    )]
    # lefts: mix of in-cluster and far-void points (zero neighbors)
    lpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        np.column_stack([rng.uniform(0, 100, 25), rng.uniform(0, 100, 25)])
    )] + [(100, 500.0, 500.0), (101, -300.0, 50.0)]
    ldf = spark.createDataFrame(lpts, "row_id long, x double, y double")
    rdf = spark.createDataFrame(rpts, "row_id long, x double, y double")
    max_d = 8.0
    got = sorted(
        (r.left_id, r.right_id, round(r.dist, 6))
        for r in knn_join(ldf, rdf, 4, max_distance=max_d).collect()
    )
    brute = []
    for lid, lx, ly in lpts:
        ds = sorted(
            (float(np.hypot(rx - lx, ry - ly)), rid) for rid, rx, ry in rpts
        )
        brute.extend(
            (lid, rid, round(d, 6)) for d, rid in ds[:4] if d <= max_d
        )
    assert got == sorted(brute)
    # the fixture must exercise partial and empty lefts
    per_left = {}
    for lid, _, _ in got:
        per_left[lid] = per_left.get(lid, 0) + 1
    assert 100 not in per_left and 101 not in per_left
    assert any(c < 4 for c in per_left.values())


def test_within_geo_matches_bruteforce_incl_dateline(spark):
    """Haversine radius query: degree-box prefilter (wrapped lon OR
    when the window crosses +-180) + exact residual == brute force."""
    import numpy as np
    from geo_index_spark.operators.search import within_geo

    rng = np.random.default_rng(17)
    lon = np.concatenate([rng.uniform(-180, 180, 200),
                          rng.uniform(178, 180, 40), rng.uniform(-180, -178, 40)])
    lat = rng.uniform(-85, 85, 280)
    pts = [(i, float(a), float(b)) for i, (a, b) in enumerate(np.column_stack([lon, lat]))]
    df = spark.createDataFrame(pts, "row_id long, x double, y double")
    R = 6378137.0

    def hav(lx, ly, rx, ry):
        h = (np.sin(np.radians(ry - ly) / 2) ** 2
             + np.cos(np.radians(ly)) * np.cos(np.radians(ry))
             * np.sin(np.radians(rx - lx) / 2) ** 2)
        return 2.0 * R * np.arcsin(np.sqrt(min(1.0, h)))

    for qlon, qlat, r in [(179.3, 50.0, 400_000.0), (0.0, 87.0, 600_000.0), (-30.0, 10.0, 250_000.0)]:
        got = {row.row_id for row in within_geo(df, qlon, qlat, r).collect()}
        want = {i for i, x, y in pts if hav(qlon, qlat, x, y) <= r}
        assert got == want, (qlon, qlat, r)
    # dateline query must actually return points on both sides
    got = [(pts[i][1]) for i in sorted({row.row_id for row in within_geo(df, 179.9, 50.0, 300_000.0).collect()})]
    assert any(v > 0 for v in got) and any(v < 0 for v in got)


def test_knn_haversine_max_distance_prefilter(spark):
    """Radius-capped geo kNN: the degree-box prefilter (wrapped across
    +-180) must not drop any true neighbor — parity vs unpruned,
    including a dateline query point."""
    import numpy as np
    from geo_index_spark.operators.knn import knn

    rng = np.random.default_rng(23)
    lon = np.concatenate([rng.uniform(-180, 180, 150),
                          rng.uniform(178, 180, 30), rng.uniform(-180, -178, 30)])
    lat = rng.uniform(-85, 85, 210)
    pts = [(i, float(a), float(b)) for i, (a, b) in enumerate(np.column_stack([lon, lat]))]
    df = spark.createDataFrame(pts, "row_id long, x double, y double")
    for qlon, qlat, maxd in [(179.8, 40.0, 800_000.0), (-30.0, 10.0, 2_000_000.0)]:
        capped = [
            (r.row_id, round(r.dist, 6))
            for r in knn(df, qlon, qlat, 10, metric="haversine", max_distance=maxd).collect()
        ]
        full = [
            (r.row_id, round(r.dist, 6))
            for r in knn(df, qlon, qlat, 10, metric="haversine").collect()
            if r.dist <= maxd
        ]
        assert capped == full
        assert capped  # fixture must yield neighbors inside the cap


def test_within_geo_prefilter_pushed_to_scan(spark, tmp_path):
    """The degree-box prefilter (incl. the wrapped-lon OR) must reach
    the parquet scan as PushedFilters — the claim that makes
    radius-capped geo queries partial scans on clustered storage."""
    import numpy as np
    from geo_index_spark.operators.search import within_geo

    rng = np.random.default_rng(29)
    pts = [(i, float(a), float(b)) for i, (a, b) in enumerate(
        np.column_stack([rng.uniform(-180, 180, 500), rng.uniform(-85, 85, 500)])
    )]
    path = str(tmp_path / "geo")
    spark.createDataFrame(pts, "row_id long, x double, y double").write.parquet(path)
    df = spark.read.parquet(path)
    # PushedFilters rendering truncates at 100 chars by default
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")

    plan = within_geo(df, 20.0, 40.0, 300_000.0)._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters:", 1)[1].splitlines()[0]
    assert "GreaterThanOrEqual(x" in pushed and "LessThanOrEqual(x" in pushed
    assert "GreaterThanOrEqual(y" in pushed and "LessThanOrEqual(y" in pushed

    # dateline query: the lon OR must still push (Or of two ranges)
    plan2 = within_geo(df, 179.9, 40.0, 300_000.0)._jdf.queryExecution().executedPlan().toString()
    pushed2 = plan2.split("PushedFilters:", 1)[1].splitlines()[0]
    assert "Or(" in pushed2 and "x" in pushed2


def test_sanitize_lonlat_policies(spark):
    """WGS84 domain sanitizer feeding the haversine operators: drop
    removes out-of-range rows, wrap folds lon (keeping rows) but drops
    junk latitudes, reject fails fast with counts."""
    from geo_index_spark.operators.validate import sanitize_lonlat

    rows = [
        (0, 10.0, 45.0),      # valid
        (1, 540.0, 20.0),     # lon wraps to 180
        (2, -200.0, 10.0),    # lon wraps to 160
        (3, 30.0, 95.0),      # junk latitude
        (4, float("nan"), 5.0),
        (5, None, 5.0),
    ]
    df = spark.createDataFrame(rows, "row_id long, x double, y double")

    dropped = {r.row_id for r in sanitize_lonlat(df, policy="drop").collect()}
    assert dropped == {0}

    wrapped = {r.row_id: r.x for r in sanitize_lonlat(df, policy="wrap").collect()}
    assert set(wrapped) == {0, 1, 2}
    assert wrapped[0] == 10.0 and wrapped[1] == -180.0 and wrapped[2] == 160.0

    with pytest.raises(ValueError, match="WGS84"):
        sanitize_lonlat(df, policy="reject")
    ok = df.filter("row_id = 0")
    assert sanitize_lonlat(ok, policy="reject").count() == 1

    # sanitized output is accepted by the haversine operators
    from geo_index_spark.operators.join import distance_join

    clean = sanitize_lonlat(df, policy="wrap")
    n = distance_join(clean, clean, 1_000.0, metric="haversine").count()
    assert n >= 3  # at least the self-pairs


def test_geo_prefilter_180_alias_admitted(spark):
    """ADVICE r3: +-180 name the same meridian. When the prefilter
    window's endpoint lands EXACTLY on 180 (hi == 180.0, constructible
    because the literal-query dlon folds in Python floats), a point
    stored as lon = -180 must still be admitted as a candidate — and
    symmetrically for lo == -180 / lon = +180."""
    import math

    from geo_index_spark.operators.knn import EARTH_RADIUS_M
    from geo_index_spark.operators.search import geo_prefilter_pred
    from pyspark.sql import functions as F

    r, qlat = 250_000.0, 40.0
    # replicate geo_prefilter_pred's dlon so qlon + dlon == 180.0 exactly
    theta = r / EARTH_RADIUS_M
    denom = math.cos(math.radians(qlat)) * math.cos(
        min(math.pi / 2, abs(math.radians(qlat)) + theta)
    )
    dlon = math.degrees(
        2.0 * math.asin(min(1.0, math.sin(theta / 2.0) / math.sqrt(denom)))
    )
    df = spark.createDataFrame(
        [(0, -180.0, qlat), (1, 180.0, qlat), (2, 0.0, qlat)],
        "row_id long, x double, y double",
    )
    qlon_e = 180.0 - dlon
    assert qlon_e + dlon == 180.0  # the exact-endpoint premise
    got = {
        r_.row_id
        for r_ in df.filter(
            geo_prefilter_pred(F.col("x"), F.col("y"), qlon_e, qlat, r)
        ).collect()
    }
    assert got == {0, 1}  # -180 via the alias, +180 via the closed interval
    qlon_w = -180.0 + dlon
    assert qlon_w - dlon == -180.0
    got_w = {
        r_.row_id
        for r_ in df.filter(
            geo_prefilter_pred(F.col("x"), F.col("y"), qlon_w, qlat, r)
        ).collect()
    }
    assert got_w == {0, 1}


def test_haversine_join_exact_180_points(spark):
    """Points stored at EXACTLY +180 and -180 (same meridian, both
    signs) must pair across the representation: brute-force parity plus
    no duplicate pairs (the wrapped segments stay disjoint even with
    the inclusive >=/<= endpoints, ADVICE r3)."""
    import numpy as np
    from geo_index_spark.operators.join import distance_join

    pts = [
        (0, 180.0, 60.0),
        (1, -180.0, 60.0),     # identical location, other sign
        (2, 179.7, 60.2),
        (3, -179.8, 59.9),
        (4, 180.0, 59.5),
        (5, -180.0, 60.5),
        (6, 150.0, 60.0),      # far away
    ]
    df = spark.createDataFrame(pts, "row_id long, x double, y double")
    r_m = 80_000.0
    R = 6378137.0

    def hav(lx, ly, rx, ry):
        h = (
            np.sin(np.radians(ry - ly) / 2) ** 2
            + np.cos(np.radians(ly))
            * np.cos(np.radians(ry))
            * np.sin(np.radians(rx - lx) / 2) ** 2
        )
        return 2.0 * R * float(np.arcsin(np.sqrt(min(1.0, h))))

    rows = distance_join(df, df, r_m, metric="haversine").collect()
    got_list = [(r.left_id, r.right_id) for r in rows]
    got = set(got_list)
    assert len(got_list) == len(got), "duplicate pairs — wrapped segments overlap"
    want = {
        (i, j)
        for i, lx, ly in pts
        for j, rx, ry in pts
        if hav(lx, ly, rx, ry) <= r_m
    }
    assert got == want
    assert (0, 1) in got and (1, 0) in got  # the alias pair itself


def test_haversine_nan_latitude_raises(spark):
    """ADVICE r3: NaN latitudes must hit the domain raise (NaN
    comparisons are false, so without the isnan disjunct they slid past
    |lat| > 90 and silently vanished); NULL latitudes still drop."""
    from geo_index_spark.operators.join import distance_join
    from geo_index_spark.operators.search import within_geo

    df = spark.createDataFrame(
        [(0, 10.0, 45.0), (1, 11.0, float("nan"))], "row_id long, x double, y double"
    )
    with pytest.raises(Exception, match="(?i)lat"):
        distance_join(df, df, 50_000.0, metric="haversine").collect()
    # literal-side NaN: the python-float guard must also be NaN-safe
    with pytest.raises(ValueError, match="qlat"):
        within_geo(df, 10.0, float("nan"), 50_000.0)
    # NULL rows propagate NULL and drop (documented policy)
    df_null = spark.createDataFrame(
        [(0, 10.0, 45.0), (1, 10.001, None)], "row_id long, x double, y double"
    )
    got = {
        (r.left_id, r.right_id)
        for r in distance_join(df_null, df_null, 50_000.0, metric="haversine").collect()
    }
    assert got == {(0, 0)}


def test_knn_join_skewed_density_parity(spark):
    """Round-4 density-aware init_radius: a dense blob next to a sparse
    spread (the city-skew shape that blew up the uniform estimate at
    64M rows) — exact parity with brute force, dense and void lefts."""
    import numpy as np
    from geo_index_spark.operators.knn import knn_join

    rng = np.random.default_rng(41)
    blob = np.column_stack([rng.uniform(0, 1, 400), rng.uniform(0, 1, 400)])
    spread = np.column_stack([rng.uniform(0, 1000, 60), rng.uniform(0, 1000, 60)])
    rpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(np.vstack([blob, spread]))]
    lpts = rpts[::7] + [(999, 500.0, 500.0)]  # mixed lefts + deep-void left
    rdf = spark.createDataFrame(rpts, "row_id long, x double, y double")
    ldf = spark.createDataFrame(lpts, "row_id long, x double, y double")
    got = sorted(
        (r.left_id, r.right_id, round(r.dist, 6)) for r in knn_join(ldf, rdf, 3).collect()
    )
    brute = []
    for lid, lx, ly in lpts:
        ds = sorted((float(np.hypot(rx - lx, ry - ly)), rid) for rid, rx, ry in rpts)
        brute.extend((lid, rid, round(d, 6)) for d, rid in ds[:3])
    assert got == sorted(brute)


def test_knn_join_disjoint_supports(spark):
    """Round-4 per-left adaptive radii: every left sits in a fully EMPTY
    coarse neighborhood (S=0, max growth rounds) — lefts clustered in
    one corner, rights in the far corner. Exact parity with brute
    force; exercises the straggler escalation path end to end."""
    import numpy as np
    from geo_index_spark.operators.knn import knn_join

    rng = np.random.default_rng(42)
    rpts = [
        (i, float(x), float(y))
        for i, (x, y) in enumerate(
            np.column_stack([rng.uniform(990, 1000, 80), rng.uniform(990, 1000, 80)])
        )
    ]
    lpts = [
        (i, float(x), float(y))
        for i, (x, y) in enumerate(
            np.column_stack([rng.uniform(0, 5, 30), rng.uniform(0, 5, 30)])
        )
    ]
    rdf = spark.createDataFrame(rpts, "row_id long, x double, y double")
    ldf = spark.createDataFrame(lpts, "row_id long, x double, y double")
    got = sorted(
        (r.left_id, r.right_id, round(r.dist, 6)) for r in knn_join(ldf, rdf, 4).collect()
    )
    brute = []
    for lid, lx, ly in lpts:
        ds = sorted((float(np.hypot(rx - lx, ry - ly)), rid) for rid, rx, ry in rpts)
        brute.extend((lid, rid, round(d, 6)) for d, rid in ds[:4])
    assert got == sorted(brute)


def test_knn_join_tail_certified_single_round(spark):
    """Round-4 session-3 tail certification: for a small euclidean join
    the coarse-cell prefix sums set every left's radius to a
    certified-complete bound (smallest Chebyshev cell ring with >= k
    rights), so the join must converge in ONE round — max_rounds=1 pins
    that no doubling round survives. Covers the plain case, inclusive
    max_distance capping, and fewer-than-k rights (full-cover certify)."""
    import numpy as np
    from geo_index_spark.operators.knn import knn_join

    rng = np.random.default_rng(43)
    blob = np.column_stack([rng.uniform(0, 1, 300), rng.uniform(0, 1, 300)])
    spread = np.column_stack([rng.uniform(0, 800, 40), rng.uniform(0, 800, 40)])
    rpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(np.vstack([blob, spread]))]
    lpts = rpts[::5] + [(999, 400.0, 400.0)]  # dense + void lefts
    rdf = spark.createDataFrame(rpts, "row_id long, x double, y double")
    ldf = spark.createDataFrame(lpts, "row_id long, x double, y double")

    def brute(max_d=None, k=3):
        out = []
        for lid, lx, ly in lpts:
            ds = sorted((float(np.hypot(rx - lx, ry - ly)), rid) for rid, rx, ry in rpts)
            if max_d is not None:
                ds = [(d, rid) for d, rid in ds if d <= max_d]
            out.extend((lid, rid, round(d, 6)) for d, rid in ds[:k])
        return sorted(out)

    got = sorted(
        (r.left_id, r.right_id, round(r.dist, 6))
        for r in knn_join(ldf, rdf, 3, max_rounds=1).collect()
    )
    assert got == brute()
    got_md = sorted(
        (r.left_id, r.right_id, round(r.dist, 6))
        for r in knn_join(ldf, rdf, 3, max_rounds=1, max_distance=5.0).collect()
    )
    assert got_md == brute(max_d=5.0)
    # fewer than k rights in the whole table -> full-cover certify, one round
    tiny = spark.createDataFrame(rpts[:2], "row_id long, x double, y double")
    got_tiny = sorted(
        (r.left_id, r.right_id, round(r.dist, 6))
        for r in knn_join(ldf, tiny, 3, max_rounds=1).collect()
    )
    brute_tiny = sorted(
        (lid, rid, round(float(np.hypot(rx - lx, ry - ly)), 6))
        for lid, lx, ly in lpts
        for rid, rx, ry in rpts[:2]
    )
    assert got_tiny == brute_tiny


def test_knn_join_haversine_tail_prefilter_dateline(spark, monkeypatch, capfd):
    """Haversine straggler-tail rounds now push the coarse-cell isin()
    prefilter into the cached right scan, with the cellset built from
    the WRAPPED geo_query_window degree segments (VERDICT r5 Next #4 —
    euclidean-only before round 6). init_radius=1 m forces every left
    to fail round 0, so round 1 is a genuine tail round on certified
    radii; the fixture straddles +-180, so a clamped (unwrapped)
    cellset would drop the across-the-line neighbors and break
    exactness. GEO_KNN_DEBUG must show the prefilter engaging with a
    neighborhood-sized cellset (well under the full grid)."""
    import re

    import numpy as np
    from geo_index_spark.operators.knn import knn_join

    rng = np.random.default_rng(9)
    lon = np.concatenate(
        [
            rng.uniform(179.0, 180.0, 80),  # west of the line
            rng.uniform(-180.0, -179.0, 80),  # east of it
            rng.uniform(-30.0, 30.0, 40),  # far-away mass (prefilter must skip)
        ]
    )
    lat = np.concatenate([rng.uniform(48.0, 52.0, 160), rng.uniform(-10.0, 10.0, 40)])
    rpts = [(j, float(x), float(y)) for j, (x, y) in enumerate(zip(lon, lat))]
    rdf = spark.createDataFrame(rpts, "row_id long, x double, y double")
    lpts = [
        (i, float(x), float(y))
        for i, (x, y) in enumerate(
            zip(rng.uniform(179.7, 180.0, 12), rng.uniform(49.0, 51.0, 12))
        )
    ]
    ldf = spark.createDataFrame(lpts, "row_id long, x double, y double")

    monkeypatch.setenv("GEO_KNN_DEBUG", "1")
    got = sorted(
        (r.left_id, r.right_id, round(r.dist, 6))
        for r in knn_join(
            ldf, rdf, 4, metric="haversine", init_radius=1.0
        ).collect()
    )
    err = capfd.readouterr().err
    hits = re.findall(r"tail prefilter: \d+ lefts -> (\d+)/(\d+) coarse cells", err)
    assert hits, f"haversine tail prefilter never engaged:\n{err}"
    # the certified-radius tail round must read a neighborhood, not the grid
    assert any(int(c) < int(total) for c, total in hits)

    R = 6378137.0

    def hav(lx_, ly_, rx_, ry_):
        h = (
            np.sin(np.radians(ry_ - ly_) / 2) ** 2
            + np.cos(np.radians(ly_))
            * np.cos(np.radians(ry_))
            * np.sin(np.radians(rx_ - lx_) / 2) ** 2
        )
        return 2.0 * R * float(np.arcsin(np.sqrt(min(1.0, h))))

    brute = []
    for i, lx_, ly_ in lpts:
        ds = sorted((hav(lx_, ly_, rx_, ry_), j) for j, rx_, ry_ in rpts)
        brute.extend((i, j, round(d, 6)) for d, j in ds[:4])
    assert got == sorted(brute)
    # cross-dateline neighbors must actually appear in the result
    assert any(rpts[j][1] < 0 for _, j, _ in got)


def test_knn_join_certified_upfront_one_round_16m_shape(spark):
    """Round-5 rework: certified ring radii seed round 0 for EVERY left
    (not just the <= 5,000 tail), so a mid-size join in the 16M bench's
    shape — skewed city clusters + uniform spread + deep voids — must
    converge in ONE round. n_left exceeds the old 5,000 tail threshold
    to prove it's the new up-front path. Euclidean AND haversine (the
    haversine bound is the meridian+parallel corner path)."""
    import numpy as np
    from geo_index_spark.operators.knn import knn_join

    rng = np.random.default_rng(47)
    # 16M-bench shape at pytest scale: 80% on city clusters, 20% uniform
    cities = np.column_stack([rng.uniform(-170, 170, 12), rng.uniform(-55, 55, 12)])
    cl = cities[rng.integers(0, 12, 3200)] + rng.normal(0, 0.1, (3200, 2))
    un = np.column_stack([rng.uniform(-180, 180, 800), rng.uniform(-60, 60, 800)])
    rxy = np.vstack([cl, un])
    rpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(rxy)]
    lxy = np.vstack(
        [rxy, rxy[:1500] + 0.013, [[0.0, -59.9], [179.5, 59.9]]]
    )
    lpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(lxy)]
    assert len(lpts) > 5_000
    rdf = spark.createDataFrame(rpts, "row_id long, x double, y double")
    ldf = spark.createDataFrame(lpts, "row_id long, x double, y double")

    lx = np.array([p[1] for p in lpts])[:, None]
    ly = np.array([p[2] for p in lpts])[:, None]
    rx = np.array([p[1] for p in rpts])[None, :]
    ry = np.array([p[2] for p in rpts])[None, :]

    def brute(metric):
        if metric == "euclidean":
            d = np.hypot(lx - rx, ly - ry)
        else:
            R = 6378137.0
            h = (
                np.sin(np.radians(ry - ly) / 2) ** 2
                + np.cos(np.radians(ly)) * np.cos(np.radians(ry))
                * np.sin(np.radians(rx - lx) / 2) ** 2
            )
            d = 2.0 * R * np.arcsin(np.sqrt(np.minimum(1.0, h)))
        out = []
        for i in range(d.shape[0]):
            order = sorted(zip(d[i], range(d.shape[1])))[:3]
            out.extend((lpts[i][0], rid, round(float(dd), 6)) for dd, rid in order)
        return sorted(out)

    for metric in ("euclidean", "haversine"):
        got = sorted(
            (r.left_id, r.right_id, round(r.dist, 6))
            for r in knn_join(ldf, rdf, 3, metric=metric, max_rounds=1).collect()
        )
        assert got == brute(metric), metric


def test_knn_join_two_phase_certified_max_two_rounds(spark):
    """Round-5 rework, big-left path (forced by dropping the up-front
    threshold): round 0 runs density radii, every survivor then gets a
    CERTIFIED radius — kth-candidate distance when k candidates exist,
    prefix-sum ring bound for voids — so round 1 certifies everyone.
    max_rounds=2 pins that no third round can exist, on the adversarial
    shapes: skewed density, disjoint supports (all-void round 0),
    max_distance starvation, haversine incl. dateline wrap."""
    import importlib

    import numpy as np

    K = importlib.import_module("geo_index_spark.operators.knn")

    rng = np.random.default_rng(53)
    blob = np.column_stack([rng.uniform(0, 1, 300), rng.uniform(0, 1, 300)])
    spread = np.column_stack([rng.uniform(0, 900, 50), rng.uniform(0, 900, 50)])
    rpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(np.vstack([blob, spread]))]
    lpts = rpts[::4] + [(999, 450.0, 450.0), (998, 899.0, 2.0)]
    rdf = spark.createDataFrame(rpts, "row_id long, x double, y double")
    ldf = spark.createDataFrame(lpts, "row_id long, x double, y double")

    def brute_euc(lrows, rrows, k, max_d=None):
        out = []
        for lid, lx, ly in lrows:
            ds = sorted((round(float(np.hypot(rx - lx, ry - ly)), 6), rid) for rid, rx, ry in rrows)
            if max_d is not None:
                ds = [(d, rid) for d, rid in ds if d <= max_d]
            out.extend((lid, rid, d) for d, rid in ds[:k])
        return sorted(out)

    old = K.CERT_UPFRONT_MAX_LEFTS
    K.CERT_UPFRONT_MAX_LEFTS = 0  # force the two-phase (big-left) path
    try:
        got = sorted(
            (r.left_id, r.right_id, round(r.dist, 6))
            for r in K.knn_join(ldf, rdf, 3, max_rounds=2).collect()
        )
        assert got == brute_euc(lpts, rpts, 3)
        # max_distance starvation: survivors with < k in-range candidates
        got_md = sorted(
            (r.left_id, r.right_id, round(r.dist, 6))
            for r in K.knn_join(ldf, rdf, 3, max_rounds=2, max_distance=6.0).collect()
        )
        assert got_md == brute_euc(lpts, rpts, 3, max_d=6.0)
        # disjoint supports: EVERY left fails round 0 with zero candidates
        far_l = spark.createDataFrame(
            [(i, float(x), float(y)) for i, (x, y) in enumerate(
                np.column_stack([rng.uniform(0, 4, 25), rng.uniform(0, 4, 25)])
            )],
            "row_id long, x double, y double",
        )
        far_r = spark.createDataFrame(rpts[300:], "row_id long, x double, y double")
        got_far = sorted(
            (r.left_id, r.right_id, round(r.dist, 6))
            for r in K.knn_join(far_l, far_r, 4, max_rounds=2).collect()
        )
        assert got_far == brute_euc(
            [(r.row_id, r.x, r.y) for r in far_l.collect()], rpts[300:], 4
        )
        # haversine incl. dateline wrap: same two-round guarantee
        lon = np.concatenate([rng.uniform(178.5, 180.0, 40), rng.uniform(-180.0, -178.5, 40)])
        lat = rng.uniform(50.0, 60.0, 80)
        gpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(np.column_stack([lon, lat]))]
        gdf = spark.createDataFrame(gpts, "row_id long, x double, y double")
        R = 6378137.0

        def hav(lon1, lat1, lon2, lat2):
            h = (np.sin(np.radians(lat2 - lat1) / 2) ** 2
                 + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2))
                 * np.sin(np.radians(lon2 - lon1) / 2) ** 2)
            return 2.0 * R * np.arcsin(np.sqrt(min(1.0, h)))

        got_h = sorted(
            (r.left_id, r.right_id, round(r.dist, 6))
            for r in K.knn_join(gdf, gdf, 3, metric="haversine", max_rounds=2).collect()
        )
        brute_h = []
        for i, lx_, ly_ in gpts:
            ds = sorted((float(hav(lx_, ly_, rx_, ry_)), j) for j, rx_, ry_ in gpts)
            brute_h.extend((i, j, round(d, 6)) for d, j in ds[:3])
        assert got_h == sorted(brute_h)
        assert any((gpts[a][1] > 0) != (gpts[b][1] > 0) for a, b, _ in got_h)
    finally:
        K.CERT_UPFRONT_MAX_LEFTS = old


def test_knn_join_empty_sides(spark):
    """Empty right -> zero rows for every left; empty left -> zero rows.
    Schema stays (left_id, right_id, dist)."""
    from geo_index_spark.operators.knn import knn_join

    pts = spark.createDataFrame(
        [(0, 1.0, 1.0), (1, 2.0, 2.0)], "row_id long, x double, y double"
    )
    empty = pts.limit(0)
    for ldf, rdf in ((pts, empty), (empty, pts), (empty, empty)):
        out = knn_join(ldf, rdf, 3)
        assert [f.name for f in out.schema.fields] == ["left_id", "right_id", "dist"]
        assert out.count() == 0


def test_sparse_ring_refine_kernel():
    """Numpy unit contract for the tail fine-grid refinement (round 6):
    the returned radius is (a) never looser than r_old, (b) a TRUE
    kth-NN upper bound whenever the counted grid covers the r_old box,
    and boxcnt is the exact number of counted points inside the final
    radius box. Random clustered-plus-void layouts, both metrics."""
    import numpy as np

    from geo_index_spark.operators.knn import EARTH_RADIUS_M, _sparse_ring_refine

    rng = np.random.default_rng(17)
    bounds = (-10.0, -10.0, 10.0, 10.0)
    nc_f, k = 64, 3
    cell_f = (bounds[2] - bounds[0]) / nc_f
    # clustered rights + sprinkle, inside bounds
    pts = np.vstack(
        [
            rng.normal((3.0, 3.0), 0.3, (400, 2)),
            rng.normal((-6.0, 5.0), 0.5, (200, 2)),
            rng.uniform(-9.9, 9.9, (60, 2)),
        ]
    )
    pts = pts[(np.abs(pts[:, 0]) < 10) & (np.abs(pts[:, 1]) < 10)]
    fx = np.clip(((pts[:, 0] - bounds[0]) / cell_f).astype(np.int64), 0, nc_f - 1)
    fy = np.clip(((pts[:, 1] - bounds[1]) / cell_f).astype(np.int64), 0, nc_f - 1)
    key = fx * nc_f + fy
    uk, cnt = np.unique(key, return_counts=True)
    gfx, gfy, gcnt = uk // nc_f, uk % nc_f, cnt

    for metric in ("euclidean", "haversine"):
        # lefts: one inside each cluster, one void corner, one centre
        px = np.array([3.0, -6.0, -9.0, 0.5])
        py = np.array([3.0, 5.0, -9.0, 0.5])
        if metric == "haversine":
            # loose certified start: meridian arc of 8 degrees
            r_old = np.full(4, EARTH_RADIUS_M * np.radians(8.0))
        else:
            r_old = np.full(4, 8.0)
        out, boxcnt = _sparse_ring_refine(
            gfx, gfy, gcnt, nc_f, cell_f, bounds, px, py, r_old, k, metric, 1e-9
        )
        assert (out <= r_old + 1e-12).all()
        for i in range(4):
            if metric == "haversine":
                lat1, lon1 = np.radians(py[i]), np.radians(px[i])
                lat2, lon2 = np.radians(pts[:, 1]), np.radians(pts[:, 0])
                h = (
                    np.sin((lat2 - lat1) / 2) ** 2
                    + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
                )
                d = 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.minimum(1.0, h)))
            else:
                d = np.hypot(pts[:, 0] - px[i], pts[:, 1] - py[i])
            kth = np.sort(d)[k - 1]
            # (b): refined radius still covers the true kth-NN
            assert out[i] >= kth - 1e-9, (metric, i, out[i], kth)
            # (c): boxcnt is exact for the final box (counted grid covers
            # the whole domain here). Recompute the box the kernel used.
            if boxcnt[i] < 2**62:
                if metric == "haversine":
                    hd = np.degrees(out[i] / EARTH_RADIUS_M)
                    hd = hd / max(np.cos(np.radians(py[i])), 1e-6)
                else:
                    hd = out[i]
                jb = int(np.ceil(hd / cell_f)) + 1
                cx = int(np.clip((px[i] - bounds[0]) / cell_f, 0, nc_f - 1))
                cy = int(np.clip((py[i] - bounds[1]) / cell_f, 0, nc_f - 1))
                cheb = np.maximum(np.abs(gfx - cx), np.abs(gfy - cy))
                assert boxcnt[i] == int(gcnt[cheb <= jb].sum())
        # at least the cluster lefts must have shrunk materially and
        # produced finite box counts
        assert (out[:2] < 0.8 * r_old[:2]).all()
        assert (boxcnt[:2] < 2**62).all()


def test_knn_join_right_count_hint(spark):
    """bounds + right_count skip the up-front min/max/count pass; the
    hint only sizes the density grid, so a deliberately 100x-wrong
    value must still produce the exact result."""
    import numpy as np

    from geo_index_spark.operators.knn import knn_join

    rng = np.random.default_rng(29)
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(0, 100, (500, 2)))]
    rdf = spark.createDataFrame(pts, "row_id long, x double, y double")
    ldf = spark.createDataFrame(pts[::7], "row_id long, x double, y double")
    brute = sorted(
        (lid, rid)
        for lid, lx_, ly_ in pts[::7]
        for _, rid in sorted(
            (float(np.hypot(rx_ - lx_, ry_ - ly_)), rid) for rid, rx_, ry_ in pts
        )[:3]
    )
    b = (0.0, 0.0, 100.0, 100.0)
    for hint in (500, 50_000):  # exact and 100x overstated
        got = sorted(
            (r.left_id, r.right_id)
            for r in knn_join(ldf, rdf, 3, bounds=b, right_count=hint).collect()
        )
        assert got == brute, hint
