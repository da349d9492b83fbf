"""Exact point-in-polygon refinement + raster<->vector zonal join
(north-rule surface; the reference stops at bbox candidates and
delegates exact tests to the caller — reference
python/python/geoindex_rs/rtree.pyi:56-63).

Two-phase plan (SURVEY.md §4 custom rule 4):
  1. *candidates*: bbox-overlap join of points vs polygon bboxes — pure
     Catalyst (operators/join.spatial_join or a broadcast filter).
  2. *refine*: vectorized even-odd ray-cast over Arrow batches
     (numpy over all candidate pairs grouped by polygon — no per-row
     Python). Boundary semantics: even-odd crossing with the
     half-open edge rule (a point exactly on a horizontal-crossing
     vertex counts once); points on a right/top edge may be excluded —
     deterministic, documented, and pinned by goldens.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def ray_cast_np(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray cast of many points against one closed ring
    ((k, 2) array, last vertex may equal first). Vectorized over
    points x edges."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) >= 2 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    px = np.asarray(px, np.float64)[:, None]
    py = np.asarray(py, np.float64)[:, None]
    cond = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xin = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    crossings = cond & (px < xin)
    return (crossings.sum(axis=1) % 2).astype(bool)


def point_in_polygon(
    points: DataFrame,
    polygons: DataFrame,
    point_id: str = "row_id",
    poly_id: str = "poly_id",
    x_col: str = "x",
    y_col: str = "y",
    vertices_col: str = "vertices",
    grid_level: int = 5,
) -> DataFrame:
    """(point_id, poly_id) pairs where the point lies inside the polygon.

    Phase 1 joins points (as degenerate boxes) to polygon bboxes via the
    grid candidate join; phase 2 refines with the ray-cast in an Arrow
    pandas UDF evaluated against broadcast polygon rings.

    SIZE LIMIT: the rings are collected to the driver and broadcast —
    right for zone/boundary tables (countries, admin areas, tiles), a
    real ceiling at millions of polygons or very high vertex counts.
    Past that, use :func:`point_in_polygon_join`, which keeps the edges
    distributed (pure-Catalyst crossing-count join, no collect)."""
    from geo_index_spark.operators.join import spatial_join

    pts = points.select(
        F.col(point_id).alias("pt_id"),
        F.col(x_col).alias("minx"),
        F.col(y_col).alias("miny"),
        F.col(x_col).alias("maxx"),
        F.col(y_col).alias("maxy"),
        F.col(x_col).alias("px"),
        F.col(y_col).alias("py"),
    )
    polys = polygons.select(
        F.col(poly_id).alias("pg_id"), "minx", "miny", "maxx", "maxy"
    )
    cand = spatial_join(
        pts,
        polys,
        left_id="pt_id",
        right_id="pg_id",
        grid_level=grid_level,
    ).withColumnsRenamed({"left_id": "pt_id", "right_id": "pg_id"})

    cand = cand.join(points.select(F.col(point_id).alias("pt_id"), F.col(x_col).alias("px"), F.col(y_col).alias("py")), "pt_id")

    # broadcast the polygon rings to executors once (polygon dims are
    # small relative to points at web scale)
    rings = {
        r["pg"]: np.array(r["v"], dtype=np.float64)
        for r in polygons.select(
            F.col(poly_id).alias("pg"), F.col(vertices_col).alias("v")
        ).collect()
    }
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(rings)

    @F.pandas_udf(BooleanType())
    def inside(pg_id: pd.Series, px: pd.Series, py: pd.Series) -> pd.Series:
        out = np.zeros(len(pg_id), dtype=bool)
        pgv = pg_id.to_numpy()
        pxv = px.to_numpy()
        pyv = py.to_numpy()
        for pg in np.unique(pgv):
            m = pgv == pg
            ring = bc.value.get(pg)
            if ring is not None:
                out[m] = ray_cast_np(pxv[m], pyv[m], ring)
        return pd.Series(out)

    return (
        cand.filter(inside(F.col("pg_id"), F.col("px"), F.col("py")))
        .select(F.col("pt_id").alias(point_id), F.col("pg_id").alias(poly_id))
    )


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    point_id: str = "row_id",
    poly_id: str = "poly_id",
    x_col: str = "x",
    y_col: str = "y",
    vertices_col: str = "vertices",
    grid_level: int = 5,
) -> DataFrame:
    """Fully distributed variant of :func:`point_in_polygon` — no
    driver collect, no broadcast, pure Catalyst: the million-polygon /
    100 TB path.

    The ray cast becomes relational algebra: explode each ring into an
    EDGE table (posexplode over the vertex array — a generator, no
    shuffle), equi-join bbox candidates to edges on the polygon id, and
    keep pairs whose crossing count is odd (one groupBy on the pair
    key). Same even-odd semantics and the same IEEE expression as
    ``ray_cast_np`` / the SQL oracle, so all three agree exactly.

    Cost model vs the broadcast variant: one extra shuffle of
    |candidates| x avg_edges rows. Worth it exactly when the ring set
    cannot be broadcast."""
    from geo_index_spark.operators.join import spatial_join

    pts = points.select(
        F.col(point_id).alias("pt_id"),
        F.col(x_col).alias("minx"),
        F.col(y_col).alias("miny"),
        F.col(x_col).alias("maxx"),
        F.col(y_col).alias("maxy"),
    )
    polys_bb = polygons.select(
        F.col(poly_id).alias("pg_id"), "minx", "miny", "maxx", "maxy"
    )
    cand = spatial_join(
        pts, polys_bb, left_id="pt_id", right_id="pg_id", grid_level=grid_level
    ).withColumnsRenamed({"left_id": "pt_id", "right_id": "pg_id"})
    cand = cand.join(
        points.select(
            F.col(point_id).alias("pt_id"),
            F.col(x_col).alias("px"),
            F.col(y_col).alias("py"),
        ),
        "pt_id",
    )

    # ring -> edge table; np.roll closure: drop a duplicated closing
    # vertex, then edge i = (v[i], v[(i+1) % n])
    v = F.col(vertices_col)
    ring = F.when(
        (F.size(v) >= 2) & (F.element_at(v, 1) == F.element_at(v, -1)),
        F.slice(v, 1, F.size(v) - 1),
    ).otherwise(v)
    edges = (
        polygons.select(F.col(poly_id).alias("pg_id"), ring.alias("r"))
        .select(
            "pg_id",
            F.posexplode(
                F.zip_with(
                    F.col("r"),
                    F.concat(F.slice(F.col("r"), 2, F.size("r") - 1), F.slice(F.col("r"), 1, 1)),
                    lambda a, b: F.struct(
                        a[0].alias("x1"), a[1].alias("y1"), b[0].alias("x2"), b[1].alias("y2")
                    ),
                )
            ).alias("i", "e"),
        )
        .select(
            "pg_id",
            F.col("e.x1").alias("x1"),
            F.col("e.y1").alias("y1"),
            F.col("e.x2").alias("x2"),
            F.col("e.y2").alias("y2"),
        )
    )

    x1, y1, x2, y2 = (F.col(c) for c in ("x1", "y1", "x2", "y2"))
    px, py = F.col("px"), F.col("py")
    # same crossing test + expression order as ray_cast_np; the division
    # is nested under the (y1 > py) != (y2 > py) branch (which implies
    # y1 != y2) exactly like the oracle's nested CASE, so horizontal
    # edges never reach it even under ANSI mode / predicate reordering
    xin = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    crossing = F.when(
        (y1 > py) != (y2 > py),
        F.when(px < xin, F.lit(1)).otherwise(F.lit(0)),
    ).otherwise(F.lit(0))
    joined = cand.join(edges, "pg_id")
    return (
        joined.groupBy("pt_id", "pg_id")
        .agg(F.sum(crossing).alias("c"))
        .filter(F.col("c") % 2 == 1)
        .select(F.col("pt_id").alias(point_id), F.col("pg_id").alias(poly_id))
    )


def point_in_polygon_sql(
    polygons: list[tuple[int, list[list[float]]]],
    points_sql: str,
    point_id: str = "event_id",
    poly_id: str = "poly_id",
) -> str:
    """DuckDB mirror of :func:`point_in_polygon` for LITERAL polygon
    rings: the identical even-odd ray cast — same edge decomposition
    (np.roll closure), same crossing test ``(y1 > py) != (y2 > py) AND
    px < (x2-x1)*(py-y1)/(y2-y1) + x1`` in the same IEEE-double
    expression order — as a per-(point, edge) unnest + crossing-count
    mod 2. The nested CASE guards the division: the outer WHEN is true
    only when y1 != y2. ``points_sql`` must yield ({point_id}, x, y)."""
    edge_rows = []
    for pid, ring in polygons:
        r = list(ring)
        if len(r) >= 2 and r[0] == r[-1]:
            r = r[:-1]
        for i in range(len(r)):
            x1, y1 = r[i]
            x2, y2 = r[(i + 1) % len(r)]
            edge_rows.append(
                f"({pid}, {float(x1)!r}, {float(y1)!r}, {float(x2)!r}, {float(y2)!r})"
            )
    edges = ", ".join(edge_rows)
    return f"""
    WITH pts AS ({points_sql}),
    edges(pg, x1, y1, x2, y2) AS (VALUES {edges}),
    crossings AS (
      SELECT p.{point_id}, e.pg,
        CASE WHEN (e.y1 > p.y) <> (e.y2 > p.y)
             THEN CASE WHEN p.x < (e.x2 - e.x1) * (p.y - e.y1) / (e.y2 - e.y1) + e.x1
                       THEN 1 ELSE 0 END
             ELSE 0 END AS c
      FROM pts p CROSS JOIN edges e
    )
    SELECT {point_id}, pg::BIGINT AS {poly_id}
    FROM crossings GROUP BY {point_id}, pg HAVING sum(c) % 2 = 1
    """


def zonal_stats(
    raster: DataFrame,
    polygons: DataFrame,
    value_col: str = "value",
    poly_id: str = "poly_id",
    cell_id: str = "cell_id",
    grid_level: int = 5,
) -> DataFrame:
    """Raster<->vector zonal join: raster cells (boxes) are candidate-
    joined to polygon bboxes, refined by cell-center-in-polygon, then
    aggregated per zone — ``groupBy(poly_id).agg(count/sum/avg/min/max)``
    (all map-side combinable)."""
    cx = (F.col("minx") + F.col("maxx")) / 2
    cy = (F.col("miny") + F.col("maxy")) / 2
    centers = raster.select(
        F.col(cell_id).alias("row_id"), cx.alias("x"), cy.alias("y")
    )
    hits = point_in_polygon(
        centers, polygons, point_id="row_id", poly_id=poly_id, grid_level=grid_level
    ).withColumnRenamed("row_id", cell_id)
    joined = hits.join(raster.select(cell_id, value_col), cell_id)
    return joined.groupBy(poly_id).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(value_col).alias("sum_value"),
        F.avg(value_col).alias("avg_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
