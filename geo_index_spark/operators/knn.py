"""k-nearest-neighbors with geo-index ordering semantics.

Reference contract (src/rtree/trait.rs:198-302): results ascend by
distance; ``max_distance`` prunes (inclusive); ``max_results`` caps.
Tie order in the reference is heap-internal, so we pin the deterministic
tiebreak ``(dist, row_id)`` (SURVEY.md §2.3.3).

Spark plan: distance is a pure Catalyst expression (hypot / haversine
built from JVM math functions — no Python), then
``orderBy(dist, row_id).limit(k)`` which Catalyst executes as
``TakeOrderedAndProject``: each partition computes a local top-k
map-side and only k rows per partition reach the driver-side merge.
That is exactly the reference's best-first "local candidates, global
merge" shape, and it scales linearly with partition count. On
Hilbert-clustered storage, an optional ``prefilter_radius`` turns the
scan into a pushed-down bbox filter first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6378137.0  # reference src/rtree/distance.rs (WGS84 semi-major)


def euclidean_dist_col(x: Column, y: Column, qx: float, qy: float) -> Column:
    dx = x - F.lit(float(qx))
    dy = y - F.lit(float(qy))
    return F.sqrt(dx * dx + dy * dy)


def haversine_dist_col(lon: Column, lat: Column, qlon: float, qlat: float) -> Column:
    """Great-circle meters, same formula as reference
    src/rtree/distance.rs:84-114 — all JVM built-ins."""
    lat1 = F.radians(F.lit(float(qlat)))
    lat2 = F.radians(lat)
    dlat = F.radians(lat - F.lit(float(qlat)))
    dlon = F.radians(lon - F.lit(float(qlon)))
    h = F.pow(F.sin(dlat / 2), 2) + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin(dlon / 2), 2)
    h = F.least(h, F.lit(1.0))
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(h))


def box_distance_col(
    minx: Column, miny: Column, maxx: Column, maxy: Column, qx: float, qy: float
) -> Column:
    """Euclidean distance from point (qx, qy) to a box, 0 inside —
    the reference's axis_dist composition (src/rtree/trait.rs:570-579)."""
    dx = F.greatest(F.lit(0.0), F.greatest(minx - F.lit(float(qx)), F.lit(float(qx)) - maxx))
    dy = F.greatest(F.lit(0.0), F.greatest(miny - F.lit(float(qy)), F.lit(float(qy)) - maxy))
    return F.sqrt(dx * dx + dy * dy)


def knn_boxes(
    df: DataFrame,
    qx: float,
    qy: float,
    k: int,
    max_distance: float | None = None,
    cols: tuple[str, str, str, str] = ("minx", "miny", "maxx", "maxy"),
    id_col: str = "row_id",
) -> DataFrame:
    """Q3/Q5 over a BOX table: top-k boxes by point-to-box distance
    (the reference's native kNN operates on leaf boxes; geometry
    queries refine the same lower bound, src/rtree/trait.rs:397-500)."""
    mnx, mny, mxx, mxy = (F.col(c) for c in cols)
    out = df.withColumn("dist", box_distance_col(mnx, mny, mxx, mxy, qx, qy))
    if max_distance is not None:
        out = out.filter(F.col("dist") <= F.lit(float(max_distance)))
    return out.orderBy(F.col("dist").asc(), F.col(id_col).asc()).limit(int(k))


def knn(
    df: DataFrame,
    qx: float,
    qy: float,
    k: int,
    metric: str = "euclidean",
    max_distance: float | None = None,
    cols: tuple[str, str] = ("x", "y"),
    id_col: str = "row_id",
    prefilter_radius: float | None = None,
) -> DataFrame:
    """Top-k rows by (distance, id). Returns input columns + ``dist``."""
    x, y = (F.col(c) for c in cols)
    if metric == "euclidean":
        d = euclidean_dist_col(x, y, qx, qy)
    elif metric == "haversine":
        d = haversine_dist_col(x, y, qx, qy)
    else:
        raise ValueError(f"unknown metric {metric}")
    out = df
    radius = prefilter_radius
    if max_distance is not None and metric == "euclidean":
        radius = max_distance if radius is None else min(radius, max_distance)
    if radius is not None:
        # pushed-down bbox window — prunes Hilbert-clustered row groups
        out = out.filter(
            (x >= F.lit(qx - radius))
            & (x <= F.lit(qx + radius))
            & (y >= F.lit(qy - radius))
            & (y <= F.lit(qy + radius))
        )
    out = out.withColumn("dist", d)
    if max_distance is not None:
        out = out.filter(F.col("dist") <= F.lit(float(max_distance)))
    return out.orderBy(F.col("dist").asc(), F.col(id_col).asc()).limit(int(k))
