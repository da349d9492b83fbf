"""Point/box query operators — Catalyst-native filters.

The reference's tree traversals (Q1/Q7/Q8) become plain column
predicates: Catalyst pushes them to the parquet scan, and because data
is Hilbert-clustered (operators/partitioning.py) the parquet min/max
stats make the scan skip almost every row group — the distributed
equivalent of R-tree node pruning. ``.explain`` shows ``PushedFilters``
on all of these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bbox_search(
    df: DataFrame,
    min_x: float,
    min_y: float,
    max_x: float,
    max_y: float,
    cols: tuple[str, str, str, str] = ("minx", "miny", "maxx", "maxy"),
) -> DataFrame:
    """Inclusive bbox-overlap search (reference src/rtree/trait.rs:113-165:
    disjoint iff ``qmaxx < minx || qmaxy < miny || qminx > maxx ||
    qminy > maxy``; touching edges match)."""
    mnx, mny, mxx, mxy = (F.col(c) for c in cols)
    return df.filter(
        (mnx <= F.lit(float(max_x)))
        & (mxx >= F.lit(float(min_x)))
        & (mny <= F.lit(float(max_y)))
        & (mxy >= F.lit(float(min_y)))
    )


def kd_range(
    df: DataFrame,
    min_x: float,
    min_y: float,
    max_x: float,
    max_y: float,
    cols: tuple[str, str] = ("x", "y"),
) -> DataFrame:
    """Inclusive point-in-rect (reference src/kdtree/trait.rs:37-97)."""
    x, y = (F.col(c) for c in cols)
    return df.filter(
        (x >= F.lit(float(min_x)))
        & (x <= F.lit(float(max_x)))
        & (y >= F.lit(float(min_y)))
        & (y <= F.lit(float(max_y)))
    )


def within(
    df: DataFrame,
    qx: float,
    qy: float,
    r: float,
    cols: tuple[str, str] = ("x", "y"),
) -> DataFrame:
    """Radius query, inclusive ``dist^2 <= r^2`` (reference
    src/kdtree/trait.rs:118-174). The bbox pre-filter is what reaches
    the parquet scan (pushable range predicates); the exact circle test
    is the cheap residual."""
    x, y = (F.col(c) for c in cols)
    qx, qy, r = float(qx), float(qy), float(r)
    bbox = (
        (x >= F.lit(qx - r))
        & (x <= F.lit(qx + r))
        & (y >= F.lit(qy - r))
        & (y <= F.lit(qy + r))
    )
    circle = (x - F.lit(qx)) * (x - F.lit(qx)) + (y - F.lit(qy)) * (y - F.lit(qy)) <= F.lit(r * r)
    return df.filter(bbox & circle)


def within_geo(
    df: DataFrame,
    qlon: float,
    qlat: float,
    radius_m: float,
    cols: tuple[str, str] = ("x", "y"),
) -> DataFrame:
    """Q8 with the haversine metric: all points within ``radius_m``
    METERS of (qlon, qlat) on the WGS84 sphere (inclusive), the radius
    twin of ``knn(metric="haversine")``.

    The prefilter is the same provably-containing degree box as
    operators/join.haversine_box_expand, but the query point is a
    LITERAL, so dlat/dlon fold to Python floats and the box is pushable
    range predicates on the scan (Hilbert-clustered storage prunes row
    groups). A window crossing +-180 becomes an OR of the two wrapped
    lon ranges (still pushable); the exact haversine test is the
    residual. Requires |qlat| <= 90."""
    from geo_index_spark.operators.knn import haversine_dist_col

    x, y = (F.col(c) for c in cols)
    qlon, qlat, r = float(qlon), float(qlat), float(radius_m)
    pred = geo_prefilter_pred(x, y, qlon, qlat, r)
    d = haversine_dist_col(x, y, qlon, qlat)
    return df.filter(pred & (d <= F.lit(r)))


def geo_query_window(
    qlon: float, qlat: float, radius_m: float
) -> tuple[float, list[tuple[float, float]]]:
    """(dlat_deg, disjoint lon segments) of the smallest degree window
    provably containing the haversine ``radius_m`` ball around literal
    (qlon, qlat) — the literal-query twin of join.haversine_box_expand.
    A window crossing ±180 splits into two wrapped segments; an
    endpoint landing EXACTLY on ±180 adds a degenerate alias segment
    for points stored as the other sign of the same meridian (ADVICE
    r3 — sanitize_lonlat canonicalizes 180 -> -180, but unsanitized
    inputs may carry either sign, and the dlon bound is tight at the
    band's min-cos latitude). Segments are pairwise disjoint, so a
    point matches at most one. Shared by :func:`geo_prefilter_pred`
    (scan path) and localbuild.within_geo_partition_indexes (blob
    path)."""
    import math

    from geo_index_spark.operators.knn import EARTH_RADIUS_M

    if not (abs(float(qlat)) <= 90.0):  # NaN-safe: not(NaN <= 90) is True
        raise ValueError("geo prefilter requires |qlat| <= 90")
    qlon, qlat, r = float(qlon), float(qlat), float(radius_m)
    theta = r / EARTH_RADIUS_M
    dlat = math.degrees(theta)
    if abs(qlat) + dlat >= 90.0:
        dlon = 180.0
    else:
        denom = math.cos(math.radians(qlat)) * math.cos(
            min(math.pi / 2, abs(math.radians(qlat)) + theta)
        )
        dlon = (
            180.0
            if denom <= 0.0
            else math.degrees(
                2.0 * math.asin(min(1.0, math.sin(theta / 2.0) / math.sqrt(denom)))
            )
        )
    lo, hi = qlon - dlon, qlon + dlon
    if dlon >= 180.0:
        segs = [(-180.0, 180.0)]
    elif lo < -180.0:  # wraps west: [-180, hi] U [lo + 360, 180]
        segs = [(-180.0, hi), (lo + 360.0, 180.0)]
    elif hi > 180.0:  # wraps east: [lo, 180] U [-180, hi - 360]
        segs = [(lo, 180.0), (-180.0, hi - 360.0)]
    else:
        segs = [(lo, hi)]
        if hi == 180.0:
            segs.append((-180.0, -180.0))  # ±180 alias, degenerate
        if lo == -180.0:
            segs.append((180.0, 180.0))
    return dlat, segs


def geo_prefilter_pred(x, y, qlon: float, qlat: float, radius_m: float):
    """Pushable degree-box predicate provably containing the haversine
    ``radius_m`` ball around literal (qlon, qlat) — the OR of the
    :func:`geo_query_window` segments (still pushable range predicates).
    Shared by :func:`within_geo` and ``knn(metric="haversine",
    max_distance=...)``."""
    dlat, segs = geo_query_window(qlon, qlat, radius_m)
    qlat = float(qlat)
    lat_pred = (y >= F.lit(qlat - dlat)) & (y <= F.lit(qlat + dlat))
    lon_pred = None
    for lo, hi in segs:
        p = (x >= F.lit(lo)) & (x <= F.lit(hi))
        lon_pred = p if lon_pred is None else (lon_pred | p)
    return lat_pred & lon_pred
