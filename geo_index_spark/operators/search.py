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
