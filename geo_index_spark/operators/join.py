"""Spatial intersection-candidate join — the distributed re-expression
of the reference's dual-tree join (reference
src/rtree/traversal.rs:262-370, python/src/rtree/intersection.rs:14-38).

Output contract (X4): DataFrame ``(left_id: long, right_id: long)`` —
every pair whose boxes overlap inclusively; row-set equality is the
parity contract (the reference compares as a set,
src/rtree/traversal.rs:476-482).

Plan (pure Catalyst — zero Python at any scale):

1. Overlay a uniform grid (2^level x 2^level cells) over the combined
   bounds. Each box is assigned to every cell it overlaps via
   ``explode(sequence(cx0, cx1)) x explode(sequence(cy0, cy1))`` —
   JVM-side generators, no UDF.
2. Equi-join on ``cell`` plus the residual inclusive-overlap predicate.
   Catalyst picks BroadcastHashJoin when one exploded side is small
   (or when ``broadcast_side`` forces it) and ShuffledHashJoin /
   SortMergeJoin otherwise; AQE splits skewed cells at runtime
   (dense-city tiles) — set ``salt`` for extra-hot cells.
3. De-dup without a shuffle: a pair meeting in several cells is emitted
   only from its *reference cell* — the cell containing the lower-left
   corner of the boxes' intersection ``(max(l.minx,r.minx),
   max(l.miny,r.miny))``. That corner lies in both boxes, so exactly
   one surviving copy exists; the rule is a cheap row-local predicate
   instead of a ``dropDuplicates`` shuffle.

The dual-tree descent of the reference is an *algorithmic* pruning of
the same candidate set; the grid + residual predicate computes the
identical set with Spark's shuffle machinery doing the pruning. A
local packed-tree probe (localindex.Flatbush.search_batch) remains
available for the broadcast path when one side fits in memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BOX = ("minx", "miny", "maxx", "maxy")


def _cell_coord(v: Column, lo: float, inv_w: float, nc: int) -> Column:
    """Grid cell index of coordinate v, clamped to [0, nc-1]."""
    g = F.floor((v - F.lit(lo)) * F.lit(inv_w))
    return F.greatest(F.lit(0), F.least(F.lit(nc - 1), g)).cast("long")


def _with_cells(
    df: DataFrame,
    id_col: str,
    bounds: tuple[float, float, float, float],
    nc: int,
    cols: tuple[str, str, str, str],
    prefix: str,
) -> DataFrame:
    lox, loy, hix, hiy = bounds
    inv_wx = nc / (hix - lox) if hix > lox else 0.0
    inv_wy = nc / (hiy - loy) if hiy > loy else 0.0
    mnx, mny, mxx, mxy = (F.col(c) for c in cols)
    out = df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        mnx.alias(f"{prefix}_minx"),
        mny.alias(f"{prefix}_miny"),
        mxx.alias(f"{prefix}_maxx"),
        mxy.alias(f"{prefix}_maxy"),
        _cell_coord(mnx, lox, inv_wx, nc).alias("cx0"),
        _cell_coord(mxx, lox, inv_wx, nc).alias("cx1"),
        _cell_coord(mny, loy, inv_wy, nc).alias("cy0"),
        _cell_coord(mxy, loy, inv_wy, nc).alias("cy1"),
    )
    out = out.select(
        "*",
        F.explode(F.sequence(F.col("cx0"), F.col("cx1"))).alias("cx"),
    ).select(
        "*",
        F.explode(F.sequence(F.col("cy0"), F.col("cy1"))).alias("cy"),
    )
    return out.withColumn("cell", F.col("cx") * F.lit(nc) + F.col("cy")).drop(
        "cx0", "cx1", "cy0", "cy1"
    )


def spatial_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "row_id",
    right_id: str = "row_id",
    left_cols: tuple[str, str, str, str] = BOX,
    right_cols: tuple[str, str, str, str] = BOX,
    bounds: tuple[float, float, float, float] | None = None,
    grid_level: int = 6,
    broadcast_side: str | None = None,  # 'left' | 'right' | None (let Catalyst/AQE pick)
) -> DataFrame:
    """All (left_id, right_id) pairs with inclusively-overlapping boxes."""
    from geo_index_spark.operators.partitioning import global_bounds

    if bounds is None:
        lb = global_bounds(left, left_cols)
        rb = global_bounds(right, right_cols)
        bounds = (
            min(lb[0], rb[0]),
            min(lb[1], rb[1]),
            max(lb[2], rb[2]),
            max(lb[3], rb[3]),
        )
    nc = 1 << grid_level
    lox, loy, hix, hiy = (float(b) for b in bounds)
    inv_wx = nc / (hix - lox) if hix > lox else 0.0
    inv_wy = nc / (hiy - loy) if hiy > loy else 0.0

    le = _with_cells(left, left_id, bounds, nc, left_cols, "l")
    re = _with_cells(right, right_id, bounds, nc, right_cols, "r")
    if broadcast_side == "left":
        le = F.broadcast(le)
    elif broadcast_side == "right":
        re = F.broadcast(re)

    le = le.withColumnRenamed("cx", "l_cx").withColumnRenamed("cy", "l_cy")
    re = re.drop("cx", "cy")

    overlap = (
        (F.col("l_minx") <= F.col("r_maxx"))
        & (F.col("l_maxx") >= F.col("r_minx"))
        & (F.col("l_miny") <= F.col("r_maxy"))
        & (F.col("l_maxy") >= F.col("r_miny"))
    )
    # reference-cell rule: the joined cell must contain the lower-left
    # corner of the intersection of the two boxes
    ref_cx = _cell_coord(F.greatest(F.col("l_minx"), F.col("r_minx")), lox, inv_wx, nc)
    ref_cy = _cell_coord(F.greatest(F.col("l_miny"), F.col("r_miny")), loy, inv_wy, nc)
    dedup = (F.col("l_cx") == ref_cx) & (F.col("l_cy") == ref_cy)

    joined = le.join(re, on="cell", how="inner").filter(overlap & dedup)
    return joined.select("l_id", "r_id").withColumnsRenamed(
        {"l_id": "left_id", "r_id": "right_id"}
    )
