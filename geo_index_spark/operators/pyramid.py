"""Tile pyramid — multi-level rollup that reuses finer aggregates.

A naive L-level pyramid scans the fact table L times. Because our quad
cell ids are Morton codes with a level tag (operators/tiling.py), the
parent aggregate is derivable from the child AGGREGATE table:
``parent_cell = retag(level-1, morton >> 2)`` and counts/sums add.
So the pyramid is: one scan -> finest-level groupBy -> (L-1) tiny
rollups over the aggregate (each orders of magnitude smaller than the
fact table). At 100 TB this is the difference between L full scans and
one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_index_spark.operators.tiling import LONLAT_BOUNDS, parent_cell_col, quad_cell_col


def tile_pyramid(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    min_level: int = 4,
    max_level: int = 8,
    bounds: tuple[float, float, float, float] = LONLAT_BOUNDS,
    value_col: str | None = None,
) -> DataFrame:
    """(level, cell_id, n[, sum_value]) for every level in
    [min_level, max_level] — fact table scanned once."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    finest = (
        df.groupBy(
            quad_cell_col(F.col(x_col), F.col(y_col), max_level, bounds).alias("cell_id")
        )
        .agg(*aggs)
        .withColumn("level", F.lit(max_level))
    )
    levels = [finest]
    cur = finest
    for lvl in range(max_level - 1, min_level - 1, -1):
        rollup_aggs = [F.sum("n").alias("n")]
        if value_col:
            rollup_aggs.append(F.sum("sum_value").alias("sum_value"))
        cur = (
            cur.groupBy(parent_cell_col(F.col("cell_id")).alias("cell_id"))
            .agg(*rollup_aggs)
            .withColumn("level", F.lit(lvl))
        )
        levels.append(cur)
    out = levels[0]
    for l in levels[1:]:
        out = out.unionByName(l)
    cols = ["level", "cell_id", "n"] + (["sum_value"] if value_col else [])
    return out.select(*cols)
