"""Streaming tile rollup: continuous geotagged-page ingestion ->
watermarked windowed counts per quad cell.

The tiling kernel is the SAME Catalyst expression as batch
(operators/tiling.quad_cell_col), so stream and batch rollups agree
bit-for-bit on identical input — tested via the file source with
``trigger(availableNow)`` against the batch aggregate.

Late data: event-time watermark bounds state; at 100 TB-scale ingest
the state per trigger is O(active windows x occupied cells), and the
sink is an idempotent upsert keyed (window, cell_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_index_spark.operators.tiling import LONLAT_BOUNDS, quad_cell_col


def stream_tile_rollup(
    stream_df: DataFrame,
    ts_col: str = "warc_ts",
    x_col: str = "x",
    y_col: str = "y",
    level: int = 8,
    bounds: tuple[float, float, float, float] = LONLAT_BOUNDS,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    cell = quad_cell_col(F.col(x_col), F.col(y_col), level, bounds)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), cell.alias("cell_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cell_id",
            "n",
        )
    )
