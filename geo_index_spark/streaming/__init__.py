"""Structured Streaming operators (beyond the reference, which is
batch-only — its resumability contract is served by pipeline/checkpoint;
these cover continuous ingestion of the same spatial/tiling surface)."""

from geo_index_spark.streaming.dedup import stream_exact_dedup  # noqa: F401
from geo_index_spark.streaming.tiles import stream_tile_rollup  # noqa: F401
