"""Checkpoint / lineage / metrics — the north-rule resumability layer."""

from geo_index_spark.pipeline.checkpoint import CheckpointedPipeline, StageResult  # noqa: F401
