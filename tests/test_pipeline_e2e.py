"""End-to-end north-rule pipeline: pages -> extraction (byte-identical,
checkpointed) -> catalog snapshots -> indexes -> tiles; crash-resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geo_index_spark.operators.localbuild import search_partition_indexes
from geo_index_spark.pipeline.catalog import ParquetSnapshotCatalog
from geo_index_spark.pipeline.webgeo import run_webgeo_pipeline
from geo_index_spark.webtext.generate import web_pages_df


N_PAGES = 300


pytestmark = pytest.mark.slow  # full e2e: run with -m slow

def test_pipeline_end_to_end(spark, tmp_path):
    pages = web_pages_df(spark, N_PAGES, num_partitions=4)
    res = run_webgeo_pipeline(spark, pages, str(tmp_path), num_partitions=4)
    assert res.pages == N_PAGES
    assert res.points == N_PAGES  # every synthetic page is geotagged
    assert 1 <= res.index_partitions <= 4

    cat = ParquetSnapshotCatalog(str(tmp_path) + "/catalog")
    # extraction byte-identity persisted through the checkpointed stage
    ext = spark.read.parquet(str(tmp_path) + "/stages/extract/data/bucket=*")
    joined = ext.join(pages.select("url", "text"), "url")
    assert joined.filter(F.col("text_extracted") != F.col("text")).count() == 0

    # the committed index answers bbox queries == plain filter on points
    idx = cat.read(spark, "point_index")
    pts = cat.read(spark, "points")
    got = {r.row_id for r in search_partition_indexes(idx, -50, 0, 50, 60).collect()}
    want = {
        r.row_id
        for r in pts.filter(
            (F.col("x") >= -50) & (F.col("x") <= 50) & (F.col("y") >= 0) & (F.col("y") <= 60)
        ).collect()
    }
    assert got == want

    # tiles account for every point
    tiles = cat.read(spark, "tiles")
    assert tiles.agg(F.sum("n_pages")).first()[0] == N_PAGES


def test_pipeline_resumes_after_crash(spark, tmp_path):
    pages = web_pages_df(spark, N_PAGES, num_partitions=4)
    with pytest.raises(RuntimeError, match="injected"):
        run_webgeo_pipeline(
            spark, pages, str(tmp_path), num_partitions=4, fail_extract_on_bucket=3
        )
    # resume: completes, and only the uncommitted buckets re-ran
    res = run_webgeo_pipeline(spark, pages, str(tmp_path), num_partitions=4)
    assert res.points == N_PAGES
    lineage = spark.read.parquet(str(tmp_path) + "/stages/extract/_lineage")
    committed = lineage.filter(F.col("status") == "COMMITTED")
    assert committed.select("bucket").distinct().count() == 8
    # two distinct run_ids prove the second run picked up mid-job
    assert committed.select("run_id").distinct().count() == 2
