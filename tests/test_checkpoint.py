"""Resumability: per-bucket lineage, idempotent re-runs, mid-job crash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geo_index_spark.pipeline import CheckpointedPipeline


@pytest.fixture()
def pts(spark):
    return spark.createDataFrame(
        [(f"u{i}", float(i), float(i % 7)) for i in range(200)],
        "url string, x double, y double",
    )


def test_stage_runs_and_reads_back(spark, pts, tmp_path):
    cp = CheckpointedPipeline(spark, str(tmp_path), n_buckets=4)
    res = cp.run_stage("double_x", pts, lambda d: d.withColumn("x2", F.col("x") * 2), "url")
    assert res.buckets_run == 4 and res.buckets_skipped == 0
    assert res.rows_written == 200
    back = cp.read_stage("double_x")
    assert back.count() == 200
    assert back.filter(F.col("x2") != F.col("x") * 2).count() == 0


def test_rerun_skips_committed(spark, pts, tmp_path):
    cp = CheckpointedPipeline(spark, str(tmp_path), n_buckets=4)
    cp.run_stage("s", pts, lambda d: d, "url")
    cp2 = CheckpointedPipeline(spark, str(tmp_path), n_buckets=4)
    res2 = cp2.run_stage("s", pts, lambda d: d, "url")
    assert res2.buckets_run == 0 and res2.buckets_skipped == 4
    assert cp2.read_stage("s").count() == 200


def test_resume_after_midjob_crash(spark, pts, tmp_path):
    cp = CheckpointedPipeline(spark, str(tmp_path), n_buckets=4)
    calls = {"n": 0}

    def failing(d):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated executor loss")
        return d

    with pytest.raises(RuntimeError):
        cp.run_stage("s", pts, failing, "url")
    # resume: only the 2 uncommitted buckets rerun
    cp2 = CheckpointedPipeline(spark, str(tmp_path), n_buckets=4)
    res = cp2.run_stage("s", pts, lambda d: d, "url")
    assert res.buckets_skipped == 2 and res.buckets_run == 2
    assert cp2.read_stage("s").count() == 200
    # lineage has metrics rows
    m = cp2.metrics("s")
    assert m.filter(F.col("status") == "COMMITTED").count() == 4


@pytest.mark.slow
def test_torn_checkpoint_resume(spark, pts, tmp_path):
    """Crash DURING commit (round-5 verdict #8): three torn states a
    kill -9 can leave behind, each must resume to the exact full
    result. (1) bucket data fully written but its lineage row never
    landed -> the bucket is NOT committed and reruns (idempotent
    overwrite); (2) a torn (garbage-bytes) parquet file inside the
    lineage log -> resume must skip it and still honor the commits
    that finished; (3) garbage data files in an uncommitted bucket
    dir -> the rerun's overwrite replaces them."""
    import pyarrow.parquet as pq

    cp = CheckpointedPipeline(spark, str(tmp_path), n_buckets=4)
    cp.run_stage("s", pts, lambda d: d.withColumn("x2", F.col("x") * 2), "url")
    lineage_dir = tmp_path / "s" / "_lineage"

    # (1) un-commit one bucket: delete exactly its lineage file(s)
    victim = None
    for f in sorted(lineage_dir.rglob("*.parquet")):
        t = pq.read_table(f)
        if victim is None:
            victim = t.column("bucket")[0].as_py()
        if t.column("bucket")[0].as_py() == victim:
            f.unlink()
    # (2) torn lineage file from a crash mid-commit
    (lineage_dir / "part-torn.snappy.parquet").write_bytes(b"PAR1\x00torn\x13")
    # (3) garbage data file in the now-uncommitted bucket dir
    (tmp_path / "s" / "data" / f"bucket={victim}" / "part-torn.parquet").write_bytes(
        b"PAR1 not a real file"
    )

    cp2 = CheckpointedPipeline(spark, str(tmp_path), n_buckets=4)
    res = cp2.run_stage("s", pts, lambda d: d.withColumn("x2", F.col("x") * 2), "url")
    assert res.buckets_run == 1 and res.buckets_skipped == 3
    back = cp2.read_stage("s")
    assert back.count() == 200  # no loss, no duplicates
    assert back.filter(F.col("x2") != F.col("x") * 2).count() == 0
    assert {r.url for r in back.collect()} == {f"u{i}" for i in range(200)}


@pytest.mark.slow
def test_bucket_assignment_stable_across_partitioning(spark, pts, tmp_path):
    cp = CheckpointedPipeline(spark, str(tmp_path), n_buckets=8)
    cp.run_stage("s", pts.repartition(2), lambda d: d, "url")
    a = {(r.url) for r in cp.read_stage("s").collect()}
    cp2 = CheckpointedPipeline(spark, str(tmp_path / "b"), n_buckets=8)
    cp2.run_stage("s", pts.repartition(13), lambda d: d, "url")
    b = {(r.url) for r in cp2.read_stage("s").collect()}
    assert a == b
