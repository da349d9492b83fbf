"""Iceberg-shim catalog: snapshot commits, time travel, append, rollback."""

from __future__ import annotations

import pytest

from geo_index_spark.pipeline.catalog import ParquetSnapshotCatalog


def test_snapshot_write_read_time_travel(spark, tmp_path):
    cat = ParquetSnapshotCatalog(str(tmp_path))
    df1 = spark.range(10).withColumnRenamed("id", "v")
    s1 = cat.write(df1, "t")
    df2 = spark.range(5).withColumnRenamed("id", "v")
    s2 = cat.write(df2, "t")
    assert cat.read(spark, "t").count() == 5  # current
    assert cat.read(spark, "t", snapshot_id=s1).count() == 10  # time travel
    assert cat.current_snapshot_id("t") == s2
    log = cat.snapshots("t")
    assert [s["snapshot_id"] for s in log] == [s1, s2]
    assert log[0]["rows"] == 10


def test_append_mode(spark, tmp_path):
    cat = ParquetSnapshotCatalog(str(tmp_path))
    cat.write(spark.range(3).withColumnRenamed("id", "v"), "t")
    cat.write(spark.range(100, 102).withColumnRenamed("id", "v"), "t", mode="append")
    got = sorted(r.v for r in cat.read(spark, "t").collect())
    assert got == [0, 1, 2, 100, 101]


def test_missing_table_and_snapshot(spark, tmp_path):
    cat = ParquetSnapshotCatalog(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        cat.read(spark, "nope")
    cat.write(spark.range(1), "t")
    with pytest.raises(KeyError):
        cat.read(spark, "t", snapshot_id=12345)
