"""Sessionization: batch vs DuckDB oracle; streaming stateful smoke +
agreement with batch on a single availableNow pass."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geo_index_spark.operators.sessions import sessionize, sessionize_sql


def _events_pdf():
    rows = []
    base = pd.Timestamp("2025-03-01T00:00:00")
    # user 1: three events in one session, then a gap, then two more
    for s in (0, 60, 120, 4000, 4030):
        rows.append((1, base + pd.Timedelta(seconds=s)))
    # user 2: single event
    rows.append((2, base))
    # user 3: alternating gaps
    for s in (0, 2000, 4000):
        rows.append((3, base + pd.Timedelta(seconds=s)))
    return pd.DataFrame(rows, columns=["user_id", "ts"])


def test_sessionize_golden_and_oracle(spark):
    pdf = _events_pdf()
    df = spark.createDataFrame(pdf)
    got = sessionize(df, gap_seconds=1800).orderBy("user_id", "session_id").collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r.n_events)
    assert by_user == {1: [3, 2], 2: [1], 3: [1, 1, 1]}

    con = duckdb.connect()
    con.register("events", pdf)
    want = con.sql(sessionize_sql(gap_seconds=1800)).fetchall()
    got_set = {(r.user_id, r.session_id, r.n_events, r.session_start, r.session_end) for r in got}
    want_set = {tuple(w) for w in want}
    assert got_set == want_set


def test_sessionize_on_events_table(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = sessionize(ev, gap_seconds=600)
    assert out.count() >= ev.select("user_id").distinct().count()
    # sessions never overlap per user
    bad = (
        out.alias("a")
        .join(out.alias("b"), "user_id")
        .filter(
            (F.col("a.session_id") < F.col("b.session_id"))
            & (F.col("a.session_end") >= F.col("b.session_start"))
        )
        .count()
    )
    assert bad == 0


@pytest.mark.slow
def test_stream_sessionize_matches_batch_single_pass(spark, tmp_path):
    from geo_index_spark.streaming.sessions import stream_sessionize

    pdf = _events_pdf()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    src = tmp_path / "src"
    src.mkdir()
    pdf.to_parquet(src / "a.parquet")
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream_sessionize(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, session_id, n_events FROM sess_out"
    ).collect()
    # single batch -> the stream's final update rows == batch sessions
    got_set = {(r.user_id, r.session_id, r.n_events) for r in got}
    batch = sessionize(spark.createDataFrame(pdf), gap_seconds=1800).collect()
    want_set = {(r.user_id, r.session_id, r.n_events) for r in batch}
    assert got_set == want_set
