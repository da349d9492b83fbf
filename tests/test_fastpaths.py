"""Fast-path variants agree with their oracle-grade twins; tile pyramid
equals per-level direct aggregation; streaming extraction end-to-end."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_index_spark.operators.pyramid import tile_pyramid
from geo_index_spark.operators.tiling import quad_cell_col
from geo_index_spark.textops import ann as A
from geo_index_spark.textops import dedup as D


def test_minhash_fast_finds_true_near_dups(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog and keeps running far"),
        (1, "the quick brown fox jumps over the lazy dog and keeps running far"),
        (2, "the quick brown fox jumped over the lazy dog and keeps running far"),
        (3, "completely unrelated text about database query optimizers and joins"),
        (4, "another unrelated document mentioning streams, windows and state"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fast = {(r.a_id, r.b_id) for r in D.minhash_near_dup_pairs_fast(docs, tau_num=1, tau_den=2).collect()}
    exact = {(r.a_id, r.b_id) for r in D.ngram_jaccard_pairs(docs, tau_num=1, tau_den=2).collect()}
    assert fast <= exact  # refinement guarantees no false positives
    assert (0, 1) in fast and (0, 2) in fast


def test_cosine_topk_fast_matches_exact(spark):
    rng = np.random.default_rng(8)
    base = rng.standard_normal((200, 32)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in base[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    q = [float(v) for v in rng.standard_normal(32)]
    exact = [(r.id, r.score) for r in A.cosine_topk(df, q, 15).collect()]
    fast = [(r.id, r.score) for r in A.cosine_topk_fast(df, q, 15).collect()]
    assert [i for i, _ in exact] == [i for i, _ in fast]
    for (_, a), (_, b) in zip(exact, fast):
        assert abs(a - b) <= 1e-6


def test_tile_pyramid_equals_direct_levels(spark):
    from geo_index_spark.webtext.generate import gen_points

    lon, lat = gen_points(3000)
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(lon, lat)], "x double, y double"
    )
    pyr = tile_pyramid(df, min_level=4, max_level=7)
    for lvl in range(4, 8):
        got = {
            (r.cell_id, r.n)
            for r in pyr.filter(F.col("level") == lvl).collect()
        }
        want = {
            (r.cell_id, r.n)
            for r in df.groupBy(
                quad_cell_col(F.col("x"), F.col("y"), lvl).alias("cell_id")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want, f"level {lvl}"


def test_streaming_extraction_end_to_end(spark, tmp_path):
    """Continuous ingestion of raw pages: stream -> extract_text_col +
    geotag -> tile rollup; equals the batch pipeline on the same files."""
    from geo_index_spark.streaming import stream_tile_rollup
    from geo_index_spark.webtext.extract import geotag_col
    from geo_index_spark.webtext.generate import web_pages_pdf

    pdf = web_pages_pdf(300)
    pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
    src = tmp_path / "pages"
    src.mkdir()
    pdf.iloc[:150].to_parquet(src / "a.parquet")
    pdf.iloc[150:].to_parquet(src / "b.parquet")

    schema = spark.read.parquet(str(src)).schema

    def extract(frame):
        lon, lat = geotag_col(F.col("html"))
        return frame.select(
            F.col("warc_ts").cast("timestamp").alias("warc_ts"),
            lon.alias("x"),
            lat.alias("y"),
        ).filter(F.col("x").isNotNull())

    stream_pts = extract(spark.readStream.schema(schema).parquet(str(src)))
    q = (
        stream_tile_rollup(stream_pts, ts_col="warc_ts", level=5, window="30 minutes")
        .writeStream.format("memory")
        .queryName("ext_tiles")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.cell_id, r.n)
        for r in spark.sql("SELECT * FROM ext_tiles").collect()
    }
    batch_pts = extract(spark.read.parquet(str(src)))
    want = {
        (r.ws, r.cell_id, r.n)
        for r in batch_pts.groupBy(
            F.window("warc_ts", "30 minutes").alias("w"),
            quad_cell_col(F.col("x"), F.col("y"), 5).alias("cell_id"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "cell_id", "n")
        .collect()
    }
    assert got == want and sum(n for _, _, n in got) == 300
