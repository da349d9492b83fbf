"""Streaming tile rollup (stream == batch on same input) + multimodal
plumbing (schema/batch shape real, codec stubbed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geo_index_spark.multimodal import (
    decode_header,
    encode_fake,
    extract_media_meta,
    fake_media_df,
    frame_sample,
    media_features,
)
from geo_index_spark.operators.tiling import quad_cell_col
from geo_index_spark.streaming import stream_tile_rollup
from geo_index_spark.webtext.generate import web_pages_pdf


def test_stream_rollup_equals_batch(spark, tmp_path):
    # materialize geotag points as parquet files -> file stream source
    pdf = web_pages_pdf(400)
    import re

    pts = pdf[["url", "warc_ts"]].copy()
    coords = pdf["html"].map(
        lambda h: re.search(rb'content="(-?[\d.]+);(-?[\d.]+)"', h).groups()
    )
    pts["y"] = [float(a) for a, _ in coords]
    pts["x"] = [float(b) for _, b in coords]
    pts["warc_ts"] = pts["warc_ts"].astype("datetime64[us]")  # Spark can't read ns parquet
    src = tmp_path / "src"
    src.mkdir()
    pts.iloc[:200].to_parquet(src / "a.parquet")
    pts.iloc[200:].to_parquet(src / "b.parquet")

    static = spark.read.parquet(str(src)).withColumn(
        "warc_ts", F.col("warc_ts").cast("timestamp")  # NTZ parquet -> event-time type
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .parquet(str(src))
        .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    )
    rolled = stream_tile_rollup(stream, ts_col="warc_ts", level=6, window="10 minutes")
    q = (
        rolled.writeStream.format("memory")
        .queryName("tiles_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.cell_id, r.n)
        for r in spark.sql("SELECT * FROM tiles_out").collect()
    }
    want = {
        (r.ws, r.cell_id, r.n)
        for r in static.groupBy(
            F.window("warc_ts", "10 minutes").alias("w"),
            quad_cell_col(F.col("x"), F.col("y"), 6).alias("cell_id"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "cell_id", "n")
        .collect()
    }
    assert got == want and len(got) > 0


def test_media_meta_roundtrip(spark):
    media = fake_media_df(spark, 30)
    meta = extract_media_meta(media).collect()
    assert len(meta) == 30
    for r in meta:
        assert r.kind in ("IMG", "AUD", "VID")
        assert r.width >= 16 and r.body_bytes >= 64


def test_media_features_shape(spark):
    media = fake_media_df(spark, 12)
    feats = media_features(media).collect()
    assert len(feats) == 12
    for r in feats:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-9


def test_frame_sample_only_videos(spark):
    media = fake_media_df(spark, 30)
    frames = frame_sample(media, every_n=50).collect()
    vids = {r.media_id for r in media.filter(F.col("kind") == "VID").collect()}
    assert {r.media_id for r in frames} <= vids
    assert all(r.frame_idx % 50 == 0 for r in frames)


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError, match="real codec"):
        decode_header(b"\x89PNG\r\n\x1a\n....")
    # FAKE container round-trips
    p = encode_fake("IMG", 640, 480, 0, 1, b"xyz")
    m = decode_header(p)
    assert (m["width"], m["height"], m["body"]) == (640, 480, b"xyz")


@pytest.mark.slow
def test_stream_extract_pipeline_checkpoint_restart(spark, tmp_path):
    """Continuous extraction e2e: raw page stream (html binary) ->
    extract text -> geotag -> watermarked tile rollup, with a
    CHECKPOINT RESTART mid-stream. The restarted query must resume from
    the offset log (reading only the new file) and the final rollup
    must equal the batch aggregate over all files."""
    from geo_index_spark.webtext.extract import extract_text_col, geotag_col

    pdf = web_pages_pdf(400)
    pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
    src = tmp_path / "pages"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pdf.iloc[:200].to_parquet(src / "a.parquet")

    schema = spark.read.parquet(str(src)).schema

    def pipeline():
        pages = (
            spark.readStream.schema(schema)
            .parquet(str(src))
            .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
        )
        lon, lat = geotag_col(F.col("html"))
        pts = (
            pages.withColumn("text_ex", extract_text_col(F.col("html")))
            .withColumn("x", lon)
            .withColumn("y", lat)
            .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        )
        rolled = stream_tile_rollup(pts, ts_col="warc_ts", level=6, window="10 minutes")

        def sink(batch_df, _epoch):
            batch_df.write.mode("overwrite").parquet(out)

        return (
            rolled.writeStream.foreachBatch(sink)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q1 = pipeline()
    q1.awaitTermination(120)
    first = {(r.window_start, r.cell_id, r.n) for r in spark.read.parquet(out).collect()}
    assert sum(n for _, _, n in first) > 0

    # mid-stream: new files arrive, the query restarts FROM CHECKPOINT
    pdf.iloc[200:].to_parquet(src / "b.parquet")
    q2 = pipeline()
    q2.awaitTermination(120)
    # offset log replayed: the restarted run read only the new file
    read2 = sum(p["numInputRows"] for p in q2.recentProgress)
    assert read2 <= 200

    got = {(r.window_start, r.cell_id, r.n) for r in spark.read.parquet(out).collect()}
    static = spark.read.parquet(str(src)).withColumn(
        "warc_ts", F.col("warc_ts").cast("timestamp")
    )
    lon, lat = geotag_col(F.col("html"))
    pts = (
        static.withColumn("x", lon).withColumn("y", lat)
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    want = {
        (r.ws, r.cell_id, r.n)
        for r in pts.groupBy(
            F.window("warc_ts", "10 minutes").alias("w"),
            quad_cell_col(F.col("x"), F.col("y"), 6).alias("cell_id"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "cell_id", "n")
        .collect()
    }
    assert got == want and got != first


@pytest.mark.slow
def test_stream_exact_dedup_equals_batch(spark, tmp_path):
    """Multi-batch streaming dedup (maxFilesPerTrigger=1) must converge
    to the batch exact_dedup result regardless of micro-batching —
    min-id keeper and total n_copies are order-insensitive folds."""
    import pandas as pd

    from geo_index_spark.streaming import stream_exact_dedup
    from geo_index_spark.textops.dedup import exact_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # split into 4 files -> 4 micro-batches
    src = tmp_path / "src"
    src.mkdir()
    pdf = docs.toPandas()
    for i in range(4):
        pdf[pdf["doc_id"] % 4 == i].to_parquet(
            str(src / f"part{i}.parquet"), index=False
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = stream_exact_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_updates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    upd = spark.sql("SELECT * FROM dedup_updates").toPandas()
    # latest update per key = the row with the max n_copies (monotone)
    final = upd.sort_values("n_copies").groupby("text_md5").tail(1)
    got = {
        (r.text_md5, int(r.doc_id), int(r.n_copies)) for r in final.itertuples()
    }
    want = {
        (r.text_md5, int(r.doc_id), int(r.n_copies))
        for r in exact_dedup(docs).collect()
    }
    assert got == want and len(want) > 0


def test_media_parquet_cache_versioned(tmp_path):
    """ADVICE r3: the cache file name embeds a content digest, so a
    changed seed/generator gets a fresh file instead of silently
    reusing stale bytes; identical params reuse the existing file."""
    import os

    from geo_index_spark.multimodal import ensure_media_parquet

    req = str(tmp_path / "media.parquet")
    p1 = ensure_media_parquet(req, n=10, seed=1)
    assert p1 != req and os.path.exists(p1)  # digest embedded in the name
    mtime = os.path.getmtime(p1)
    assert ensure_media_parquet(req, n=10, seed=1) == p1
    assert os.path.getmtime(p1) == mtime  # reused, not rewritten
    p2 = ensure_media_parquet(req, n=10, seed=2)
    assert p2 != p1  # different generator output -> different cache file
    p3 = ensure_media_parquet(req, n=11, seed=1)
    assert p3 != p1
