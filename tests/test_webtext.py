"""HTML->text byte-identity + geotag extraction + page generator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geo_index_spark.webtext.extract import (
    extract_points,
    extract_text,
    extract_text_col,
    geotag_col,
)
from geo_index_spark.webtext.generate import web_pages_df, web_pages_pdf


def test_extract_text_spec_cases():
    assert extract_text(b"<p>Hello <b>world</b></p>") == "Hello world"
    assert extract_text(b"<script>var x=1;</script>text") == "text"
    assert extract_text(b"<STYLE a=b>.c{}</style>x") == "x"
    assert extract_text(b"<!-- c -->a<!--d-->b") == "ab"  # comments vanish (spec step 3)
    assert extract_text(b"a&amp;b &lt;x&gt; &quot;q&quot; &#39;s&#39;") == 'a&b <x> "q" \'s\''
    assert extract_text(b"  a \t\n b  ") == "a b"
    # double-escape stays escaped (&amp; decoded last)
    assert extract_text(b"&amp;lt;") == "&lt;"
    assert extract_text(b"") == ""


def test_extract_byte_identity_spark_vs_reference(spark):
    """The north-rule invariant: Spark extraction == reference extractor
    byte-for-byte per url, on the full generated corpus."""
    pages = web_pages_df(spark, 500)
    mism = (
        pages.withColumn("t2", extract_text_col(F.col("html")))
        .filter(F.col("t2") != F.col("text"))
        .count()
    )
    assert mism == 0


def test_extract_byte_identity_unicode(spark):
    html = "<p>héllo wörld — 日本語 &amp; more</p>".encode("utf-8")
    want = extract_text(html)
    df = spark.createDataFrame([(bytearray(html),)], "html binary")
    got = df.select(extract_text_col(F.col("html")).alias("t")).first()["t"]
    assert got == want


def test_geotag_extraction(spark):
    pages = web_pages_df(spark, 200)
    pts = extract_points(pages)
    assert pts.count() == 200
    row = pts.first()
    assert -180 <= row.x < 180 and -85 <= row.y <= 85
    # lon/lat order: x must be the SECOND field of the content attr
    html = b'<meta name="geo.position" content="48.85;2.35">'
    df = spark.createDataFrame([(bytearray(html),)], "html binary")
    lon, lat = geotag_col(F.col("html"))
    got = df.select(lon.alias("x"), lat.alias("y")).first()
    assert (got.x, got.y) == (2.35, 48.85)


def test_no_geotag_is_null(spark):
    df = spark.createDataFrame([(bytearray(b"<p>no tag</p>"),)], "html binary")
    lon, lat = geotag_col(F.col("html"))
    got = df.select(lon.alias("x"), lat.alias("y")).first()
    assert got.x is None and got.y is None


def test_generator_deterministic():
    a = web_pages_pdf(50)
    b = web_pages_pdf(50)
    assert a.equals(b)
    assert list(a.columns) == ["url", "warc_ts", "html", "text", "lang"]


def test_generator_skew():
    pdf = web_pages_pdf(2000)
    import numpy as np

    lon = np.array([float(h.decode().split('content="')[1].split(";")[1].split('"')[0]) for h in pdf.html[:0]])  # noqa: F841
    # skew: the densest 1-degree lon bucket holds far more than uniform share
    import pandas as pd

    from geo_index_spark.webtext.generate import gen_points

    glon, glat = gen_points(2000)
    counts = pd.Series(np.floor(glon)).value_counts()
    assert counts.iloc[0] > 2000 / 360 * 5
