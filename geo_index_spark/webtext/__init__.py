"""Common-Crawl-style web-page stage: HTML→text extraction, geotag
parsing, and deterministic synthetic page generation (the north-rule
input table: url, warc_ts, html, text, lang)."""

from geo_index_spark.webtext.extract import (  # noqa: F401
    extract_text,
    extract_text_col,
    geotag_col,
)
from geo_index_spark.webtext.generate import web_pages_df  # noqa: F401
