"""HTML -> text extraction + geotag parsing.

The north rule requires *byte-identical extracted text per url* between
the reference extractor and the Spark job (BASELINE.json input_hint).
The reference extractor is :func:`extract_text` below — a small, fully
specified Python function. The Spark hot path :func:`extract_text_col`
is a chain of Catalyst ``regexp_replace``/``trim`` expressions that is
byte-equivalent on every input (property-tested); it runs JVM-side in
whole-stage codegen, so extracting 10^12 pages is a pure projection.

Extraction spec (deterministic, order matters):
  1. decode bytes as UTF-8 (invalid bytes are the caller's problem —
     generator emits valid UTF-8).
  2. drop <script>...</script> and <style>...</style> blocks
     (case-insensitive, non-greedy, dot-matches-newline).
  3. drop HTML comments <!-- ... -->.
  4. replace every remaining tag <...> with a single space.
  5. decode the five core entities &amp; &lt; &gt; &quot; &#39;
     (&amp; last, so double-escapes stay escaped — standard order).
  6. collapse runs of ASCII whitespace [ \\t\\n\\r\\f\\x0b] to one
     space and strip leading/trailing spaces.

All regexes are RE2-compatible (no backrefs/lookaround) so a DuckDB
oracle can run the same extraction (driver correctness gate).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCRIPT = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE = r"(?is)<style\b[^>]*>.*?</style>"
_COMMENT = r"(?s)<!--.*?-->"
_TAG = r"<[^>]*>"
_WS = r"[ \t\n\r\f\x0b]+"

_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"))


def extract_text(html: bytes | str) -> str:
    """Reference extractor (the byte-identity target)."""
    s = html.decode("utf-8") if isinstance(html, (bytes, bytearray)) else html
    s = re.sub(_SCRIPT, "", s)
    s = re.sub(_STYLE, "", s)
    s = re.sub(_COMMENT, "", s)
    s = re.sub(_TAG, " ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    s = re.sub(_WS, " ", s)
    return s.strip(" ")


def extract_text_col(html: Column) -> Column:
    """Catalyst equivalent of :func:`extract_text` over a BinaryType (or
    StringType) column — JVM regex, no Python."""
    s = html.cast("string")  # binary -> UTF-8 string
    s = F.regexp_replace(s, _SCRIPT, "")
    s = F.regexp_replace(s, _STYLE, "")
    s = F.regexp_replace(s, _COMMENT, "")
    s = F.regexp_replace(s, _TAG, " ")
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.regexp_replace(s, _WS, " ")
    return F.btrim(s, F.lit(" "))


# geotag: <meta name="geo.position" content="{lat};{lon}">
_GEOTAG = r'<meta\s+name="geo\.position"\s+content="(-?[0-9.]+);(-?[0-9.]+)"'


def geotag_col(html: Column) -> tuple[Column, Column]:
    """(x=lon, y=lat) DoubleType columns extracted from the page; NULL
    when the page carries no geotag. Pure Catalyst regexp_extract."""
    s = html.cast("string")
    lat = F.nullif(F.regexp_extract(s, _GEOTAG, 1), F.lit("")).cast("double")
    lon = F.nullif(F.regexp_extract(s, _GEOTAG, 2), F.lit("")).cast("double")
    return lon, lat


def _sq(s: str) -> str:
    """Escape a string for a single-quoted SQL literal."""
    return s.replace("'", "''")


def extract_text_sql(col: str) -> str:
    """DuckDB mirror of :func:`extract_text_col` — the SAME regex
    constants (all RE2-compatible by design, see module docstring), the
    same order, global replacement ('g'), so extracted text is
    byte-identical across engines. ``col`` is a VARCHAR expression."""
    s = col
    for pat in (_SCRIPT, _STYLE, _COMMENT):
        s = f"regexp_replace({s}, '{_sq(pat)}', '', 'g')"
    s = f"regexp_replace({s}, '{_sq(_TAG)}', ' ', 'g')"
    for ent, ch in _ENTITIES:
        s = f"replace({s}, '{_sq(ent)}', '{_sq(ch)}')"
    s = f"regexp_replace({s}, '{_sq(_WS)}', ' ', 'g')"
    return f"trim({s}, ' ')"


def geotag_sql(col: str) -> tuple[str, str]:
    """(x=lon, y=lat) DOUBLE expressions — DuckDB mirror of
    :func:`geotag_col` (same regex, same empty->NULL contract)."""
    lat = f"nullif(regexp_extract({col}, '{_sq(_GEOTAG)}', 1), '')::DOUBLE"
    lon = f"nullif(regexp_extract({col}, '{_sq(_GEOTAG)}', 2), '')::DOUBLE"
    return lon, lat


def extract_points(pages, url_col: str = "url", html_col: str = "html"):
    """pages(url, html, ...) -> points(url, x, y) for geotagged pages —
    the derived geometry table of SURVEY.md §1.2."""
    lon, lat = geotag_col(F.col(html_col))
    out = pages.select(F.col(url_col).alias("url"), lon.alias("x"), lat.alias("y"))
    return out.filter(F.col("x").isNotNull() & F.col("y").isNotNull())
