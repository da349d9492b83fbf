"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting. Pure Catalyst expressions with
generated DuckDB oracles (same algorithm, same constants).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker words per language for the n-gram/stopword heuristic language ID
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of ", " is "),
    "de": (" der ", " und ", " die ", " ist "),
    "fr": (" le ", " la ", " et ", " est "),
    "es": (" el ", " los ", " que ", " es "),
    "ja": ("の", "は", "を", "です"),
}
_LANGS = tuple(_LANG_MARKERS)


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring — (len(t) - len(replace)) / len(needle),
    identical arithmetic in Spark and DuckDB (both length() = chars)."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))
    ) / F.lit(len(needle))


def _count_occurrences_sql(text: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return f"((length({text}) - length(replace({text}, '{esc}', ''))) / {len(needle)})"


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, lang_pred) — argmax of per-language marker-word hit counts
    over ' '||lower(text)||' '; deterministic tiebreak = language order.
    A stopword-count heuristic in the spirit of n-gram language ID,
    expressed as a branch-free Catalyst projection."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {
        lang: sum((_count_occurrences(padded, m) for m in marks), F.lit(0.0))
        for lang, marks in _LANG_MARKERS.items()
    }
    best = None
    best_score = None
    for lang in _LANGS:
        if best is None:
            best, best_score = F.lit(lang), scores[lang]
        else:
            cond = scores[lang] > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return docs.select(F.col(id_col).alias("id"), best.alias("lang_pred"))


def language_id_sql(id_col: str = "doc_id", text_col: str = "text", table: str = "documents") -> str:
    padded = f"(' ' || lower({text_col}) || ' ')"
    score = {
        lang: " + ".join(_count_occurrences_sql(padded, m) for m in marks)
        for lang, marks in _LANG_MARKERS.items()
    }
    # same fold as the Spark side: later language wins only on strictly greater
    expr = f"'{_LANGS[0]}'"
    sexpr = f"({score[_LANGS[0]]})"
    for lang in _LANGS[1:]:
        expr = f"CASE WHEN ({score[lang]}) > {sexpr} THEN '{lang}' ELSE {expr} END"
        sexpr = f"(CASE WHEN ({score[lang]}) > {sexpr} THEN ({score[lang]}) ELSE {sexpr} END)"
    return f"SELECT {id_col} AS id, {expr} AS lang_pred FROM {table}"


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens) — whitespace tokenization, empty tokens dropped."""
    toks = F.filter(F.split(F.col(text_col), "[ \\t\\n\\r]+"), lambda t: t != "")
    return docs.select(F.col(id_col).alias("id"), F.size(toks).cast("long").alias("n_tokens"))


def token_count_sql(id_col: str = "doc_id", text_col: str = "text", table: str = "documents") -> str:
    return f"""
    SELECT {id_col} AS id,
           len(list_filter(regexp_split_to_array({text_col}, '[ \\t\\n\\r]+'), t -> t <> ''))::BIGINT AS n_tokens
    FROM {table}
    """


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_tokens, punct_ratio_pm, upper_ratio_pm, score_pm)
    — simple length/punctuation/case quality signals. Ratios are
    *per-mille integers* (floor) so Spark and the SQL oracle agree
    exactly with no float hashing concerns."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    toks = F.filter(F.split(t, "[ \\t\\n\\r]+"), lambda x: x != "")
    n_tokens = F.size(toks).cast("long")
    n_punct = F.length(t) - F.length(F.regexp_replace(t, "[.,;:!?]", ""))
    n_upper = F.length(t) - F.length(F.regexp_replace(t, "[A-Z]", ""))
    punct_pm = F.floor(n_punct * F.lit(1000) / F.greatest(n_chars, F.lit(1))).cast("long")
    upper_pm = F.floor(n_upper * F.lit(1000) / F.greatest(n_chars, F.lit(1))).cast("long")
    # crude composite: long docs with moderate punctuation score higher
    score_pm = F.least(n_chars, F.lit(1000)) - punct_pm - upper_pm
    return docs.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        punct_pm.alias("punct_ratio_pm"),
        upper_pm.alias("upper_ratio_pm"),
        score_pm.cast("long").alias("score_pm"),
    )


def quality_score_sql(id_col: str = "doc_id", text_col: str = "text", table: str = "documents") -> str:
    return f"""
    SELECT {id_col} AS id,
           length({text_col})::BIGINT AS n_chars,
           len(list_filter(regexp_split_to_array({text_col}, '[ \\t\\n\\r]+'), t -> t <> ''))::BIGINT AS n_tokens,
           floor((length({text_col}) - length(regexp_replace({text_col}, '[.,;:!?]', '', 'g'))) * 1000 / greatest(length({text_col}), 1))::BIGINT AS punct_ratio_pm,
           floor((length({text_col}) - length(regexp_replace({text_col}, '[A-Z]', '', 'g'))) * 1000 / greatest(length({text_col}), 1))::BIGINT AS upper_ratio_pm,
           (least(length({text_col}), 1000)
            - floor((length({text_col}) - length(regexp_replace({text_col}, '[.,;:!?]', '', 'g'))) * 1000 / greatest(length({text_col}), 1))
            - floor((length({text_col}) - length(regexp_replace({text_col}, '[A-Z]', '', 'g'))) * 1000 / greatest(length({text_col}), 1)))::BIGINT AS score_pm
    FROM {table}
    """


def doc_fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fingerprint) — 64-bit content fingerprint (first 16 md5 hex
    chars), the cheap exact-dup / shard-routing key."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.substring(F.md5(F.col(text_col)), 1, 16).alias("fingerprint"),
    )


def doc_fingerprint_sql(id_col: str = "doc_id", text_col: str = "text", table: str = "documents") -> str:
    return f"SELECT {id_col} AS id, substr(md5({text_col}), 1, 16) AS fingerprint FROM {table}"
