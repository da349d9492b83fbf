"""Null/NaN coordinate policy.

The reference rejects nulls at the binding layer ("Cannot pass array
with null values", reference python/src/rtree/builder.rs:199-201) and
documents NaN as unsupported/panicking (src/rtree/mod.rs:24-25). A
distributed engine shouldn't panic mid-job, so we expose both contracts
explicitly and the operators assume validated input (their filters drop
nulls implicitly via SQL three-valued logic — deterministic, but the
caller should choose a policy up front).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reject_invalid(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """Fail fast (reference behavior): raise if any row has a NULL or
    NaN coordinate. One cheap aggregate over the scan."""
    conds = [
        (F.col(c).isNull() | F.isnan(F.col(c))).cast("int").alias(c) for c in cols
    ]
    row = df.select(conds).agg(*[F.sum(c).alias(c) for c in cols]).first()
    bad = {c: row[c] for c in cols if row[c]}
    if bad:
        raise ValueError(f"null/NaN coordinates not supported (counts: {bad})")
    return df


def drop_invalid(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """Web-scale policy: silently drop rows with NULL/NaN coordinates
    (a trillion-page crawl always contains junk); pushdown-friendly."""
    cond = None
    for c in cols:
        k = F.col(c).isNotNull() & ~F.isnan(F.col(c))
        cond = k if cond is None else (cond & k)
    return df.filter(cond)
