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


def sanitize_lonlat(
    df: DataFrame,
    lon_col: str = "x",
    lat_col: str = "y",
    policy: str = "drop",
) -> DataFrame:
    """Normalize geographic coordinates into the domain the haversine
    operators require (lon in [-180, 180], lat in [-90, 90] — the
    degree-box expansion raises row-level on bad latitudes).

    ``policy="drop"``: remove rows outside the valid ranges (after lon
    normalization) — the web-crawl default. ``policy="wrap"``: fold any
    finite lon into [-180, 180) with the IEEE remainder and KEEP rows,
    dropping only invalid latitudes (a lon of 540 is almost always a
    wrapped 180, while lat 95 is junk — wrapping latitude would move
    points across the pole). ``policy="reject"``: fail fast with
    counts, like :func:`reject_invalid`. NULL/NaN rows are dropped (or
    rejected) under every policy."""
    if policy not in ("drop", "wrap", "reject"):
        raise ValueError(f"policy must be drop|wrap|reject, got {policy!r}")
    lon, lat = F.col(lon_col), F.col(lat_col)
    out = df
    if policy == "reject":
        cnt = (
            drop_invalid(df, (lon_col, lat_col))
            .filter(
                (lon < -180.0) | (lon > 180.0) | (lat < -90.0) | (lat > 90.0)
            )
            .count()
        )
        nulls = df.count() - drop_invalid(df, (lon_col, lat_col)).count()
        if cnt or nulls:
            raise ValueError(
                f"coordinates outside WGS84 domain (out-of-range: {cnt}, "
                f"null/NaN: {nulls})"
            )
        return df
    out = drop_invalid(out, (lon_col, lat_col))
    if policy == "wrap":
        # ((lon % 360) + 360) % 360 in [0, 360) -> shift to [-180, 180)
        norm = F.pmod(lon, F.lit(360.0))
        wrapped = F.when(norm >= 180.0, norm - 360.0).otherwise(norm)
        out = out.withColumn(lon_col, wrapped)
    else:
        out = out.filter((lon >= -180.0) & (lon <= 180.0))
    return out.filter((lat >= -90.0) & (lat <= 90.0))
