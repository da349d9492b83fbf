"""Hilbert spatial partitioning — the distributed analogue of the
reference's packed-tree build + ``partitions()``/``partition_boxes()``
(reference src/rtree/builder.rs:36-238,
python/src/rtree/partitions.rs:19-132).

The two-level scheme (SURVEY.md §1.1): the *global* level is a
Hilbert-range partitioning of the whole table (Spark's
``repartitionByRange`` = the shuffle; partition boxes = a tiny aggregate
kept broadcast-able), and the *local* level is an optional per-partition
packed tree built by the ``localindex`` kernels. At 100 TB the global
level is what matters: Hilbert-clustered parquet gives selective min/max
column stats, so bbox queries prune files without any index structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geo_index_spark.hilbert import grid_coord_col, with_hilbert_key

BOX_COLS = ("minx", "miny", "maxx", "maxy")


def _box_cols(df: DataFrame, cols: tuple[str, str, str, str] | None):
    c = cols or BOX_COLS
    if len(c) == 2:  # point table: (x, y) -> degenerate boxes
        x, y = c
        return F.col(x), F.col(y), F.col(x), F.col(y)
    return tuple(F.col(n) for n in c)


def global_bounds(
    df: DataFrame, cols: tuple[str, ...] | None = None
) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) of the dataset — one map-side-combined
    aggregate, the same incremental bounds the reference tracks in
    ``add()`` (src/rtree/builder.rs:95-106)."""
    mnx, mny, mxx, mxy = _box_cols(df, cols)
    row = df.agg(
        F.min(mnx).alias("minx"),
        F.min(mny).alias("miny"),
        F.max(mxx).alias("maxx"),
        F.max(mxy).alias("maxy"),
    ).first()
    return (row["minx"], row["miny"], row["maxx"], row["maxy"])


def with_hilbert(
    df: DataFrame,
    bounds: tuple[float, float, float, float] | None = None,
    cols: tuple[str, ...] | None = None,
    out: str = "hilbert",
) -> DataFrame:
    """Add the u32 Hilbert key of each row's box center as a LongType
    column — pure Catalyst expression, JVM-side (see hilbert.hilbert_col)."""
    if bounds is None:
        bounds = global_bounds(df, cols)
    lox, loy, hix, hiy = (float(b) for b in bounds)
    mnx, mny, mxx, mxy = _box_cols(df, cols)
    staged = df.withColumns(
        {
            "_gx": grid_coord_col((mnx + mxx) / F.lit(2.0), lox, hix - lox),
            "_gy": grid_coord_col((mny + mxy) / F.lit(2.0), loy, hiy - loy),
        }
    )
    return with_hilbert_key(staged, "_gx", "_gy", out).drop("_gx", "_gy")


def hilbert_partition(
    df: DataFrame,
    num_partitions: int,
    bounds: tuple[float, float, float, float] | None = None,
    cols: tuple[str, ...] | None = None,
    persist_key: bool = False,
) -> DataFrame:
    """Cluster the table spatially: Hilbert key -> range repartition ->
    sort within partitions. Writing the result to parquet yields files
    whose (minx..maxy) min/max stats are tight, so downstream bbox scans
    prune at the file/row-group level — the distributed equivalent of
    the reference's node-bbox pruning (src/rtree/trait.rs:143-149).

    SCAN-COUNT NOTE: ``repartitionByRange`` derives its split points by
    SAMPLING, which re-executes the upstream plan — the keyed input is
    computed twice. For a cheap upstream (parquet scan + projection)
    that's the idiomatic trade and this function leaves it alone. When
    the upstream is expensive (HTML extraction, a join), pass
    ``persist_key=True`` to cache the keyed projection so the sampling
    pass reads the cache instead of recomputing lineage (caller may
    ``.unpersist()`` the returned frame's source after the final
    action), or materialize the keyed table yourself first."""
    out = with_hilbert(df, bounds, cols)
    if persist_key:
        out = out.persist()
    return out.repartitionByRange(num_partitions, "hilbert").sortWithinPartitions("hilbert")


def partitions(
    df: DataFrame,
    node_size: int,
    cols: tuple[str, ...] | None = None,
    id_col: str = "row_id",
) -> DataFrame:
    """Reference-exact ``partitions()`` (python/src/rtree/partitions.rs:19-104):
    partition_id = position in Hilbert order // node_size.

    Uses a global window — exact but single-reducer for the ordering;
    meant for parity tests and small dims. The scale path is
    :func:`hilbert_partition` + ``spark_partition_id()`` which delivers
    the same contract (spatially-coherent groups) without a global sort
    bottleneck.
    """
    h = with_hilbert(df, cols=cols)
    w = Window.orderBy("hilbert", id_col)
    return h.withColumn(
        "partition_id",
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(node_size)).cast("long"),
    )


def partition_boxes(parts: DataFrame, cols: tuple[str, ...] | None = None) -> DataFrame:
    """``partition_boxes()`` (python/src/rtree/partitions.rs:108-132):
    bbox union per partition_id — maps to a map-side-combined groupBy."""
    mnx, mny, mxx, mxy = _box_cols(parts, cols)
    return (
        parts.groupBy("partition_id")
        .agg(
            F.min(mnx).alias("minx"),
            F.min(mny).alias("miny"),
            F.max(mxx).alias("maxx"),
            F.max(mxy).alias("maxy"),
        )
        .orderBy("partition_id")
    )


def boxes_at_level(
    df: DataFrame, node_size: int, level: int, cols: tuple[str, ...] | None = None
) -> DataFrame:
    """``boxes_at_level`` (reference src/rtree/trait.rs:95-108): level 0 =
    item boxes in Hilbert order; level L>0 = bbox unions of groups of
    node_size^L consecutive items — repeated grouping by
    ``hilbert_rank // node_size^L``."""
    if level == 0:
        return with_hilbert(df, cols=cols).orderBy("hilbert", "row_id").select(
            *[c for c in (cols or BOX_COLS)]
        )
    p = partitions(df, node_size**level, cols=cols)
    return partition_boxes(p, cols=cols).select("partition_id", "minx", "miny", "maxx", "maxy")
