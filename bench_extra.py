"""Per-operator isolation bench + plan capture (round 7).

NOT the driver bench — bench.py stays frozen. This file exists so each
operator can be timed solo (guide §1.4: noop-sink isolation) with
min-of-N statistics, and so `.explain("formatted")` of every bench
query can be committed to plans/r07/.

Usage:
    python bench_extra.py [op ...]            # time listed ops (default: all)
    python bench_extra.py --explain SUFFIX    # write plans/r07/<op>_SUFFIX.txt
    REPS=5 python bench_extra.py spatial_join_synth
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

from geo_index_spark.benchwork import (
    BENCH_CONF,
    SYNTH_BOUNDS,
    SYNTH_GRID_LEVEL,
    synth_boxes,
    synth_embeddings,
)
from geo_index_spark.operators import knn, spatial_join, within
from geo_index_spark.operators.knn import knn_join
from geo_index_spark.operators.partitioning import hilbert_partition
from geo_index_spark.operators.search import kd_range
from geo_index_spark.operators.tiling import quad_cell_col
from geo_index_spark.session import get_spark
from geo_index_spark.textops import ann as A
from geo_index_spark.textops import dedup as D

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_SYNTH = int(os.environ.get("SPARK_GRAFT_SYNTH_ROWS", "16000000"))
REPS = int(os.environ.get("REPS", "3"))
PLANS_DIR = Path(__file__).resolve().parent / "plans" / "r07"


def _events_pts(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return ev.select(
        "event_id",
        F.col("value").alias("x"),
        F.col("user_id").cast("double").alias("y"),
    )


def _events_boxes(spark, half=0.5):
    return _events_pts(spark).select(
        F.col("event_id").alias("row_id"),
        (F.col("x") - half).alias("minx"),
        (F.col("y") - half).alias("miny"),
        (F.col("x") + half).alias("maxx"),
        (F.col("y") + half).alias("maxy"),
    )


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def build_ops(spark):
    """name -> (df_builder, action) for every bench.py query."""
    ev = _events_pts(spark)
    boxes = _events_boxes(spark)
    parts = spark.read.parquet(f"{SF_DIR}/part.parquet").select(
        F.col("p_partkey").alias("row_id"),
        F.col("p_size").cast("double").alias("minx"),
        (F.col("p_retailprice") / 10.0).alias("miny"),
        (F.col("p_size") + F.lit(3.0)).cast("double").alias("maxx"),
        (F.col("p_retailprice") / 10.0 + F.lit(3.0)).alias("maxy"),
    )
    pts_as_boxes = _events_boxes(spark, half=0.0)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    import numpy as np

    q = [round(float(v), 4) for v in np.random.default_rng(0).standard_normal(64)]
    sb, sp = synth_boxes(spark, N_SYNTH)
    semb = synth_embeddings(spark, 100_000, 32)
    knn_lefts = sp.filter(F.col("row_id") % 64 == 0)

    ops = {
        "hilbert_build": (
            lambda: hilbert_partition(ev, CPUS, cols=("x", "y")),
            _noop,
        ),
        "bbox_search": (lambda: kd_range(ev, 100, 20, 200, 80), lambda d: d.count()),
        "within": (lambda: within(ev, 250.0, 75.0, 40.0), lambda d: d.count()),
        "knn": (
            lambda: knn(ev, 123.45, 67.0, 100, id_col="event_id"),
            lambda d: d.collect(),
        ),
        "spatial_join_events": (
            lambda: spatial_join(boxes, boxes, grid_level=7),
            lambda d: d.count(),
        ),
        "spatial_join_broadcast": (
            lambda: spatial_join(
                pts_as_boxes, parts, grid_level=5, broadcast_side="right"
            ),
            lambda d: d.count(),
        ),
        "tile_rollup": (
            lambda: ev.groupBy(
                quad_cell_col(F.col("x"), F.col("y"), 8, (0.0, 0.0, 500.0, 150.0)).alias(
                    "c"
                )
            ).count(),
            lambda d: d.count(),
        ),
        "minhash_lsh_docs": (
            lambda: D.minhash_near_dup_pairs(
                docs, n=4, num_hashes=16, tau_num=1, tau_den=2
            ),
            lambda d: d.count(),
        ),
        "minhash_lsh_docs_fast": (
            lambda: D.minhash_near_dup_pairs_fast(
                docs, n=4, num_hashes=16, tau_num=1, tau_den=2
            ),
            lambda d: d.count(),
        ),
        "spatial_join_synth": (
            lambda: spatial_join(
                sb, sb, bounds=SYNTH_BOUNDS, grid_level=SYNTH_GRID_LEVEL
            ),
            lambda d: d.count(),
        ),
        "hilbert_build_synth": (
            lambda: hilbert_partition(
                sp, CPUS * 2, cols=("x", "y"), bounds=SYNTH_BOUNDS
            ),
            _noop,
        ),
        "knn_join_synth": (
            lambda: knn_join(
                knn_lefts, sp, 3, bounds=SYNTH_BOUNDS, right_count=N_SYNTH
            ),
            lambda d: d.count(),
        ),
        "cosine_topk": (lambda: A.cosine_topk(emb, q, 25), lambda d: d.collect()),
        "lsh_near_dup_synth_fast": (
            lambda: A.lsh_cosine_near_dup_pairs_fast(
                semb, tau=0.95, dim=32, n_bands=4, n_planes=16
            ),
            lambda d: d.count(),
        ),
    }
    return ops


def main() -> None:
    args = [a for a in sys.argv[1:]]
    explain_suffix = None
    if args and args[0] == "--explain":
        explain_suffix = args[1] if len(args) > 1 else "before"
        args = args[2:]
    spark = get_spark(
        "bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS * 8, 32),
        extra_conf=BENCH_CONF,
    )
    spark.sparkContext.setLogLevel("ERROR")
    ops = build_ops(spark)
    names = args or list(ops)
    _events_pts(spark).count()  # warm JVM + parquet footers

    if explain_suffix is not None:
        PLANS_DIR.mkdir(parents=True, exist_ok=True)
        import contextlib
        import io

        for name in names:
            builder, _ = ops[name]
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                builder().explain("formatted")
            (PLANS_DIR / f"{name}_{explain_suffix}.txt").write_text(buf.getvalue())
            print(f"wrote plans/r07/{name}_{explain_suffix}.txt", file=sys.stderr)
        spark.stop()
        return

    results = {}
    for name in names:
        builder, action = ops[name]
        times = []
        for i in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            action(builder())
            times.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        results[name] = {"min": min(times), "samples": times}
        print(f"[extra] {name}: min={min(times)} samples={times}", file=sys.stderr)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
