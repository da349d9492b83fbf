"""Benchmark harness — prints ONE JSON line.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query is forced
with a noop-equivalent action (count / small agg collect) after a warm
session; times are wall-clock seconds per query.

Throughput metric (BASELINE.json): spatial-join M input rows/sec =
(|L| + |R|) / t over the events self-join. The scaling-efficiency
evidence (local[8] vs local[32]) is produced by scripts/scaling_bench.py
which runs THIS file twice with different SPARK_GRAFT_CPUS and writes
BENCH/BASELINE.md.
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
    CALIB_MT_REF_SEC,
    CALIB_REF_SEC,
    SYNTH_BOUNDS,
    SYNTH_GRID_LEVEL,
    cpu_calibration_mt_sec,
    cpu_calibration_sec,
    synth_boxes,
)
from geo_index_spark.operators import knn, spatial_join, within
from geo_index_spark.operators.partitioning import hilbert_partition
from geo_index_spark.operators.search import kd_range
from geo_index_spark.operators.tiling import quad_cell_col
from geo_index_spark.session import get_spark
from geo_index_spark.textops import dedup as D
from geo_index_spark.textops import ann as A

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


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


# the synth workload definition (eps / grid_level / bounds / generator)
# is SHARED with scripts/scaling_bench.py via geo_index_spark.benchwork,
# so BENCH_r*.json and BENCH/BASELINE.md always measure the same job
N_SYNTH = int(os.environ.get("SPARK_GRAFT_SYNTH_ROWS", "16000000"))
SYNTH_REPS = int(os.environ.get("SPARK_GRAFT_SYNTH_REPS", "3"))


def main() -> None:
    calib = cpu_calibration_sec()
    spark = get_spark(
        "bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS * 8, 32),  # matches scaling_bench.py
        extra_conf=BENCH_CONF,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers
    ev = _events_pts(spark)
    n_events = ev.count()

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn, warm=False):
        if warm:
            # sub-second queries are dominated by first-call planning /
            # codegen noise (r5 driver run read cosine_topk 0.78 s vs a
            # clean 0.31 s) — one untimed warm rep pins the measurement
            # to steady-state execution (VERDICT r5 Next #5)
            fn()
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr)
        return out

    # 1. Hilbert clustering (build stage): partition + sort + materialize
    timed(
        "hilbert_build",
        lambda: hilbert_partition(ev, CPUS, cols=("x", "y")).write.mode("overwrite").format(
            "noop"
        ).save(),
    )

    # 2. bbox search
    timed("bbox_search", lambda: kd_range(ev, 100, 20, 200, 80).count(), warm=True)

    # 3. radius search
    timed("within", lambda: within(ev, 250.0, 75.0, 40.0).count(), warm=True)

    # 4. kNN
    timed("knn", lambda: knn(ev, 123.45, 67.0, 100, id_col="event_id").collect(), warm=True)

    # 5. spatial self-join (headline) — skewless grid, AQE on
    boxes = _events_boxes(spark)
    n_pairs = timed(
        "spatial_join_events", lambda: spatial_join(boxes, boxes, grid_level=7).count()
    )
    t_join = timings["spatial_join_events"]
    extras["join_input_mrows_per_sec"] = round((2 * n_events / 1e6) / t_join, 4)
    extras["join_output_pairs"] = int(n_pairs)
    extras["join_output_mpairs_per_sec"] = round((n_pairs / 1e6) / t_join, 4)

    # 6. point-vs-box join, broadcast small side
    parts = spark.read.parquet(f"{SF_DIR}/part.parquet").select(
        F.col("p_partkey").alias("row_id"),
        F.col("p_size").cast("double").alias("minx"),
        (F.col("p_retailprice") / 10.0).alias("miny"),
        (F.col("p_size") + F.lit(3.0)).cast("double").alias("maxx"),
        (F.col("p_retailprice") / 10.0 + F.lit(3.0)).alias("maxy"),
    )
    pts_as_boxes = _events_boxes(spark, half=0.0)
    timed(
        "spatial_join_broadcast",
        lambda: spatial_join(
            pts_as_boxes, parts, grid_level=5, broadcast_side="right"
        ).count(),
    )

    # 7. tile assignment + rollup
    timed(
        "tile_rollup",
        lambda: ev.groupBy(
            quad_cell_col(F.col("x"), F.col("y"), 8, (0.0, 0.0, 500.0, 150.0)).alias("c")
        )
        .count()
        .count(),
        warm=True,
    )

    # 8. dedup: minhash-LSH near-dup pairs over documents — the
    # md5-hashed oracle-grade variant AND the xxhash64 production path
    # (same banding + refine; ~5x cheaper hashing)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed(
        "minhash_lsh_docs",
        lambda: D.minhash_near_dup_pairs(docs, n=4, num_hashes=16, tau_num=1, tau_den=2).count(),
    )
    timed(
        "minhash_lsh_docs_fast",
        lambda: D.minhash_near_dup_pairs_fast(docs, n=4, num_hashes=16, tau_num=1, tau_den=2).count(),
    )

    # 8b. HEADLINE: web-scale synthetic join + hilbert build — the SAME
    # workload as the scaling evidence run (benchwork: eps=1e-4,
    # grid_level=18), min-of-N per the noisy-host protocol (virtio disk
    # + CPU weather swing individual runs 2x+). Drop the minhash
    # shingle caches first so the headline runs with the same memory
    # headroom as the evidence run's fresh session.
    spark.catalog.clearCache()
    # multicore weather probe ADJACENT to the stages it normalizes —
    # contention moves on minute timescales, a session-start reading
    # would be stale by now
    calib_mt = cpu_calibration_mt_sec()
    sb, sp = synth_boxes(spark, N_SYNTH)
    sb = sb.persist()
    sb.count()

    def min_of(name, fn):
        best = None
        for _ in range(SYNTH_REPS):
            t0 = time.perf_counter()
            out = fn()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        timings[name] = round(best, 4)
        print(f"[bench] {name}: {timings[name]}s (min of {SYNTH_REPS})", file=sys.stderr)
        return out

    n_pairs_synth = min_of(
        "spatial_join_synth",
        lambda: spatial_join(
            sb, sb, bounds=SYNTH_BOUNDS, grid_level=SYNTH_GRID_LEVEL
        ).count(),
    )
    t = timings["spatial_join_synth"]
    extras["synth_rows"] = N_SYNTH
    extras["synth_join_input_mrows_per_sec"] = round((2 * N_SYNTH / 1e6) / t, 3)
    extras["synth_join_pairs"] = int(n_pairs_synth)
    min_of(
        "hilbert_build_synth",
        lambda: hilbert_partition(sp, CPUS * 2, cols=("x", "y"), bounds=SYNTH_BOUNDS)
        .write.mode("overwrite")
        .format("noop")
        .save(),
    )
    extras["synth_build_mrows_per_sec"] = round(
        (N_SYNTH / 1e6) / timings["hilbert_build_synth"], 3
    )
    sb.unpersist()

    # 8c. exact kNN join over the same skewed synth points (round-4
    # per-left-radius rework: two-grid density start, level-bucketed
    # rounds) — 1/64th of the points probe the full table for k=3
    from geo_index_spark.operators.knn import knn_join

    knn_lefts = sp.filter(F.col("row_id") % 64 == 0)
    min_of(
        "knn_join_synth",
        lambda: knn_join(
            knn_lefts, sp, 3, bounds=SYNTH_BOUNDS, right_count=N_SYNTH
        ).count(),
    )
    extras["knn_join_right_rows_per_sec"] = round(
        N_SYNTH / timings["knn_join_synth"], 1
    )

    # 9. ANN: brute cosine top-k over embeddings
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    import numpy as np

    q = [round(float(v), 4) for v in np.random.default_rng(0).standard_normal(64)]
    timed("cosine_topk", lambda: A.cosine_topk(emb, q, 25).collect(), warm=True)

    # 10. bucketed embedding near-dup pairs at a row count where the
    # all-pairs twin is infeasible (100k vectors -> 5e9 pairs): Arrow
    # matmul band keys + banded candidates + Arrow cosine refine. The
    # oracle-grade HOF twin is driver-gated (lsh_near_dup_emb); this
    # benches the production kernel.
    from geo_index_spark.benchwork import synth_embeddings

    semb = synth_embeddings(spark, 100_000, 32)
    timed(
        "lsh_near_dup_synth_fast",
        lambda: A.lsh_cosine_near_dup_pairs_fast(
            semb, tau=0.95, dim=32, n_bands=4, n_planes=16
        ).count(),
    )

    # host-weather normalization: divide throughputs by cpu_factor to
    # compare round-over-round (cpu_factor > 1 = this host ran slower
    # than the evidence-run host)
    extras["cpu_calib_sec"] = round(calib, 4)
    extras["cpu_factor"] = round(calib / CALIB_REF_SEC, 3)
    # the MULTICORE factor is the one that tracks the dense 32-way synth
    # stages — host steal slows them 2-3x while 1-thread work is flat
    extras["cpu_calib_mt_sec"] = round(calib_mt, 4)
    extras["cpu_factor_mt"] = round(calib_mt / CALIB_MT_REF_SEC, 3)
    extras["synth_join_mrows_per_sec_normalized"] = round(
        extras["synth_join_input_mrows_per_sec"] * extras["cpu_factor_mt"], 3
    )

    total = round(sum(timings.values()), 4)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    # reproducibility band: identical runs swing up to ~5x with host
    # multicore steal (benchwork.py measurements). Tag the JSON so
    # round-over-round comparisons auto-select comparable windows:
    # compare raw `value` only between runs tagged "ok"; otherwise use
    # the cpu_factor_mt-normalized number.
    weather = "bad" if extras["cpu_factor_mt"] > 2.0 else "ok"
    print(
        json.dumps(
            {
                "metric": "spatial_join_input_mrows_per_sec",
                "value": extras["synth_join_input_mrows_per_sec"],
                "unit": "Mrows/sec",
                "total_sec": total,
                "weather": weather,
                "queries": timings,
                "extras": extras,
                "cpus": CPUS,
                "n_events": n_events,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
