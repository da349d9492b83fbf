"""Shared benchmark workload — the ONE definition of the synthetic
web-geotag throughput job, imported by both bench.py (per-round driver
bench) and scripts/scaling_bench.py (local[8] vs local[32] scaling
evidence) so the two can never drift apart (round-1 lesson: bench.py
ran eps=5e-4/grid=17 while the evidence run used eps=1e-4/grid=18 —
~25x fewer candidate pairs per row, which made the headline numbers
incomparable).

Also provides a single-thread CPU calibration probe: the sandbox host's
CPU speed swings ~2.5x between runs hours apart, so every benchmark
JSON carries ``cpu_calib_sec`` (a fixed pure-Python xorshift loop) and
``cpu_factor`` (vs the recorded solo-run reference) — divide a
throughput by ``cpu_factor`` to normalize for host weather.

Measured weather magnitude (identical 16M workload, same code, runs
minutes apart): raw join throughput spanned 1.07-5.78 M rows/s; the
single-thread factor stayed ~1.0-1.3 throughout, i.e. the swing is
multicore steal/bandwidth, which is why the MULTICORE probe exists and
runs adjacent to the synth stages with the same min-of-3 statistic.
In a good window bench.py's 16M default matches the 64M evidence run's
raw throughput (5.78 vs 5.67 M rows/s). Normalized values are
indicative, not precise — the probe and the stage can land in
different weather within one run. Compare BENCH_r*.json
round-over-round at equal synth_rows, prefer raw value + both factors.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

# the synthetic workload parameters — change them HERE or nowhere
SYNTH_EPS = 0.0001  # box half-width in degrees
SYNTH_GRID_LEVEL = 18
SYNTH_BOUNDS = (-180.0, -85.0, 180.0, 85.0)

# measured local-mode bench config (PLANS.md / BENCH/BASELINE.md):
# AQE byte-based partition coalescing starves compute-dense join stages;
# lz4 shuffle compression dominates CPU on a RAM-backed shuffle dir.
BENCH_CONF = {
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.shuffle.compress": "false",
    "spark.shuffle.spill.compress": "false",
    "spark.local.dir": "/dev/shm/spark-local",
}

# reference calibration time measured on this host during the round-2
# solo evidence run (see BENCH/BASELINE.md); cpu_factor = calib/REF,
# > 1 means the current host is running slower than the evidence host
CALIB_REF_SEC = 0.52
_CALIB_ITERS = 2_000_000


# multicore reference (16 procs x xorshift) measured on the evidence
# host; the single-thread probe misses multicore steal — dense 32-way
# stages (the synth join/build) slow down 2-3x while 1-thread work is
# unaffected, so BOTH factors are reported
CALIB_MT_REF_SEC = 0.50  # min-of-3, includes Pool startup
_CALIB_MT_PROCS = 16


def _mt_probe_work(_seed: int) -> float:
    """Per-process mixed workload: numpy streaming (memory bandwidth)
    + a short xorshift burst (scalar CPU) — the two resources a Spark
    shuffle stage actually contends on."""
    import numpy as np

    a = np.arange(8_000_000, dtype=np.float64)  # 64 MB
    s = 0.0
    for _ in range(4):
        a = a * 1.000001 + 0.5
        s += float(a[::4096].sum())
    s += cpu_calibration_sec(_CALIB_ITERS // 4)
    return s


def cpu_calibration_mt_sec(procs: int = _CALIB_MT_PROCS, reps: int = 3) -> float:
    """Multicore probe: ``procs`` processes each streaming 64 MB of
    numpy work + a scalar burst; wall time rises with the host
    steal/bandwidth contention that only dense parallel stages feel.
    Min-of-``reps`` — the SAME statistic as the bench stages it
    normalizes (back-to-back probe runs swing 1.6-22s on this host)."""
    import multiprocessing as mp

    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        with mp.Pool(procs) as pool:
            pool.map(_mt_probe_work, range(procs))
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
    return best


def cpu_calibration_sec(iters: int = _CALIB_ITERS) -> float:
    """Single-thread integer-burn probe: a fixed xorshift64 loop in
    pure Python. Deterministic work, scalar-CPU-bound — tracks the
    host speed component that JVM codegen throughput also sees."""
    t0 = time.perf_counter()
    x = 88172645463325252
    for _ in range(iters):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    return time.perf_counter() - t0


def synth_points(spark, n: int):
    """Deterministic skewed web-geotag point table generated JVM-side
    (spark.range + xxhash64-derived coordinates; 80% clustered on 50
    city centers — real skew, no driver data, no disk read)."""
    base = spark.range(n).select(
        F.col("id").alias("row_id"),
        (F.pmod(F.xxhash64("id"), F.lit(50))).alias("city"),
        ((F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000000)) / 1e6)).alias("u1"),
        ((F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000000)) / 1e6)).alias("u2"),
        ((F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1000000)) / 1e6)).alias("u3"),
    )
    cx = (F.pmod(F.xxhash64(F.col("city")), F.lit(360000)) / 1000.0) - 180.0
    cy = (F.pmod(F.xxhash64(F.col("city"), F.lit(7)), F.lit(130000)) / 1000.0) - 60.0
    clustered = F.col("u3") < 0.8
    return base.select(
        "row_id",
        F.when(clustered, cx + (F.col("u1") - 0.5) * 0.2)
        .otherwise(F.col("u1") * 360.0 - 180.0)
        .alias("x"),
        F.when(clustered, cy + (F.col("u2") - 0.5) * 0.2)
        .otherwise(F.col("u2") * 170.0 - 85.0)
        .alias("y"),
    )


def synth_embeddings(spark, n: int, dim: int = 32):
    """Deterministic JVM-side embedding table (uniform in [-1, 1]^dim
    via xxhash64 — no driver data, no disk) for benchmarking the
    bucketed near-dup path at row counts where all-pairs is infeasible
    (n=100k -> 5e9 pairs)."""
    cols = [
        (
            F.pmod(F.xxhash64("id", F.lit(j)), F.lit(1_000_000)) / 500000.0 - 1.0
        ).alias(f"c{j}")
        for j in range(dim)
    ]
    base = spark.range(n).select(F.col("id").alias("vec_id"), *cols)
    return base.select(
        "vec_id", F.array(*[F.col(f"c{j}") for j in range(dim)]).alias("embedding")
    )


def synth_boxes(spark, n: int, eps: float = SYNTH_EPS):
    """(boxes, points) for the synthetic self-join workload."""
    pts = synth_points(spark, n)
    boxes = pts.select(
        "row_id",
        (F.col("x") - eps).alias("minx"),
        (F.col("y") - eps).alias("miny"),
        (F.col("x") + eps).alias("maxx"),
        (F.col("y") + eps).alias("maxy"),
    )
    return boxes, pts
