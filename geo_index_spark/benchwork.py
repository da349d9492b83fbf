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

Known residual, measured: at the same eps/grid/conf the 64M-row
evidence run reports ~1.5-2x higher input rows/s than bench.py's 16M
default — per-task amortization (250k vs 62k boxes per task across
256 shuffle partitions) plus host variance (back-to-back identical
16M runs swing 10.4-13.3s). Compare BENCH_r*.json round-over-round at
equal synth_rows; compare against BENCH/BASELINE.md only via the
normalized field and with this offset in mind.
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
