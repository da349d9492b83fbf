"""Clean-rep knn_join scaling evidence for hosts with fast-flipping
multicore weather (observed: factor 1.0 -> 49 within seconds, spikes
lasting minutes to an hour).

The gate-then-run protocol of scaling_bench_ops.py guarantees a clean
LAUNCH but not a clean RUN — the 16:46 run's @8 leg gated for the full
1 h cap, launched into a 49x spike, and produced only junk reps. This
script instead holds one Spark session per level and, inside it,
brackets every rep with weather probes: a rep counts as CLEAN only if
the probe immediately before is < 1.5x AND the probe immediately after
is < 2.0x the calibration reference. It keeps trying (20 s backoff)
until it has N_CLEAN clean reps or the per-level time budget runs out,
then reports min over clean reps — min over *verified-clean* reps
rather than min over 3 blind ones. knn_join only (the LSH kernel's
criterion is already met on gated runs); production disk-shuffle conf,
same as scaling_bench_ops.py.

Usage: python scripts/knn_clean_rep_bench.py [n_points] [n_clean] [budget_min]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from geo_index_spark.benchwork import CALIB_MT_REF_SEC

N_POINTS = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
N_CLEAN = int(sys.argv[2]) if len(sys.argv) > 2 else 2
BUDGET_MIN = float(sys.argv[3]) if len(sys.argv) > 3 else 40.0
LEFT_EVERY = 64
KNN_K = 3

JOB = r"""
import json, sys, time
from pyspark.sql import functions as F
from geo_index_spark.session import get_spark
from geo_index_spark.operators.knn import knn_join
from geo_index_spark.benchwork import (
    BENCH_CONF, SYNTH_BOUNDS, CALIB_MT_REF_SEC, cpu_calibration_mt_sec,
    synth_points,
)

cpus = int(sys.argv[1]); n_pts = int(sys.argv[2]); k = int(sys.argv[3])
left_every = int(sys.argv[4]); n_clean = int(sys.argv[5])
budget_s = float(sys.argv[6]) * 60.0
conf = {k_: v for k_, v in BENCH_CONF.items()
        if k_ not in ("spark.local.dir", "spark.shuffle.compress",
                      "spark.shuffle.spill.compress")}
spark = get_spark(
    f"knn-clean-{cpus}", master=f"local[{cpus}]",
    shuffle_partitions=cpus * 8, extra_conf=conf,
)
spark.sparkContext.setLogLevel("ERROR")
right = synth_points(spark, n_pts).persist(); right.count()
left = right.filter(F.col("row_id") % left_every == 0).persist(); left.count()
# warm rep: pays whole-stage codegen + AQE planning once so clean reps
# measure steady state (weather-agnostic, never counted)
t0 = time.perf_counter()
rows = knn_join(left, right, k, bounds=SYNTH_BOUNDS, right_count=n_pts).count()
print(f"[leg {cpus}] warm rep: {time.perf_counter()-t0:.1f}s",
      file=sys.stderr, flush=True)

reps = []
t_start = time.monotonic()
while (sum(r["clean"] for r in reps) < n_clean
       and time.monotonic() - t_start < budget_s):
    pre = cpu_calibration_mt_sec() / CALIB_MT_REF_SEC
    if pre >= 1.5:
        print(f"[leg {cpus}] dirty pre-probe {pre:.2f}, backing off",
              file=sys.stderr, flush=True)
        time.sleep(20)
        continue
    t0 = time.perf_counter()
    n = knn_join(left, right, k, bounds=SYNTH_BOUNDS, right_count=n_pts).count()
    t = time.perf_counter() - t0
    post = cpu_calibration_mt_sec() / CALIB_MT_REF_SEC
    assert n == rows
    rec = {"sec": round(t, 3), "pre": round(pre, 3), "post": round(post, 3),
           "clean": pre < 1.5 and post < 2.0}
    reps.append(rec)
    print(f"[leg {cpus}] rep {t:.1f}s pre={pre:.2f} post={post:.2f} "
          f"clean={rec['clean']}", file=sys.stderr, flush=True)
clean = [r["sec"] for r in reps if r["clean"]]
print(json.dumps({
    "cpus": cpus, "n_right": n_pts, "knn_rows": rows,
    "clean_min_sec": min(clean) if clean else None,
    "n_clean": len(clean), "reps": reps,
}))
spark.stop()
"""


def run(cpus: int) -> dict:
    import os

    env = {**os.environ, "SPARK_DRIVER_MEM": "40g"}
    out = subprocess.run(
        [sys.executable, "-c", JOB, str(cpus), str(N_POINTS), str(KNN_K),
         str(LEFT_EVERY), str(N_CLEAN), str(BUDGET_MIN)],
        stdout=subprocess.PIPE, stderr=None, text=True,
        cwd=str(Path(__file__).resolve().parents[1]),
        timeout=int(BUDGET_MIN * 60 + 3600), env=env,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"leg cpus={cpus} produced no JSON")
    return json.loads(lines[-1])


def main() -> None:
    r8 = run(8)
    print(json.dumps(r8), flush=True)
    r32 = run(32)
    print(json.dumps(r32), flush=True)
    md = Path(__file__).resolve().parents[1] / "BENCH" / "BASELINE.md"
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    if r8["clean_min_sec"] and r32["clean_min_sec"]:
        thr8 = N_POINTS / r8["clean_min_sec"]
        thr32 = N_POINTS / r32["clean_min_sec"]
        eff = thr32 / (4 * thr8)
        verdict = (
            f"| knn_join right rows/s | {thr8:,.0f} | {thr32:,.0f} | "
            f"**{eff:.3f}** |"
        )
    else:
        verdict = "(insufficient clean reps — see rep lists)"
    md.open("a").write(f"""

## knn_join clean-rep scaling re-measure {stamp} ({N_POINTS:,} right / {N_POINTS // LEFT_EVERY:,} left k={KNN_K}, min over probe-bracketed clean reps, warm)

| metric | local[8] | local[32] | efficiency (32 vs 4x8) |
|---|---|---|---|
{verdict}

Reps @8: {json.dumps(r8["reps"])}
Reps @32: {json.dumps(r32["reps"])}
Clean = pre-probe < 1.5x and post-probe < 2.0x; min over clean reps
({r8["n_clean"]} @8, {r32["n_clean"]} @32); one uncounted warm rep per
leg absorbs codegen/AQE planning. Output rows {r8["knn_rows"]:,}
identical at both levels.
""")
    print(f"appended to {md}")


if __name__ == "__main__":
    main()
