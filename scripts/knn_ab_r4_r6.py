"""Same-window A/B: round-4 knn_join vs current code at the 16M bench
shape (VERDICT r5 Next #2).

`knn_join_synth` read 35.4 s on the r4 code under BAD weather (mt 5.84)
and 43.6-46.5 s on the r5 certified-round code under clean weather —
formally incomparable under the repo's own protocol. This script makes
the comparison airtight: TWO long-lived child processes (one with
PYTHONPATH at the r4 worktree, one at the current repo), each holding a
warm local[32] session over the identical persisted 16M synth dataset,
and the parent alternates single reps r4, r6, r4, r6, ... inside ONE
weather window, bracketing every PAIR with multicore probes. A pair
counts as clean only if pre < 1.5x and post < 2.0x. Alternation means
any residual drift hits both builds symmetrically.

PROTOCOL v3 — SOLO BLOCK-ALTERNATING (the two co-resident-JVM designs
both produced distorted r6 legs and are retired): with two 40 GB-heap
local[32] sessions resident, the current code read a stable 117-340 s
per rep — even running FIRST in a pair after a clean pre-probe (1.04)
with a 15 s GC-settle — while the SAME build reads 42.8 s warm solo
(GEO_KNN_DEBUG decomposition: round 0 = 15.6 s + round 1 = 21.2 s),
matching the r5 clean bench 43.6 s. Mere co-residency distorts the
certified-round build ~3x (its extra pandas_udf worker pool +
checkpoint storage lose far more to a resident sibling JVM than the
escalation build's plain shuffles do), so no same-instant pairing can
be fair. v3 runs ONE JVM at a time: blocks alternate r4, r6, r4, r6
...; each block starts a fresh session, synths + persists the
identical deterministic 16M input, takes one uncounted warm rep, then
collects probe-bracketed reps (pre < 1.5x, post < 2.0x) until it has
BLOCK_CLEAN clean reps or BLOCK_BUDGET_MIN expires, then the JVM
exits before the other build's block starts. Weather drift between
blocks is absorbed by alternation + min-over-clean-reps per build
across all blocks.

Usage: python scripts/knn_ab_r4_r6.py [r4_path] [n_points] [n_clean_pairs] [budget_min]
Default r4 worktree path: /tmp/r4code (git worktree add /tmp/r4code 1defefe).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from geo_index_spark.benchwork import CALIB_MT_REF_SEC, cpu_calibration_mt_sec

R4_PATH = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r4code"
N_POINTS = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
N_CLEAN = int(sys.argv[3]) if len(sys.argv) > 3 else 3
BUDGET_MIN = float(sys.argv[4]) if len(sys.argv) > 4 else 45.0
CPUS = 32
LEFT_EVERY = 64
KNN_K = 3
BLOCK_CLEAN = 2  # clean reps to collect per block before rotating
BLOCK_BUDGET_MIN = 10.0  # per-block wall budget (excl. session setup + warm)

CHILD = r"""
import json, sys, time
from pyspark.sql import functions as F
from geo_index_spark.session import get_spark
from geo_index_spark.operators.knn import knn_join
from geo_index_spark.benchwork import BENCH_CONF, SYNTH_BOUNDS, synth_points

tag, n_pts, cpus, k, left_every = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])
)
spark = get_spark(
    f"knn-ab-{tag}", master=f"local[{cpus}]",
    shuffle_partitions=cpus * 8, extra_conf=BENCH_CONF,
)
spark.sparkContext.setLogLevel("ERROR")
right = synth_points(spark, n_pts).persist(); right.count()
left = right.filter(F.col("row_id") % left_every == 0).persist(); left.count()
print(json.dumps({"tag": tag, "ready": True}), flush=True)
for line in sys.stdin:
    if line.strip() == "quit":
        break
    t0 = time.perf_counter()
    n = knn_join(left, right, k, bounds=SYNTH_BOUNDS).count()
    print(json.dumps({"tag": tag, "sec": round(time.perf_counter() - t0, 3),
                      "rows": int(n)}), flush=True)
spark.stop()
"""


def start(tag: str, pypath: str) -> subprocess.Popen:
    env = {**os.environ, "PYTHONPATH": pypath, "SPARK_DRIVER_MEM": "40g"}
    return subprocess.Popen(
        [sys.executable, "-c", CHILD, tag, str(N_POINTS), str(CPUS),
         str(KNN_K), str(LEFT_EVERY)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=sys.stderr,
        text=True, bufsize=1, cwd="/tmp", env=env,
    )


def rep(p: subprocess.Popen) -> dict:
    p.stdin.write("rep\n")
    p.stdin.flush()
    line = p.stdout.readline()
    if not line:
        raise RuntimeError("child died")
    return json.loads(line)


def run_block(tag: str, pypath: str, reps: list[dict],
              rows_ref: dict) -> None:
    """One solo session: setup, warm, probe-bracketed reps, exit."""
    p = start(tag, pypath)
    try:
        msg = json.loads(p.stdout.readline())
        assert msg.get("ready"), msg
        w = rep(p)
        print(f"[ab] {tag} block warm: {w['sec']}s rows={w['rows']}",
              file=sys.stderr, flush=True)
        if tag in rows_ref:
            assert w["rows"] == rows_ref[tag]
        rows_ref[tag] = w["rows"]
        t0 = time.monotonic()
        n_clean = 0
        while (n_clean < BLOCK_CLEAN
               and time.monotonic() - t0 < BLOCK_BUDGET_MIN * 60):
            pre = cpu_calibration_mt_sec() / CALIB_MT_REF_SEC
            if pre >= 1.5:
                print(f"[ab] {tag} dirty pre-probe {pre:.2f}, backing off",
                      file=sys.stderr, flush=True)
                time.sleep(15)
                continue
            r = rep(p)
            post = cpu_calibration_mt_sec() / CALIB_MT_REF_SEC
            rec = {"tag": tag, "sec": r["sec"], "pre": round(pre, 3),
                   "post": round(post, 3),
                   "clean": pre < 1.5 and post < 2.0}
            reps.append(rec)
            n_clean += rec["clean"]
            print(f"[ab] {tag} rep {r['sec']}s pre={pre:.2f} "
                  f"post={post:.2f} clean={rec['clean']}",
                  file=sys.stderr, flush=True)
    finally:
        try:
            p.stdin.write("quit\n")
            p.stdin.flush()
        except Exception:
            pass
        p.wait(timeout=120)


def main() -> None:
    reps: list[dict] = []
    rows_ref: dict = {}
    t_start = time.monotonic()
    tags = {"r4": R4_PATH, "r6": str(REPO)}
    i = 0

    def n_clean(tag):
        return sum(1 for x in reps if x["tag"] == tag and x["clean"])

    while (min(n_clean("r4"), n_clean("r6")) < N_CLEAN
           and time.monotonic() - t_start < BUDGET_MIN * 60):
        tag = ("r4", "r6")[i % 2]
        i += 1
        if n_clean(tag) >= N_CLEAN:
            continue
        print(f"[ab] === block {i}: {tag} (solo) ===",
              file=sys.stderr, flush=True)
        run_block(tag, tags[tag], reps, rows_ref)
    clean = [x for x in reps if x["clean"]]

    def _min(tag):
        return min((x["sec"] for x in clean if x["tag"] == tag),
                   default=None)

    out = {
        "n_right": N_POINTS, "n_left": N_POINTS // LEFT_EVERY, "k": KNN_K,
        "cpus": CPUS, "r4_rows": rows_ref.get("r4"),
        "r6_rows": rows_ref.get("r6"),
        "r4_clean_min": _min("r4"), "r6_clean_min": _min("r6"),
        "n_clean_r4": n_clean("r4"), "n_clean_r6": n_clean("r6"),
        "reps": reps,
    }
    print(json.dumps(out), flush=True)
    if out["r4_clean_min"] and out["r6_clean_min"]:
        md = REPO / "BENCH" / "BASELINE.md"
        stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
        ratio = out["r6_clean_min"] / out["r4_clean_min"]
        md.open("a").write(f"""

## knn_join r4-vs-r6 solo block-alternating A/B {stamp} ({N_POINTS:,} right / {N_POINTS // LEFT_EVERY:,} left k={KNN_K}, local[{CPUS}])

| build | clean-min sec | clean reps | note |
|---|---|---|---|
| round-4 code (1defefe) | {out['r4_clean_min']} | {out['n_clean_r4']} | x4/x8 escalation rounds |
| current code | {out['r6_clean_min']} | {out['n_clean_r6']} | certified <= 2 rounds |

r6/r4 wall-clock ratio **{ratio:.3f}** (min over clean reps per build);
output rows r4={out['r4_rows']:,} r6={out['r6_rows']:,} (both exact).
Reps: {json.dumps(reps)}
Protocol v3: ONE JVM at a time (co-resident sessions distort the
certified build ~3x — see the invalidation notes above), blocks
alternate builds, each block = fresh session + identical deterministic
synth input + uncounted warm rep + probe-bracketed reps (pre < 1.5x,
post < 2.0x). This settles the r4 35.4 s (mt 5.84) vs r5 43.6-46.5 s
(clean) question from VERDICT r5.
""")
        print(f"appended to {md}")


if __name__ == "__main__":
    main()
