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

Two order-fairness controls (added after the 08:26 UTC run produced a
bogus 4.7x "regression"): (1) the leg that runs SECOND in a pair
starts the instant the first leg's 40 GB-heap JVM finishes its job —
post-job GC/cleanup wake from the idle JVM steals cores from the
second leg (solo reps of the same build read 43 s where second-leg
reps read a rock-stable ~135 s), so the parent now sleeps SETTLE_SEC
between legs; and (2) the leg ORDER alternates every pair, so any
residual co-residency penalty hits both builds equally. Per-order
minima are reported so the order effect itself is visible.

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
SETTLE_SEC = 15.0  # let the first leg's JVM GC-quiesce before the second runs

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


def main() -> None:
    p4 = start("r4", R4_PATH)
    p6 = start("r6", str(REPO))
    for p, tag in ((p4, "r4"), (p6, "r6")):
        msg = json.loads(p.stdout.readline())
        assert msg.get("ready"), msg
        print(f"[ab] {tag} session ready", file=sys.stderr, flush=True)
    # one warm rep each (codegen/AQE planning; never counted)
    for p, tag in ((p4, "r4"), (p6, "r6")):
        w = rep(p)
        print(f"[ab] {tag} warm: {w['sec']}s rows={w['rows']}",
              file=sys.stderr, flush=True)

    pairs: list[dict] = []
    t_start = time.monotonic()
    rows_ref = None
    order_flip = False
    while (sum(x["clean"] for x in pairs) < N_CLEAN
           and time.monotonic() - t_start < BUDGET_MIN * 60):
        pre = cpu_calibration_mt_sec() / CALIB_MT_REF_SEC
        if pre >= 1.5:
            print(f"[ab] dirty pre-probe {pre:.2f}, backing off",
                  file=sys.stderr, flush=True)
            time.sleep(20)
            continue
        first, second = ((p6, p4) if order_flip else (p4, p6))
        order = "r6-first" if order_flip else "r4-first"
        order_flip = not order_flip
        x = rep(first)
        time.sleep(SETTLE_SEC)
        y = rep(second)
        a, b = ((y, x) if order == "r6-first" else (x, y))
        post = cpu_calibration_mt_sec() / CALIB_MT_REF_SEC
        if rows_ref is None:
            rows_ref = (a["rows"], b["rows"])
        assert (a["rows"], b["rows"]) == rows_ref
        rec = {"r4_sec": a["sec"], "r6_sec": b["sec"], "order": order,
               "pre": round(pre, 3), "post": round(post, 3),
               "clean": pre < 1.5 and post < 2.0}
        pairs.append(rec)
        print(f"[ab] pair r4={a['sec']}s r6={b['sec']}s ({order}) "
              f"pre={pre:.2f} post={post:.2f} clean={rec['clean']}",
              file=sys.stderr, flush=True)
    for p in (p4, p6):
        try:
            p.stdin.write("quit\n")
            p.stdin.flush()
        except Exception:
            pass
    clean = [x for x in pairs if x["clean"]]

    def _min(key, order=None):
        xs = [x[key] for x in clean if order is None or x["order"] == order]
        return min(xs, default=None)

    out = {
        "n_right": N_POINTS, "n_left": N_POINTS // LEFT_EVERY, "k": KNN_K,
        "cpus": CPUS, "r4_rows": rows_ref[0] if rows_ref else None,
        "r6_rows": rows_ref[1] if rows_ref else None,
        "r4_clean_min": _min("r4_sec"), "r6_clean_min": _min("r6_sec"),
        "r4_clean_min_first": _min("r4_sec", "r4-first"),
        "r6_clean_min_first": _min("r6_sec", "r6-first"),
        "n_clean_pairs": len(clean), "pairs": pairs,
    }
    print(json.dumps(out), flush=True)
    if clean:
        md = REPO / "BENCH" / "BASELINE.md"
        stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
        ratio = out["r6_clean_min"] / out["r4_clean_min"]
        md.open("a").write(f"""

## knn_join r4-vs-r6 same-window A/B {stamp} ({N_POINTS:,} right / {N_POINTS // LEFT_EVERY:,} left k={KNN_K}, local[{CPUS}], alternating probe-bracketed pairs)

| build | clean-min sec | clean-min when first in pair | note |
|---|---|---|---|
| round-4 code (1defefe) | {out['r4_clean_min']} | {out['r4_clean_min_first']} | x4/x8 escalation rounds |
| current code | {out['r6_clean_min']} | {out['r6_clean_min_first']} | certified <= 2 rounds |

r6/r4 wall-clock ratio **{ratio:.3f}** over {len(clean)} clean pair(s);
output rows r4={out['r4_rows']:,} r6={out['r6_rows']:,} (both exact).
Pairs: {json.dumps(pairs)}
Both builds alternate single reps inside one weather window (pair-level
pre < 1.5x / post < 2.0x probes, {SETTLE_SEC:.0f} s GC-settle between
legs, leg order alternating per pair), same persisted 16M synth input,
same session conf — the r4 35.4 s (mt 5.84) vs r5 43.6-46.5 s (clean)
question from VERDICT r5 is settled by this table, not by cross-window
numbers. The "when first in pair" column isolates any residual
co-resident-JVM penalty on the second leg.
""")
        print(f"appended to {md}")


if __name__ == "__main__":
    main()
