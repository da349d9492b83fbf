"""Micro-decomposition of the knn_join tail-round candidate job: times
each pipeline layer (cached scan, cell computation, semi-join filter,
level explode, broadcast probe, distance filter) separately on the 32M
synth shape so the ~12 s candidate job can be attributed to a layer.
Diagnostic only — not a benchmark."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from geo_index_spark.benchwork import BENCH_CONF, SYNTH_BOUNDS, synth_points
from geo_index_spark.session import get_spark

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N_PTS = int(sys.argv[2]) if len(sys.argv) > 2 else 32_000_000

conf = {
    k_: v
    for k_, v in BENCH_CONF.items()
    if k_
    not in (
        "spark.local.dir",
        "spark.shuffle.compress",
        "spark.shuffle.spill.compress",
    )
}
conf["spark.ui.showConsoleProgress"] = "false"
spark = get_spark(
    f"knn-micro-{CPUS}",
    master=f"local[{CPUS}]",
    shuffle_partitions=CPUS * 8,
    extra_conf=conf,
)
spark.sparkContext.setLogLevel("ERROR")

right = synth_points(spark, N_PTS)
from pyspark import StorageLevel

rpts = right.select(
    F.col("row_id").alias("rid"), F.col("x").alias("qx"), F.col("y").alias("qy")
).persist(StorageLevel.MEMORY_AND_DISK)
rpts.count()

lox, loy, hix, hiy = SYNTH_BOUNDS
ext = max(hix - lox, hiy - loy)
nc_d = 512
cell_d = ext / nc_d


def cc(c, lo):
    return F.least(
        F.lit(nc_d - 1), F.greatest(F.lit(0), F.floor((c - F.lit(lo)) / F.lit(cell_d)))
    ).cast("long")


def t(label, df):
    # two reps, report both (first may pay planning)
    for i in range(2):
        t0 = time.perf_counter()
        n = df.count()
        print(
            f"[micro] {label} rep{i}: {time.perf_counter() - t0:.2f}s rows={n}",
            flush=True,
        )


t("bare cached scan", rpts)
t("scan + 2 cells projected", rpts.select((cc(F.col("qx"), lox) * nc_d + cc(F.col("qy"), loy)).alias("c")))

cells = list(range(200000, 202296))  # 2296 cells, same cardinality as probe
cells_df = spark.createDataFrame([(int(c),) for c in cells], "ccell long")
ccell = cc(F.col("qx"), lox) * F.lit(nc_d) + cc(F.col("qy"), loy)
semi = rpts.join(F.broadcast(cells_df), ccell == F.col("ccell"), "left_semi")
t("scan + semi join", semi)

isin_f = rpts.filter(ccell.isin([int(c) for c in cells]))
t("scan + isin filter", isin_f)

levels = [6, 8]
nc_l = F.pow(F.lit(2.0), F.col("_lvl"))
inv_x = nc_l * F.lit(1.0 / (hix - lox))
inv_y = nc_l * F.lit(1.0 / (hiy - loy))


def mcc(v, lo, inv):
    g = F.floor((v - F.lit(lo)) * inv)
    return F.greatest(F.lit(0), F.least(nc_l - 1, g)).cast("long")


re = semi.select(
    "rid",
    "qx",
    "qy",
    F.explode(F.array(*[F.lit(int(l)) for l in levels])).alias("_lvl"),
).withColumn("cell", mcc(F.col("qx"), lox, inv_x) * nc_l.cast("long") + mcc(F.col("qy"), loy, inv_y))
t("semi + explode x2 + cells", re)

re_full = rpts.select(
    "rid",
    "qx",
    "qy",
    F.explode(F.array(*[F.lit(int(l)) for l in levels])).alias("_lvl"),
).withColumn("cell", mcc(F.col("qx"), lox, inv_x) * nc_l.cast("long") + mcc(F.col("qy"), loy, inv_y))
t("FULL explode x2 + cells (no semi)", re_full)

spark.stop()
