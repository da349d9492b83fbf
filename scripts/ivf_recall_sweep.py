"""IVF recall-vs-nprobe sweep (VERDICT r3 #6): measures top-25 recall
against brute force for both quantizers (lowest-id oracle stand-in and
spherical k-means) at nprobe in {1, 2, 4, 8}, on (a) a clustered
fixture — the case IVF exists for — and (b) the driver's random
gaussian embeddings at sf0.01 — IVF's worst case (no structure). The
markdown table is pasted into COVERAGE.md.

Run solo: python scripts/ivf_recall_sweep.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from geo_index_spark.session import get_spark  # noqa: E402
from geo_index_spark.textops import ann as A  # noqa: E402

K = 25
NPROBES = (1, 2, 4, 8)
N_CENTROIDS = 16


def clustered(spark, n_per=200, k_true=16, dim=64, seed=3):
    rng = np.random.default_rng(seed)
    anchors = rng.standard_normal((k_true, dim))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    rows, vecs = [], []
    for c in range(k_true):
        pts = anchors[c] + 0.15 * rng.standard_normal((n_per, dim))
        for i, p in enumerate(pts):
            rows.append((c * n_per + i, [float(x) for x in p]))
            vecs.append(p)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, np.asarray(vecs), anchors


def recall_row(df, vecs, ids, queries, centroids):
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    out = []
    for nprobe in NPROBES:
        rs = []
        for q in queries:
            qn = np.asarray(q) / np.linalg.norm(q)
            brute = {int(ids[i]) for i in np.argsort(-(vn @ qn), kind="stable")[:K]}
            got = {
                r.id
                for r in A.ivf_cosine_topk(
                    df, [float(x) for x in q], K, nprobe=nprobe, centroids=centroids
                ).collect()
            }
            rs.append(len(got & brute) / K)
        out.append(sum(rs) / len(rs))
    return out


def main() -> None:
    spark = get_spark("ivf_sweep", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(11)

    print("| dataset | quantizer | " + " | ".join(f"nprobe={p}" for p in NPROBES) + " |")
    print("|---|---|" + "---|" * len(NPROBES))

    # (a) clustered fixture
    df, vecs, anchors = clustered(spark)
    df = df.cache()
    ids = np.arange(len(vecs))
    queries = [anchors[c] + 0.05 * rng.standard_normal(64) for c in (1, 5, 9, 13)]
    km = A.kmeans_centroids(df, N_CENTROIDS, iters=10, seed=7)
    low = A.ivf_centroids(df, N_CENTROIDS)
    for name, cents in (("lowest-id", low), ("k-means", km)):
        r = recall_row(df, vecs, ids, queries, cents)
        print(f"| clustered 3.2k x 64d | {name} | " + " | ".join(f"{x:.3f}" for x in r) + " |")
    df.unpersist()

    # (b) driver embeddings (random gaussian — worst case)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    vecs = np.array([[float(x) for x in r.embedding] for r in rows])
    queries = [rng.standard_normal(64) for _ in range(4)]
    km = A.kmeans_centroids(emb, N_CENTROIDS, iters=10, seed=7)
    low = A.ivf_centroids(emb, N_CENTROIDS)
    for name, cents in (("lowest-id", low), ("k-means", km)):
        r = recall_row(emb, vecs, ids, queries, cents)
        print(f"| sf0.01 random 5k x 64d | {name} | " + " | ".join(f"{x:.3f}" for x in r) + " |")
    emb.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
