"""Dedup / quality / ANN operators — semantic goldens (DuckDB-oracle
parity runs in test_entry_contract.py; here we pin behavior on crafted
inputs where ground truth is known by construction)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_index_spark.textops import ann as A
from geo_index_spark.textops import dedup as D
from geo_index_spark.textops import quality as Q


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
        (2, "the quick brown fox jumped over the lazy dog", "en"),  # near dup
        (3, "der schnelle braune fuchs springt und der hund ist faul", "de"),
        (4, "completely different content about databases and indexes", "en"),
        (5, "le renard brun rapide saute et le chien est paresseux", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup(spark, docs):
    out = {(r.doc_id, r.n_copies) for r in D.exact_dedup(docs).collect()}
    assert (0, 2) in out
    assert len(out) == 5  # 6 docs, one pair merged


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = {(r.a_id, r.b_id) for r in D.ngram_jaccard_pairs(docs, n=4, tau_num=1, tau_den=2).collect()}
    assert (0, 1) in pairs  # identical
    assert (0, 2) in pairs and (1, 2) in pairs  # one-word edit
    assert not any(4 in p for p in pairs)


@pytest.mark.slow
def test_minhash_lsh_matches_exact_jaccard(spark, docs):
    """On identical thresholds, LSH+refine must return a subset of the
    exact pairs; with 16 single-row bands it catches all high-J pairs."""
    exact = {(r.a_id, r.b_id) for r in D.ngram_jaccard_pairs(docs, n=4, tau_num=1, tau_den=2).collect()}
    lsh = {(r.a_id, r.b_id) for r in D.minhash_near_dup_pairs(docs, n=4, num_hashes=16, tau_num=1, tau_den=2).collect()}
    assert lsh <= exact
    assert (0, 1) in lsh and (0, 2) in lsh


def test_simhash_identical_and_near(spark, docs):
    fp = {r.id: r.simhash for r in D.simhash(docs).collect()}
    assert fp[0] == fp[1]
    # one-word edit flips few bits
    assert bin(fp[0] ^ fp[2]).count("1") <= 10
    pairs = {(r.a_id, r.b_id) for r in D.simhash_pairs(docs, max_hamming=10).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs


def test_language_id(spark, docs):
    out = {r.id: r.lang_pred for r in Q.language_id(docs).collect()}
    assert out[0] == "en" and out[3] == "de" and out[5] == "fr"


def test_token_count_and_quality(spark, docs):
    toks = {r.id: r.n_tokens for r in Q.token_count(docs).collect()}
    assert toks[0] == 9
    q = {r.id: r for r in Q.quality_score(docs).collect()}
    assert q[0].n_chars == 43
    assert q[0].punct_ratio_pm == 0


def test_fingerprint_matches_md5(spark, docs):
    import hashlib

    out = {r.id: r.fingerprint for r in Q.doc_fingerprint(docs).collect()}
    want = hashlib.md5(b"the quick brown fox jumps over the lazy dog").hexdigest()[:16]
    assert out[0] == want


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    base[7] = base[3] + 0.01 * rng.standard_normal(16).astype(np.float32)  # near-dup pair
    rows = [(i, [float(v) for v in base[i]]) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def test_cosine_topk_exact(spark, emb):
    df, base = emb
    q = [float(v) for v in base[3]]
    got = [r.id for r in A.cosine_topk(df, q, 5).collect()]
    # numpy oracle
    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    qn = np.asarray(q) / np.linalg.norm(q)
    order = np.argsort(-(bn @ qn), kind="stable")[:5]
    assert got[0] == 3 and got[1] == 7
    assert set(got) == set(int(i) for i in order)


def test_cosine_near_dup_pairs(spark, emb):
    df, _ = emb
    pairs = {(r.a_id, r.b_id) for r in A.cosine_near_dup_pairs(df, tau=0.99).collect()}
    assert pairs == {(3, 7)}


def test_lsh_cosine_topk_recall(spark, emb):
    df, base = emb
    q = [float(v) for v in base[3]]
    exact = [r.id for r in A.cosine_topk(df, q, 3).collect()]
    approx = [r.id for r in A.lsh_cosine_topk(df, q, 3, dim=16, n_planes=8, probe_hamming=3).collect()]
    # top-1 must survive LSH (query bucket contains its own vector)
    assert approx and approx[0] == exact[0]


def test_collapse_near_dup_clusters(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    # components: {0,1,2} (chain), {3,4}, singletons 5,6,7
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "a_id long, b_id long"
    )
    out = {
        r.doc_id: (r.cluster_id, r.is_representative)
        for r in D.collapse_near_dup_clusters(docs, pairs).collect()
    }
    assert out[0] == (0, True) and out[1] == (0, False) and out[2] == (0, False)
    assert out[3] == (3, True) and out[4] == (3, False)
    assert all(out[i] == (i, True) for i in (5, 6, 7))


def test_collapse_long_chain_converges(spark):
    n = 30
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "a_id long, b_id long")
    out = D.collapse_near_dup_clusters(docs, pairs, max_iters=40).collect()
    assert all(r.cluster_id == 0 for r in out)
    assert sum(r.is_representative for r in out) == 1


@pytest.fixture(scope="module")
def docs_real(spark):
    """Driver documents table at sf0.001 — enough similarity structure
    to exercise both refine strategies non-trivially."""
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.mark.slow
def test_minhash_refine_strategies_agree(spark, docs_real):
    """broadcast (array_intersect) and counting (shuffled equi-join)
    refine paths must produce identical pair sets — the size gate may
    switch between them at scale without changing results."""
    kw = dict(n=4, num_hashes=16, tau_num=1, tau_den=2)
    bc = {(r.a_id, r.b_id) for r in D.minhash_near_dup_pairs(docs_real, refine="broadcast", **kw).collect()}
    cj = {(r.a_id, r.b_id) for r in D.minhash_near_dup_pairs(docs_real, refine="counting", **kw).collect()}
    assert bc == cj
    assert len(bc) > 0


@pytest.mark.slow
def test_minhash_fast_refine_strategies_agree(spark, docs_real):
    kw = dict(n=4, num_hashes=16, tau_num=1, tau_den=2)
    bc = {(r.a_id, r.b_id) for r in D.minhash_near_dup_pairs_fast(docs_real, refine="broadcast", **kw).collect()}
    cj = {(r.a_id, r.b_id) for r in D.minhash_near_dup_pairs_fast(docs_real, refine="counting", **kw).collect()}
    assert bc == cj
    assert len(bc) > 0


@pytest.mark.slow
def test_minhash_refine_auto_gate(spark, docs):
    """auto with a zero threshold must take the counting path and still
    match the broadcast output."""
    kw = dict(n=4, num_hashes=16, tau_num=1, tau_den=2)
    gated = {(r.a_id, r.b_id) for r in D.minhash_near_dup_pairs(docs, broadcast_max_shingles=0, **kw).collect()}
    bc = {(r.a_id, r.b_id) for r in D.minhash_near_dup_pairs(docs, refine="broadcast", **kw).collect()}
    assert gated == bc


def test_simhash64_identical_and_near(spark, docs):
    fp = {r.id: r.simhash for r in D.simhash64(docs).collect()}
    assert fp[0] == fp[1]
    # one-word edit flips few of the 64 bits
    assert bin((fp[0] ^ fp[2]) & 0xFFFFFFFFFFFFFFFF).count("1") <= 16
    # fingerprints use the full 64-bit range (top half not stuck at 0)
    assert any((v >> 32) & 0xFFFFFFFF not in (0, 0xFFFFFFFF) for v in fp.values())


@pytest.mark.slow
def test_simhash64_pairs_banding_complete(spark, docs_real):
    """Pigeonhole completeness: every pair at Hamming <= 3 shares one of
    the 4 sixteen-bit bands, so the banded candidate join must find the
    exact same pairs as a brute-force all-pairs scan over fingerprints."""
    fps = D.simhash64(docs_real).collect()
    ids = np.array([r.id for r in fps])
    vals = np.array([r.simhash for r in fps], dtype=np.int64).astype(np.uint64)
    brute = set()
    for i in range(len(ids)):
        x = vals[i] ^ vals
        ham = np.array([bin(int(v)).count("1") for v in x])
        for j in np.nonzero((ham <= 3) & (ids > ids[i]))[0]:
            brute.add((int(ids[i]), int(ids[j])))
    banded = {(r.a_id, r.b_id) for r in D.simhash64_pairs(docs_real, max_hamming=3).collect()}
    assert banded == brute


def test_simhash_wide_h60_matches_python_bruteforce(spark, docs):
    """The round-5 driver instantiation (n_bits=60, cross-engine H60
    hash) vs an independent pure-Python simhash: same token split,
    md5-prefix hash, majority vote — fingerprints must agree exactly,
    and the 64-bit production wrapper must route through the same
    machinery (simhash64 == simhash_wide(64))."""
    import hashlib
    import re

    from geo_index_spark.textops.hashes import h60_col

    got = {r.id: r.simhash for r in D.simhash_wide(docs, n_bits=60, hash_col=h60_col).collect()}
    rows = docs.select("doc_id", "text").collect()
    for r in rows:
        toks = [t for t in dict.fromkeys(re.split("[^a-z0-9]+", r.text.lower())) if t]
        votes = [0] * 60
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for k in range(60):
                votes[k] += 1 if (h >> k) & 1 else -1
        want = sum((1 << k) for k in range(60) if votes[k] > 0)
        assert got[r.doc_id] == want, r.doc_id
    w64 = {r.id: r.simhash for r in D.simhash_wide(docs, n_bits=64).collect()}
    p64 = {r.id: r.simhash for r in D.simhash64(docs).collect()}
    assert w64 == p64


def test_ivf_full_probe_equals_bruteforce(spark):
    """With nprobe == n_centroids every cell is probed, so IVF must
    return exactly the brute-force top-k."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [round(float(v), 4) for v in np.random.default_rng(0).standard_normal(64)]
    brute = [(r.id, r.score) for r in A.cosine_topk(emb, q, 25).collect()]
    ivf = [(r.id, r.score) for r in A.ivf_cosine_topk(emb, q, 25, n_centroids=8, nprobe=8).collect()]
    assert ivf == brute


def test_ivf_partial_probe_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [round(float(v), 4) for v in np.random.default_rng(0).standard_normal(64)]
    brute = {r.id for r in A.cosine_topk(emb, q, 25).collect()}
    ivf = [r.id for r in A.ivf_cosine_topk(emb, q, 25, n_centroids=16, nprobe=4).collect()]
    assert len(ivf) == 25
    # random gaussian embeddings are the worst case for IVF (no cluster
    # structure to exploit) — require non-trivial recall plus strict
    # improvement over a narrower probe
    r4 = len(set(ivf) & brute)
    ivf1 = {r.id for r in A.ivf_cosine_topk(emb, q, 25, n_centroids=16, nprobe=1).collect()}
    assert r4 >= 5
    assert r4 >= len(ivf1 & brute)


class TestLshCosineNearDupPairs:
    """Bucketed embedding near-dup pairs — the production path that
    replaces the all-pairs cross join (round-2 verdict item #1)."""

    def _mk(self, spark, vecs):
        import numpy as np

        rows = [(i, [float(v) for v in x]) for i, x in enumerate(vecs)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_recall_one_on_clustered_fixture(self, spark):
        """tau=0.99 near-dups (tiny-noise copies): 8 bands x 8 planes
        must find every true pair (theoretical recall > 0.9999)."""
        import numpy as np
        from geo_index_spark.textops.ann import (
            cosine_near_dup_pairs,
            lsh_cosine_near_dup_pairs,
        )

        rng = np.random.default_rng(42)
        base = rng.standard_normal((12, 32))
        vecs = []
        for b in base:
            for _ in range(4):  # 4 near-copies per cluster
                vecs.append(b + rng.standard_normal(32) * 0.01)
        df = self._mk(spark, vecs)
        exact = {(r.a_id, r.b_id) for r in cosine_near_dup_pairs(df, tau=0.99).collect()}
        got = {
            (r.a_id, r.b_id)
            for r in lsh_cosine_near_dup_pairs(
                df, tau=0.99, dim=32, n_bands=8, n_planes=8
            ).collect()
        }
        assert len(exact) >= 12 * 6  # every cluster contributes all C(4,2) pairs
        assert got == exact  # recall 1.0 AND precision 1.0

    def test_precision_exact_subset(self, spark):
        """Refine is exact: LSH output is always a subset of the brute
        force pairs, at any tau (candidates can only shrink recall)."""
        import numpy as np
        from geo_index_spark.textops.ann import (
            cosine_near_dup_pairs,
            lsh_cosine_near_dup_pairs,
        )

        rng = np.random.default_rng(7)
        df = self._mk(spark, rng.standard_normal((80, 16)))
        exact = {(r.a_id, r.b_id) for r in cosine_near_dup_pairs(df, tau=0.3).collect()}
        got = {
            (r.a_id, r.b_id)
            for r in lsh_cosine_near_dup_pairs(
                df, tau=0.3, dim=16, n_bands=6, n_planes=6
            ).collect()
        }
        assert got <= exact

    def test_identical_vectors_always_found(self, spark):
        """Completeness bound: exact duplicates share every band key,
        so they collide in all bands — found regardless of params."""
        import numpy as np
        from geo_index_spark.textops.ann import lsh_cosine_near_dup_pairs

        rng = np.random.default_rng(3)
        v = rng.standard_normal(24)
        vecs = [v, v * 2.0, rng.standard_normal(24), v * 0.5]
        df = self._mk(spark, vecs)
        got = {
            (r.a_id, r.b_id)
            for r in lsh_cosine_near_dup_pairs(
                df, tau=0.999999, dim=24, n_bands=2, n_planes=10
            ).collect()
        }
        assert {(0, 1), (0, 3), (1, 3)} <= got

    def test_sql_mirror_parity(self, spark):
        """The DuckDB mirror replays the identical candidate set +
        refine (literal hyperplanes) — exact row-set parity."""
        import duckdb
        import numpy as np
        from geo_index_spark.textops.ann import (
            lsh_cosine_near_dup_pairs,
            lsh_cosine_near_dup_pairs_sql,
        )

        rng = np.random.default_rng(19)
        base = rng.standard_normal((10, 16))
        vecs = list(base) + [b + rng.standard_normal(16) * 0.05 for b in base]
        df = self._mk(spark, vecs)
        got = sorted(
            (r.a_id, r.b_id)
            for r in lsh_cosine_near_dup_pairs(
                df, tau=0.9, dim=16, n_bands=4, n_planes=6
            ).collect()
        )
        con = duckdb.connect()
        con.register("embeddings", df.toPandas())
        want = sorted(
            con.sql(
                lsh_cosine_near_dup_pairs_sql(tau=0.9, dim=16, n_bands=4, n_planes=6)
            ).fetchall()
        )
        assert got == want and len(got) >= 10


class TestIvfIngestCells:
    """Round-3 IVF rework: ingest-time cell assignment + partition-
    pruned query path (round-2 verdict #5)."""

    def test_precomputed_cells_equal_inline(self, spark, tmp_path):
        import numpy as np
        from geo_index_spark.textops.ann import (
            ivf_centroids,
            ivf_cosine_topk,
            write_ivf_partitioned,
        )

        rng = np.random.default_rng(21)
        rows = [(i, [float(v) for v in rng.standard_normal(16)]) for i in range(300)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = [float(v) for v in rng.standard_normal(16)]

        inline = ivf_cosine_topk(emb, q, 10, n_centroids=8, nprobe=3).collect()

        cents = ivf_centroids(emb, 8)
        path = str(tmp_path / "ivf")
        write_ivf_partitioned(emb, path, cents)
        stored = spark.read.parquet(path)
        pre = ivf_cosine_topk(
            stored, q, 10, nprobe=3, centroids=cents, cell_col="cell"
        ).collect()
        assert [(r.id, r.score) for r in inline] == [(r.id, r.score) for r in pre]

    def test_partition_pruned_scan(self, spark, tmp_path):
        """The literal isin filter must reach the scan as a partition
        filter — the query reads nprobe cell directories, not the
        corpus."""
        import numpy as np
        from geo_index_spark.textops.ann import (
            ivf_centroids,
            ivf_cosine_topk,
            ivf_probe_cells,
            write_ivf_partitioned,
        )

        rng = np.random.default_rng(22)
        rows = [(i, [float(v) for v in rng.standard_normal(8)]) for i in range(200)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = [float(v) for v in rng.standard_normal(8)]
        cents = ivf_centroids(emb, 8)
        path = str(tmp_path / "ivf")
        write_ivf_partitioned(emb, path, cents)
        stored = spark.read.parquet(path)
        df = ivf_cosine_topk(stored, q, 5, nprobe=2, centroids=cents, cell_col="cell")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "cell" in plan.split("PartitionFilters", 1)[1][:160]
        # and the probed cells are what the driver-side pick says
        probe = set(ivf_probe_cells(cents, q, 2))
        got_cells = {
            r.cell
            for r in stored.filter(
                stored.cell.isin([int(c) for c in probe])
            ).select("cell").distinct().collect()
        }
        assert got_cells <= probe


class TestLshNearDupFastTwin:
    """Arrow fast path vs oracle-grade HOF twin — same planes, same
    banding, equal results on non-adversarial data."""

    def test_keys_and_pairs_match_oracle_grade(self, spark):
        import numpy as np
        from pyspark.sql import functions as F
        from geo_index_spark.textops.ann import (
            lsh_cosine_near_dup_pairs,
            lsh_cosine_near_dup_pairs_fast,
            with_lsh_band_keys,
            with_lsh_band_keys_fast,
        )

        rng = np.random.default_rng(31)
        base = rng.standard_normal((15, 24))
        vecs = list(base) + [b + rng.standard_normal(24) * 0.03 for b in base]
        rows = [(i, [float(v) for v in x]) for i, x in enumerate(vecs)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

        slow = {
            r.vec_id: r.bands
            for r in with_lsh_band_keys(emb, 24, 4, 6).select("vec_id", "bands").collect()
        }
        fast = {
            r.vec_id: r.bands
            for r in with_lsh_band_keys_fast(emb, 24, 4, 6).select("vec_id", "bands").collect()
        }
        assert slow == fast

        p_slow = sorted(
            (r.a_id, r.b_id)
            for r in lsh_cosine_near_dup_pairs(emb, 0.9, 24, 4, 6).collect()
        )
        p_fast = sorted(
            (r.a_id, r.b_id)
            for r in lsh_cosine_near_dup_pairs_fast(emb, 0.9, 24, 4, 6).collect()
        )
        assert p_slow == p_fast and len(p_fast) >= 10


class TestKmeansQuantizer:
    """VERDICT r3 #5: optional spherical k-means coarse quantizer —
    same IVF machinery, better cells on clustered data."""

    def _clustered(self, spark, n_per=100, k_true=8, dim=16, seed=3):
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

    def test_deterministic(self, spark):
        df, _, _ = self._clustered(spark, n_per=40)
        a = A.kmeans_centroids(df, 8, iters=5, seed=7)
        b = A.kmeans_centroids(df, 8, iters=5, seed=7)
        assert a == b
        assert len(a) == 8 and all(len(v) == 16 for _, v in a)
        # unit-norm centroids
        assert all(abs(np.linalg.norm(v) - 1.0) < 1e-9 for _, v in a)

    def test_recall_beats_lowest_id_on_clustered(self, spark):
        """On clustered embeddings, k-means cells at nprobe=1 must reach
        high recall and beat the lowest-id quantizer (which picks all
        its centroids from inside cluster 0)."""
        df, vecs, anchors = self._clustered(spark)
        df = df.cache()
        q = [float(x) for x in (anchors[5] + 0.01)]
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qn = np.asarray(q) / np.linalg.norm(q)
        brute = set(np.argsort(-(vn @ qn), kind="stable")[:25].tolist())

        km = A.kmeans_centroids(df, 8, iters=10, seed=7)
        got_km = {r.id for r in A.ivf_cosine_topk(df, q, 25, nprobe=1, centroids=km).collect()}
        low = A.ivf_centroids(df, 8)
        got_low = {r.id for r in A.ivf_cosine_topk(df, q, 25, nprobe=1, centroids=low).collect()}
        rec_km = len(got_km & brute) / 25
        rec_low = len(got_low & brute) / 25
        assert rec_km >= 0.8, (rec_km, rec_low)
        assert rec_km >= rec_low, (rec_km, rec_low)
        df.unpersist()

    def test_multiprobe_recall_monotone(self, spark):
        """VERDICT r3 #6: probing more cells (distance-ordered) can only
        help — recall vs nprobe is nondecreasing and hits 1.0 at full
        probe (exhaustive == brute force)."""
        df, vecs, anchors = self._clustered(spark)
        df = df.cache()
        q = [float(x) for x in (anchors[2] + 0.02)]
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qn = np.asarray(q) / np.linalg.norm(q)
        brute = set(np.argsort(-(vn @ qn), kind="stable")[:25].tolist())
        km = A.kmeans_centroids(df, 8, iters=10, seed=7)
        recalls = []
        for nprobe in (1, 2, 4, 8):
            got = {r.id for r in A.ivf_cosine_topk(df, q, 25, nprobe=nprobe, centroids=km).collect()}
            recalls.append(len(got & brute) / 25)
        assert recalls == sorted(recalls), recalls
        assert recalls[-1] == 1.0, recalls
        df.unpersist()

    def test_more_clusters_than_rows_clamps(self, spark):
        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
        )
        cents = A.kmeans_centroids(df, 16, iters=3)
        assert len(cents) == 2
