"""Side-by-side check of __spark_entry__.queries() vs oracle_sql() —
the same comparison the driver runs (row count + schema + order-
insensitive values) at sf0.01, run here at sf0.001 for speed plus a
handful at sf0.01 in the slow marker."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as E

import os

SF_DIR = os.environ.get("ENTRY_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


ALL_QUERIES = {**E.queries(), **E.validation_queries()}
ALL_ORACLES = {**E.oracle_sql(), **E.validation_oracle_sql()}


def test_registry_contract():
    """Driver window invariants (round-3 verdict #1): the driver checks
    at most 50 registry rows, so every registered query MUST sit inside
    that window, names must not collide across the two dicts, and every
    validation twin must carry an oracle (that's its whole job)."""
    q = E.queries()
    vq = E.validation_queries()
    assert len(q) <= 50, f"queries() has {len(q)} entries — driver caps at 50"
    assert not set(q) & set(vq), "query/validation name collision"
    assert set(E.oracle_sql()) <= set(q), "oracle for an unregistered query"
    assert set(E.validation_oracle_sql()) == set(vq), (
        "every validation twin needs an oracle"
    )


@pytest.mark.parametrize("name", sorted(ALL_QUERIES.keys()))
def test_query_matches_oracle(spark, con, name):
    q = ALL_QUERIES[name]
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    osql = ALL_ORACLES.get(name)
    if osql is None:
        # genuinely non-SQL ops: the driver's weaker rows-only check
        assert len(srows) >= 0 and len(scols) > 0
        return
    ores = con.sql(osql)
    orows = ores.fetchall()
    ocols = [d[0] for d in ores.description]
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row counts {len(srows)} vs {len(orows)}"
    a = _norm([tuple(r) for r in srows], scols)
    b = _norm(orows, ocols)
    assert a == b, f"{name}: value mismatch (first diff: {next((x for x, y in zip(a, b) if x != y), None)})"


def test_ivf_kmeans_literal_oracle(spark, con):
    """EXACT literal-replay oracle for the PRODUCTION float k-means
    trainer (``kmeans_centroids``: xxhash64 sample, un-quantized numpy
    Lloyd's). Since round 6 the DRIVER slot ``ivf_kmeans_ann_emb`` uses
    the SQL-mirrorable ``kmeans_centroids_exact`` and is hash-checked
    by the static ``ivf_kmeans_topk_sql`` oracle (swept above via
    ALL_ORACLES); this test keeps the production trainer pinned too —
    its centroids are data-dependent, so pytest inlines them as
    literals into the same assignment/probe/top-k SQL body per sf
    dir."""
    from geo_index_spark.textops import ann as A

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = A.kmeans_centroids(emb, n_centroids=16, iters=5, sample_n=256)
    sdf = A.ivf_cosine_topk(emb, E.ANN_QUERY, E.ANN_K, centroids=cents, nprobe=4)
    srows = sdf.collect()
    scols = sdf.columns
    osql = A.ivf_cosine_topk_sql_literal(cents, E.ANN_QUERY, E.ANN_K, nprobe=4)
    ores = con.sql(osql)
    orows = ores.fetchall()
    ocols = [d[0] for d in ores.description]
    assert sorted(scols) == sorted(ocols)
    assert _norm([tuple(r) for r in srows], scols) == _norm(orows, ocols)


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["cell_id", "n_pairs"]
