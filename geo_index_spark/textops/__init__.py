"""Web-scale training-data pipeline operators over document tables:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search, and text analysis.

Every operator is pure Catalyst (generated column expressions — even
MinHash signatures and SimHash bit-majorities), so each has an exact
ANSI-SQL oracle and no Python on the hot path.
"""

from geo_index_spark.textops.dedup import (  # noqa: F401
    collapse_near_dup_clusters,
    exact_dedup,
    minhash_near_dup_pairs,
    minhash_near_dup_pairs_fast,
    ngram_jaccard_pairs,
    simhash64,
    simhash64_pairs,
    simhash_pairs,
)
from geo_index_spark.textops.quality import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from geo_index_spark.textops.ann import (  # noqa: F401
    cosine_near_dup_pairs,
    cosine_topk,
    cosine_topk_fast,
    ivf_centroids,
    ivf_cosine_topk,
    lsh_cosine_near_dup_pairs,
    lsh_cosine_near_dup_pairs_fast,
    lsh_cosine_topk,
    with_ivf_cell,
    with_lsh_band_keys,
    write_ivf_partitioned,
)
