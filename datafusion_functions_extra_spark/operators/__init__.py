"""DataFrame-level operators (multi-stage aggregations, dedup, similarity)."""

from .clustering import kmeans_assign  # noqa: F401
from .decontaminate import ngram_overlap_flags  # noqa: F401
from .dedup import dedup_stats, exact_dedup  # noqa: F401
from .mode import mode_agg  # noqa: F401
from .similarity import (  # noqa: F401
    ann_cosine_topk,
    cosine_topk,
    minhash_signatures,
    near_dup_clusters,
    near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
