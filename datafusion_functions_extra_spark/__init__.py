"""datafusion-functions-extra, re-expressed as a PySpark-native engine.

A from-scratch PySpark library with the query capabilities of
``datafusion-contrib/datafusion-functions-extra`` (reference read-only at
/root/reference): the six aggregate UDFs ``mode``, ``max_by``, ``min_by``,
``skewness``, ``kurtosis``, ``kurtosis_pop`` (reference ``src/lib.rs:42-51``),
plus large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing, event sessionization).

Design principles (Spark-first, 100 TB-ready):

* Every aggregate is a composition of **built-in declarative Spark
  aggregates** plus a scalar finishing expression -> Tungsten partial
  aggregation, whole-stage codegen and shuffle-safety come for free; no
  Python-worker round-trips on the hot path.
* Operators that need more than one aggregation stage (``mode``) are
  DataFrame->DataFrame transformations that let Catalyst plan each stage.
* Python UDFs appear only where semantics genuinely require them
  (multimodal decode plumbing), always Arrow-batched via mapInPandas.
"""

from __future__ import annotations

__version__ = "0.2.0"

from .functions.aggregates import (  # noqa: F401
    kurtosis,
    kurtosis_pop,
    max_by,
    min_by,
    skewness,
)
from .functions.registry import (  # noqa: F401
    FUNCTIONS,
    all_extra_aggregate_functions,
    register_all,
)
from .operators.decontaminate import (  # noqa: F401
    bench_span_overlap,
    ngram_overlap_flags,
)
from .operators.dedup import dedup_stats, exact_dedup  # noqa: F401
from .pipeline import CurationConfig, curate_corpus  # noqa: F401
from .planlint import plan_lint  # noqa: F401
from .operators.mode import mode_agg  # noqa: F401
from .operators.similarity import (  # noqa: F401
    ann_cosine_topk,
    cosine_topk,
    embedding_near_dup_pairs,
    ensure_signatures_table,
    leakage_safe_split,
    near_dup_clusters,
    near_dup_pairs,
    near_dup_pairs_from_signatures,
)

__all__ = [
    "kurtosis",
    "kurtosis_pop",
    "max_by",
    "min_by",
    "skewness",
    "mode_agg",
    "register_all",
    "all_extra_aggregate_functions",
    "FUNCTIONS",
    "exact_dedup",
    "dedup_stats",
    "near_dup_pairs",
    "near_dup_clusters",
    "cosine_topk",
    "ann_cosine_topk",
    "embedding_near_dup_pairs",
    "ensure_signatures_table",
    "near_dup_pairs_from_signatures",
    "leakage_safe_split",
    "ngram_overlap_flags",
    "bench_span_overlap",
    "curate_corpus",
    "CurationConfig",
    "plan_lint",
    "__version__",
]
