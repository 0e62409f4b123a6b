"""Deduplication operators for large-scale corpus pipelines.

Exact dedup here; near-duplicate families (MinHash+LSH, SimHash, n-gram
Jaccard, embedding cosine/ANN) live in :mod:`.similarity` — all
shuffle-native DataFrame plans, no Python on executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text


def content_key(c) -> Column:
    """md5 of normalized text — the exact-dedup grouping key.  Hashing
    first means the shuffle moves 32-byte keys, not document bodies."""
    return F.md5(normalize_text(c).cast("binary"))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row per distinct normalized text (the minimum id wins, so
    the result is deterministic).  Plan: hash -> groupBy(key) -> min(id),
    one shuffle on the 128-bit key with map-side combine; at 100 TB this
    is the standard content-addressed dedup and AQE handles key skew
    (e.g. boilerplate duplicated millions of times).
    """
    keyed = df.withColumn("__key", content_key(F.col(text_col)))
    keep = keyed.groupBy("__key").agg(F.min(id_col).alias(id_col))
    return (
        keep.join(keyed, [id_col, "__key"], "inner")
        .drop("__key")
        .select(*df.columns)
    )


def dedup_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Aggregate view of exact dedup: one row per distinct content with the
    kept id and the duplicate-cluster size."""
    keyed = df.withColumn("content_key", content_key(F.col(text_col)))
    return keyed.groupBy("content_key").agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
