"""Blocked entity resolution — candidate generation + verify, never all-pairs.

Record linkage at scale has one invariant: the O(n^2) pair space is never
materialized.  The classic plan (Fellegi-Sunter era blocking, surveyed in
Christen, *Data Matching*, 2012) is

1. **canonicalize** — reduce the corpus to DISTINCT match keys first.
   Matching runs on the key relation (bounded by key cardinality, not row
   count); raw rows re-attach by equi-join afterwards.  On a 100 TB fact
   table with a low-cardinality name domain this single step collapses the
   pair space by (rows/keys)^2.
2. **block** — one pass per blocking key (here: each word of the name);
   candidates are same-block pairs, a plain equi-join on the block key.
   Multi-pass blocking unions the passes: a pair survives if ANY pass
   brings it together, which bounds the recall loss of each individual
   key.
3. **verify** — the expensive similarity (Levenshtein here) runs on
   candidates only, JVM-side (``F.levenshtein``), with a canonical
   ``a < b`` orientation so each pair appears once.

Spark-first notes: every step is an equi-join or aggregate — no UDFs, no
cross join; the blocking-key explode is bounded by words-per-name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_name_matches(
    df: DataFrame,
    name_col: str,
    max_distance: int = 3,
) -> DataFrame:
    """(name_a, name_b, distance) — distinct-name pairs within
    ``max_distance`` Levenshtein edits, found via multi-pass word
    blocking (one pass per whitespace-separated word position).

    Pairs are oriented ``name_a < name_b`` and deduplicated across
    passes BEFORE the verify so Levenshtein runs once per candidate.
    """
    names = df.select(F.col(name_col).alias("name")).distinct()
    blocked = names.select(
        "name", F.posexplode(F.split(F.col("name"), " ")).alias("pos", "word")
    )
    a = blocked.select(
        F.col("name").alias("name_a"), "pos", F.col("word").alias("w")
    )
    b = blocked.select(
        F.col("name").alias("name_b"), "pos", F.col("word").alias("w")
    )
    cand = (
        a.join(b, ["pos", "w"])
        .where(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    return cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("distance"),
    ).where(F.col("distance") <= max_distance)
