"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

This is the standard eval-contamination check run before LLM training
(n-gram overlap between the training corpus and held-out benchmarks).
The scale shape matters more than the math: the benchmark side is tiny
(megabytes of eval sets) while the training side is the 100 TB corpus, so
the correct plan is

  1. shingle the benchmark set, ``distinct`` it (still tiny),
  2. **broadcast** that shingle set,
  3. stream the corpus through one explode + broadcast-hash semi-join +
     per-doc count — a single shuffle on ``doc_id``, no sort, and the
     corpus text is never moved (only (doc_id, gram) pairs reach the
     join, and only matching pairs reach the aggregate).

No reference analog (the reference ships only aggregate UDFs); this is a
driver-mandated training-pipeline extra (SURVEY.md §2.2b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles_or_whole
from .similarity import _NORM_SQL, _TOKS_SQL

#: decontamination n-gram width (word n-grams; 5 is a common contamination
#: screen width — wide enough that incidental collisions are rare on real
#: prose, narrow enough to catch paraphrase-free inclusion)
DECONTAM_NGRAM = 5


def ngram_overlap_flags(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DECONTAM_NGRAM,
) -> DataFrame:
    """(id, n_bench_hits) for every training doc sharing at least one
    word ``n``-gram with the benchmark set.

    ``n_bench_hits`` counts *distinct* benchmark n-grams hit, so a doc
    that repeats one contaminated phrase ten times scores 1, not 10 —
    the quantity a filter thresholds on.
    """
    grams_train = train.select(
        F.col(id_col), F.explode(shingles_or_whole(text_col, n)).alias("gram")
    )
    grams_bench = (
        bench.select(
            F.explode(shingles_or_whole(text_col, n)).alias("gram")
        ).distinct()
    )
    return (
        grams_train.join(F.broadcast(grams_bench), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_bench_hits"))
    )


def ngram_overlap_oracle_sql(
    bench_predicate: str,
    n: int = DECONTAM_NGRAM,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror: same normalization, same shingling (including the
    shorter-than-n whole-text fallback), benchmark = rows satisfying
    ``bench_predicate``, training = the rest."""
    return f"""
WITH t AS (SELECT {id_col} AS id, ({bench_predicate}) AS is_bench,
                  {_NORM_SQL} AS norm, {_TOKS_SQL} AS toks FROM {table}),
sh AS (
  SELECT id, is_bench,
         CASE WHEN len(toks) >= {n}
              THEN list_transform(generate_series(1, len(toks) - {n - 1}),
                                  i -> array_to_string(toks[i:i+{n - 1}], ' '))
              ELSE [norm] END AS grams
  FROM t
),
tr AS (SELECT id, unnest(grams) AS gram FROM sh WHERE NOT is_bench),
be AS (SELECT DISTINCT unnest(grams) AS gram FROM sh WHERE is_bench)
SELECT tr.id AS {id_col}, count(DISTINCT tr.gram) AS n_bench_hits
FROM tr JOIN be USING (gram)
GROUP BY 1
"""
