"""DSIR-style importance weights for data selection.

Data Selection with Importance Resampling (Xie et al., 2023,
arXiv:2302.03169 — public paper) scores every raw document by how much
more likely its hashed n-gram features are under a small *target* corpus
(the distribution you want more of) than under the raw corpus, then
resamples by that importance.  The score is a log-likelihood ratio under
two bag-of-hashed-ngrams unigram models:

    score(doc) = sum over feature occurrences f of
                 [ ln p_target(f) - ln p_raw(f) ]

with add-alpha smoothing over ``n_buckets`` hashed feature buckets.

Spark-first plan (no Python on executors, three shuffles total):

1. explode docs into hashed unigram+bigram features — one corpus pass;
2. ``groupBy(feature)`` counting raw and target occurrences in the same
   aggregate (target is a boolean predicate pushed into a conditional
   count) — the model relation is at most ``n_buckets`` rows;
3. broadcast the per-feature log-ratio weights back onto the exploded
   features and ``groupBy(doc)`` to sum.

At 100 TB: the feature-count relation is O(n_buckets) regardless of
corpus size (broadcastable by construction), the corpus is exploded
exactly once, and both groupBys benefit from map-side partial combine.

Cross-engine determinism: per-feature weights are rounded to integer
**micro-nats** (``round(w * 1e6)`` as BIGINT) before the per-doc sum, so
the summation is exact integer arithmetic — immune to the float
partial-sum order drift that plagues cross-engine double sums (SURVEY
§8.3); only the final display division returns to double, identically on
both engines.

No reference analog (the reference is six SQL aggregates); this is a
driver-mandated training-data-pipeline extra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokens
from .similarity import MERSENNE_P, hash60

#: hashed feature-space size; small enough to broadcast, large enough
#: that bucket collisions stay rare on a vocab of tens of thousands
DSIR_BUCKETS = 1024

#: add-alpha smoothing mass per bucket
DSIR_ALPHA = 0.5


def _doc_features(
    df: DataFrame, text_col: str, id_col: str, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(id, *carry, f) — one row per unigram and bigram occurrence, hashed
    into ``DSIR_BUCKETS`` buckets.  Bigrams join adjacent normalized
    tokens with a space, so the bigram of token i is
    ``tok[i] || ' ' || tok[i+1]`` — reproducible in any engine with the
    same normalize/split.  The token array is projected once, so the
    normalize/split runs a single time per row."""
    with_toks = df.select(
        F.col(id_col), *carry, tokens(F.col(text_col)).alias("toks")
    )
    t = F.col("toks")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.slice(t, 1, F.size(t) - 1),
            lambda x, i: F.concat_ws(" ", x, F.element_at(t, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return with_toks.select(
        F.col(id_col), *carry, F.explode(F.concat(t, bigrams)).alias("g")
    ).select(
        F.col(id_col),
        *carry,
        (hash60(F.col("g")) % F.lit(MERSENNE_P) % F.lit(DSIR_BUCKETS)).alias("f"),
    )


def dsir_importance(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target: Column,
    n_buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """(id, n_features, score) — per-document DSIR log-likelihood-ratio
    importance; ``target`` is a boolean Column marking the target-domain
    rows *within* ``df`` (e.g. a trusted source).  Higher score = more
    target-like.  ``score`` is exact to 1e-6 by construction (integer
    micro-nat accumulation)."""
    feats = _doc_features(
        df.withColumn("is_target", target), text_col, id_col, carry=("is_target",)
    )
    # one corpus explode, pinned: the model counts and the per-doc scoring
    # join both read it (at 100 TB this persist becomes a parquet stage,
    # same substitution as the LSH signature table)
    feats = feats.persist()

    counts = feats.groupBy("f").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count(F.when(F.col("is_target"), 1)).alias("n_tgt"),
    )
    # corpus-wide totals are the column sums of the O(n_buckets) model
    # relation — no second pass over the exploded corpus
    totals = counts.agg(
        F.sum("n_raw").alias("t_raw"), F.sum("n_tgt").alias("t_tgt")
    )
    a, b = F.lit(float(alpha)), F.lit(float(alpha * n_buckets))
    w_micro = F.round(
        (
            F.log((F.col("n_tgt") + a) / (F.col("t_tgt") + b))
            - F.log((F.col("n_raw") + a) / (F.col("t_raw") + b))
        )
        * F.lit(1e6)
    ).cast("long")
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "f", w_micro.alias("w_micro")
    )

    per_doc = (
        feats.join(F.broadcast(weights), "f")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("w_micro").alias("score_micro"),
        )
    )
    return per_doc.select(
        F.col(id_col),
        "n_features",
        F.round(F.col("score_micro") / F.lit(1e6), 6).alias("score"),
    )


def dsir_importance_oracle_sql(
    target_sql: str,
    table: str = "documents",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
) -> str:
    """DuckDB twin of :func:`dsir_importance` over ``table``;
    ``target_sql`` is the boolean SQL predicate for target rows."""
    norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    toks = f"str_split({norm}, ' ')"
    h = f"('0x' || substr(md5(g), 1, 15))::BIGINT"
    a = float(alpha)
    b = float(alpha * n_buckets)
    return f"""
WITH t AS (SELECT {id_col} AS id, ({target_sql}) AS is_target,
                  {toks} AS toks FROM {table}),
grams AS (
  SELECT id, is_target, unnest(
    list_concat(
      toks,
      CASE WHEN len(toks) >= 2
           THEN list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])
           ELSE [] END)
  ) AS g
  FROM t
),
feats AS (SELECT id, is_target, {h} % {MERSENNE_P} % {n_buckets} AS f FROM grams),
counts AS (
  SELECT f, count(*) AS n_raw,
         count(CASE WHEN is_target THEN 1 END) AS n_tgt
  FROM feats GROUP BY f
),
totals AS (
  SELECT count(*) AS t_raw,
         count(CASE WHEN is_target THEN 1 END) AS t_tgt
  FROM feats
),
weights AS (
  SELECT f,
         round((ln((n_tgt + {a}) / (t_tgt + {b}))
              - ln((n_raw + {a}) / (t_raw + {b}))) * 1e6)::BIGINT AS w_micro
  FROM counts, totals
)
SELECT feats.id AS {id_col}, count(*) AS n_features,
       round(sum(w_micro) / 1e6, 6) AS score
FROM feats JOIN weights USING (f)
GROUP BY 1
"""
