"""Deterministic sampling and dataset splits for training pipelines.

``df.sample()`` is seed-dependent *per partitioning* — re-partition the
input and the sample changes, which silently breaks reproducibility and
train/test hygiene at scale.  The robust pattern is content-hash
bucketing: a row's bucket is a pure function of its key, so membership is
stable across partitionings, engines, and reruns, and a grown corpus
keeps prior rows in their split (only new keys land in new buckets).

All hashing goes through the same md5-derived 60-bit primitive as the
similarity module, so every function here is reproducible in the DuckDB
oracle (and any engine with md5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.similarity import hash60, _hash60_sql
from .rounding import r6n, r6n_sql

#: bucket space for percentage splits
N_BUCKETS = 10_000


def hash_bucket(key: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Stable bucket in [0, n_buckets) from the key's content hash."""
    return hash60(key.cast("string")) % n_buckets


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Keep rows whose key-bucket falls below fraction * n_buckets."""
    cut = int(round(fraction * n_buckets))
    return df.where(hash_bucket(F.col(key), n_buckets) < cut)


def train_test_split(
    df: DataFrame, key: str, test_fraction: float = 0.1, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Adds a ``split`` column ('test' below the cut, else 'train').

    One projection, no shuffle; the same key always lands in the same
    split — including across dataset versions.
    """
    cut = int(round(test_fraction * n_buckets))
    return df.withColumn(
        "split",
        F.when(hash_bucket(F.col(key), n_buckets) < cut, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    scale: float,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: a row is kept iff its
    stable hash fraction falls below ``weight / scale`` (probabilities
    clip at 1 for weights >= scale).

    One filter projection, no shuffle, reproducible across engines and
    partitionings — the weighted analog of :func:`deterministic_sample`,
    e.g. length-proportional document sampling for training mixes.
    """
    frac = hash_bucket(F.col(key), n_buckets).cast("double") / F.lit(float(n_buckets))
    return df.where(frac < F.col(weight_col).cast("double") / F.lit(float(scale)))


def weighted_sample_sql(
    key_expr: str, weight_expr: str, scale: float, n_buckets: int = N_BUCKETS
) -> str:
    """DuckDB WHERE-clause fragment mirroring :func:`weighted_sample`."""
    return (
        f"({hash_bucket_sql(key_expr, n_buckets)}::DOUBLE / {float(n_buckets)} "
        f"< {weight_expr}::DOUBLE / {float(scale)})"
    )


def weighted_reservoir_topn(
    df: DataFrame,
    key: str,
    weight_col: str,
    n: int,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of exactly ``n``
    rows (Efraimidis–Spirakis A-ES): rank every row by
    ``w / -ln(u)`` descending, where ``u`` is the row's stable hash
    fraction — an order-equivalent form of the classic ``u^(1/w)``
    reservoir key that keeps the magnitudes well away from 1.0 so a 6-dp
    rounding stays discriminating.

    Unlike :func:`weighted_sample` (Bernoulli — random sample SIZE), the
    output is exactly n rows, inclusion probability proportional to
    weight, reproducible across engines/partitionings.  Plan: one
    projection for the key, one top-n (Spark's sort-based TakeOrdered —
    no full sort materialization at any input size).

    The rounded key is a cross-engine ln() ratio, so it goes through the
    boundary-nudged rounding and ties break on the key column — the same
    convention as TF-IDF ranking.
    """
    u = (hash_bucket(F.col(key), n_buckets).cast("double") + F.lit(0.5)) / F.lit(
        float(n_buckets)
    )
    res_key = r6n(F.col(weight_col).cast("double") / -F.log(u))
    return (
        df.withColumn("reservoir_key", res_key)
        # orderBy + limit plans as TakeOrderedAndProject: per-partition
        # top-n then a driver merge of n-row heaps — no global sort, no
        # single-partition window, survives any input size
        .orderBy(F.col("reservoir_key").desc(), F.col(key).asc())
        .limit(n)
    )


def weighted_reservoir_key_sql(
    key_expr: str, weight_expr: str, n_buckets: int = N_BUCKETS
) -> str:
    """DuckDB expression mirroring the A-ES key of
    :func:`weighted_reservoir_topn`."""
    u = (
        f"(({hash_bucket_sql(key_expr, n_buckets)})::DOUBLE + 0.5) "
        f"/ {float(n_buckets)}"
    )
    return r6n_sql(f"{weight_expr}::DOUBLE / -ln({u})")


def stratified_sample_n(
    df: DataFrame, strata: list[str], key: str, n_per_stratum: int
) -> DataFrame:
    """Deterministic n-per-stratum sample: rank rows inside each stratum by
    (content hash, key) and keep the first n.  One shuffle on the strata;
    the hash ordering is a stable pseudo-random permutation, so the sample
    is unbiased w.r.t. any upstream ordering yet fully reproducible.
    """
    w = Window.partitionBy(*strata).orderBy(
        hash60(F.col(key).cast("string")).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    key: str,
    size_col: str,
    budget: int,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic contiguous sequence packing: shard rows by key hash,
    order each shard by (hash, key) — a stable pseudo-random permutation —
    and cut the running size into ``budget``-sized bins.

    This is the distributed form of LLM training-sequence packing: a row
    belongs to bin ``floor(preceding_cumulative_size / budget)`` of its
    shard.  One shuffle (by shard) + one sort; every engine with window
    sums produces the identical packing, so downstream sequence formation
    is reproducible.  Adds ``shard``, ``bin``, ``offset_in_bin``.
    """
    shard = hash_bucket(F.col(key), n_shards).alias("shard")
    w = Window.partitionBy("shard").orderBy(
        hash60(F.col(key).cast("string")).asc(), F.col(key).asc()
    )
    cum_before = F.coalesce(
        F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        df.withColumn("shard", shard)
        .withColumn("bin", F.floor(cum_before / F.lit(budget)).cast("long"))
        .withColumn("offset_in_bin", (cum_before % F.lit(budget)).cast("long"))
    )


def temperature_mixture(
    df: DataFrame,
    source_col: str,
    key: str,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Temperature-based source mixing (the multilingual/multi-source
    rebalancing used in LLM data recipes): target share of source ``s``
    is proportional to ``n_s ** alpha`` (alpha < 1 upweights small
    sources), total expected kept rows = ``budget_frac`` of the corpus.

    Per-row keep is the deterministic hash Bernoulli from
    :func:`weighted_sample`, so the realized sample is reproducible
    across engines and partitionings.  Rates are rounded to 6 dp before
    the hash comparison — the normalizer is a cross-source float sum
    whose addition order differs per engine.

    Plan: one count aggregate (|sources| rows), a broadcast of the rates
    back onto the corpus, one filter, one final count aggregate — the
    corpus is scanned once and never shuffled on a data-sized key.
    Returns (source, n_docs, rate, n_kept).
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("n_total"),
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(alpha))).alias("z"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n_docs",
        # ratio of aggregates → boundary-nudged rounding (the nudge can't
        # push a capped rate past 1.0: round(1.0 + 1e-9, 6) == 1.0)
        r6n(
            F.least(
                F.lit(1.0),
                F.lit(budget_frac)
                * F.col("n_total").cast("double")
                * F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
                / F.col("z")
                / F.col("n_docs").cast("double"),
            )
        ).alias("rate"),
    )
    frac = hash_bucket(F.col(key), n_buckets).cast("double") / F.lit(float(n_buckets))
    kept = (
        df.select(source_col, F.col(key))
        .join(F.broadcast(rates), source_col)
        .withColumn("kept", (frac < F.col("rate")).cast("int"))
    )
    return kept.groupBy(source_col).agg(
        F.max("rate").alias("rate"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("kept").alias("n_kept"),
    )


def temperature_mixture_sql(
    source_col: str,
    key_expr: str,
    table: str = "documents",
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    n_buckets: int = N_BUCKETS,
) -> str:
    """DuckDB mirror of :func:`temperature_mixture`."""
    frac = f"({hash_bucket_sql(key_expr, n_buckets)}::DOUBLE / {float(n_buckets)})"
    return f"""
WITH c AS (SELECT {source_col}, count(*) AS n_docs FROM {table} GROUP BY 1),
t AS (SELECT sum(n_docs) AS n_total, sum(pow(n_docs, {alpha})) AS z FROM c),
r AS (
  SELECT {source_col}, n_docs,
         {r6n_sql(f'''least(1.0, {budget_frac} * n_total * pow(n_docs, {alpha})
                          / z / n_docs)''')} AS rate
  FROM c, t
),
k AS (
  SELECT d.{source_col}, r.rate,
         CASE WHEN {frac} < r.rate THEN 1 ELSE 0 END AS kept
  FROM {table} d JOIN r USING ({source_col})
)
SELECT {source_col}, max(rate) AS rate, count(*) AS n_docs,
       sum(kept)::BIGINT AS n_kept
FROM k GROUP BY 1
"""


# --- DuckDB oracle fragments ------------------------------------------------


def hash_bucket_sql(key_expr: str, n_buckets: int = N_BUCKETS) -> str:
    return f"({_hash60_sql(f'CAST({key_expr} AS VARCHAR)')} % {n_buckets})"


def stratified_rank_sql(strata: str, key_expr: str) -> str:
    """row_number window mirroring stratified_sample_n's ordering."""
    h = _hash60_sql(f"CAST({key_expr} AS VARCHAR)")
    return (
        f"row_number() OVER (PARTITION BY {strata} "
        f"ORDER BY {h} ASC, {key_expr} ASC)"
    )


def pack_sequences_sql(
    key_expr: str, size_expr: str, budget: int, n_shards: int = 8
) -> str:
    """SELECT-list fragments (shard, bin, offset_in_bin) mirroring
    pack_sequences; embed in a query over the source table."""
    h = _hash60_sql(f"CAST({key_expr} AS VARCHAR)")
    shard = f"({h} % {n_shards})"
    cum_before = (
        f"coalesce(sum({size_expr}) OVER (PARTITION BY {shard} "
        f"ORDER BY {h} ASC, {key_expr} ASC "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
    )
    return (
        f"{shard} AS shard, "
        f"floor({cum_before} / {budget})::BIGINT AS bin, "
        f"({cum_before} % {budget})::BIGINT AS offset_in_bin"
    )


def unimax_allocation(
    caps: DataFrame,
    key_col: str,
    cap_col: str,
    budget_num: int = 6,
    budget_den: int = 10,
) -> DataFrame:
    """UniMax water-filling (Chung et al., ICLR 2023): allocate a token
    budget (``floor(total * num / den)``) as uniformly as possible across
    keys, capped per key at its own ``cap_col`` (= one epoch).

    Closed form, no iteration: ordering keys by ascending cap, the fully-
    satisfied set is always a PREFIX, and membership is the all-integer
    test ``cap * keys_remaining + tokens_committed <= budget``; everyone
    past the prefix shares the remainder evenly at the water level.
    Returns (key, cap, alloc_tokens, epochs) with the doubles 6-dp
    boundary-nudge rounded (r6n) for cross-engine hashing.

    The ordering/cumsum windows run over the KEY-domain relation
    (#languages / #sources — bounded at any corpus size); the (k,
    committed) reduction is a 1-row broadcast.
    """
    w = Window.orderBy(cap_col, key_col)
    b = caps.agg(
        F.floor(F.sum(cap_col) * budget_num / budget_den)
        .cast("long")
        .alias("budget"),
        F.count(F.lit(1)).alias("n"),
    )
    o = caps.select(
        key_col,
        cap_col,
        F.row_number().over(w).alias("i"),
        F.coalesce(
            F.sum(cap_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("presum_prev"),
    )
    f = o.crossJoin(F.broadcast(b)).withColumn(
        "full_cap",
        F.col(cap_col) * (F.col("n") - F.col("i") + 1) + F.col("presum_prev")
        <= F.col("budget"),
    )
    k = f.agg(
        F.coalesce(F.sum(F.when(F.col("full_cap"), F.lit(1))), F.lit(0))
        .cast("long")
        .alias("kk"),
        F.coalesce(
            F.max(
                F.when(F.col("full_cap"), F.col("presum_prev") + F.col(cap_col))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("presum_k"),
    )
    level = (F.col("budget") - F.col("presum_k")).cast("double") / (
        F.col("n") - F.col("kk")
    )
    return f.crossJoin(F.broadcast(k)).select(
        key_col,
        cap_col,
        r6n(
            F.when(F.col("full_cap"), F.col(cap_col).cast("double")).otherwise(
                level
            )
        ).alias("alloc_tokens"),
        r6n(
            F.when(F.col("full_cap"), F.lit(1.0)).otherwise(
                level / F.col(cap_col)
            )
        ).alias("epochs"),
    )


def hrw_shard(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous / highest-random-weight shard assignment (Thaler &
    Ravishankar 1996): each key goes to ``argmax_s hash60(key ':' s)``
    over shards ``0..n_shards-1`` — stateless consistent placement
    where adding a shard moves only ~1/(n+1) of keys, all INTO the new
    shard.  Adds ``out_col`` (int shard id) to the input relation.

    Scale shape: an exact ``n_shards``-way in-row explode and one keyed
    argmax aggregate (the reference ``max_by`` doing systems work); the
    md5-derived weight is reproducible in any engine
    (``hash_bucket_sql``'s sibling, see ``suite.users_hrw_shards``).
    """
    from .aggregates import max_by

    ex = df.select(
        *df.columns,
        F.explode(F.array(*[F.lit(s) for s in range(n_shards)])).alias("_s"),
    )
    h = hash60(
        F.concat(
            F.col(key_col).cast("string"), F.lit(":"), F.col("_s").cast("string")
        )
    )
    return (
        ex.select(*df.columns, "_s", h.alias("_h"))
        .groupBy(*df.columns)
        .agg(max_by("_s", "_h").alias(out_col))
    )
