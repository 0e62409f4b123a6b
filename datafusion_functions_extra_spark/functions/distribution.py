"""Global distribution primitives without single-partition windows.

A global cumulative sum (the backbone of exact percentiles, CDF tables,
and budget curricula) is usually written as ``sum(x) OVER (ORDER BY k)``
— which Spark executes by moving the WHOLE relation to one partition
(``WindowExec: No Partition Defined``).  Fine for a 10-row rollup, a
driver-killer for an unbounded one.  :func:`global_cumsum` is the
two-phase form that scales: range-repartition on the key so partition p
holds a contiguous key slice, cumulative-sum LOCALLY in parallel, then
lift per-partition totals into broadcast offsets (a <= #partitions-row
relation — the only globally-ordered structure).  Same trick as
``functions.text.build_vocab``'s ranking, factored out because exact
distribution queries keep needing it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    ascending: bool = True,
) -> DataFrame:
    """Add ``out_col`` = running sum of ``value_col`` in ``order_col``
    order (inclusive of the current row), without ever collapsing the
    relation to one partition.

    Rows must be unique per ``order_col`` (aggregate first — a cumsum
    over a histogram, which is the scalable shape anyway): range
    boundaries can split equal keys between partitions, which would make
    the local cumsum order-dependent for ties.
    """
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    # EAGER materialization is a correctness requirement, not an
    # optimization: the ranged relation is consumed TWICE (offsets +
    # join), and ``repartitionByRange`` picks its boundaries by
    # SAMPLING.  Normally exchange reuse makes both consumers share one
    # materialized stage, but a cached (InMemoryTableScan) subtree can
    # defeat the reuse, giving each consumer its OWN range shuffle with
    # slightly different sampled boundaries — local cumsums from one
    # layout then join offsets from another, silently corrupting the
    # global sum (observed at 8 shuffle partitions under
    # docs_perplexity_prune's cached score relation).  localCheckpoint
    # pins one layout for every consumer; the relation is histogram-
    # sized by contract, so the checkpoint job is cheap at any scale.
    ranged = (
        df.repartitionByRange(n_part, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    wl = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_lcum", F.sum(value_col).over(wl))
    wo = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pid")
        .agg(F.sum(value_col).alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(wo), F.lit(0)))
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_off") + F.col("_lcum"))
        .drop("_pid", "_lcum", "_off")
    )


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str,
) -> DataFrame:
    """Add ``out_col`` = global contiguous 1-based ``row_number`` in
    ``order_cols`` order, via the same two-phase shape as
    :func:`global_cumsum`: range repartition -> parallel per-partition
    local rank -> broadcast per-partition row-count offsets.  The key
    tuple must be unique per row (a distinct/aggregated relation) so
    range boundaries cannot split ties.  This is ``build_vocab``'s
    ranking, factored out for any operator that needs a total order over
    an unbounded relation (frequency ranks for prefix-filter similarity
    joins, leaderboards) without a single-partition window.
    """
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    # eager pin of the sampled range layout — see global_cumsum for the
    # double-consumer boundary-mismatch failure mode this prevents
    ranged = (
        df.repartitionByRange(n_part, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    wl = Window.partitionBy("_pid").orderBy(*order_cols)
    local = ranged.withColumn("_lrn", F.row_number().over(wl))
    wo = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(wo), F.lit(0)))
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_off") + F.col("_lrn"))
        .drop("_pid", "_lrn", "_off")
    )


def discrete_percentile_cutoffs(
    hist: DataFrame,
    key_col: str,
    count_col: str,
    quantiles: list[float],
) -> DataFrame:
    """One-row DataFrame of discrete percentile cutoffs ``p_<i>`` over a
    (key, count) histogram, using the explicit lower-order-statistic rank
    ``floor(q * (n - 1)) + 1`` (1-indexed) — the convention both Spark
    and DuckDB reproduce exactly from the same integer arithmetic (no
    engine-internal interpolation).  The histogram gets a two-phase
    :func:`global_cumsum`; everything after is a single tiny aggregate.
    """
    cum = global_cumsum(hist, key_col, count_col, "_cum")
    tot = hist.agg(F.sum(count_col).alias("_tot"))
    withn = cum.crossJoin(F.broadcast(tot))
    aggs = []
    for i, q in enumerate(quantiles):
        num = int(round(q * 100))
        rank = F.floor(F.lit(num) * (F.col("_tot") - 1) / F.lit(100)) + 1
        aggs.append(
            F.min(
                F.when(F.col("_cum") >= rank, F.col(key_col))
            ).alias(f"p_{i}")
        )
    return withn.agg(*aggs)
