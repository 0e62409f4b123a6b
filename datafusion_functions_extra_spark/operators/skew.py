"""Skew-mitigation operators: salted joins and salted aggregation.

AQE's skew-join splitting handles most runtime skew automatically, but a
pipeline sometimes needs *deterministic* skew control (AQE off, stats
missing, or a key so hot one partition exceeds executor memory).  The
classic remedy is salting: spread the hot key across ``n_salts``
sub-keys, replicate the small side per salt, and join/aggregate on
(key, salt).  Results are provably identical to the unsalted plan; only
the shuffle layout changes.

These helpers make the pattern a one-liner and keep it JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated.

    Each large-side row gets one of ``n_salts`` sub-keys (arbitrary but
    conflict-free — any assignment yields the same join result); the small
    side is exploded once per salt, so a key holding X% of the large table
    lands on ``n_salts`` reducers instead of one.  Cost: small side
    shuffled n_salts times — keep it the genuinely-small side.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    large_s = large.withColumn("__salt", salt)
    small_r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return large_s.join(small_r, on + ["__salt"], how).drop("__salt")


def salted_agg_sum_count(
    df: DataFrame,
    keys: list[str],
    value: str,
    n_salts: int = 8,
) -> DataFrame:
    """Two-stage salted sum/count: partial aggregate on (keys, salt), final
    merge on keys.  For algebraic aggregates Spark's map-side combine
    usually makes this unnecessary; it matters when upstream partitioning
    defeats the combine (e.g. immediately after a skewed join shuffle).

    Returns (keys..., n, sum_value).
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum(value).alias("__s"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n"), F.sum("__s").alias("sum_value")
    )


def skew_report(
    df: DataFrame, keys: list[str], top_n: int = 10
) -> DataFrame:
    """One-row-per-hot-key skew diagnosis for a prospective join or
    aggregation on ``keys``: the top-``top_n`` heaviest keys with their
    row counts, each key's share of the relation, the ratio of its
    count to the MEAN key count (the "hot partition multiplier"), and
    a suggested salt factor ``ceil(count / mean)`` capped at 64 — the
    number `salted_join`/`salted_agg_sum_count` needs to flatten that
    key back to average weight.

    Scale shape: one keyed count (the shuffle carries distinct keys),
    one 1-row stats aggregate broadcast back, and a sort+limit head —
    diagnosis costs one pass regardless of relation size."""
    cnt = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    stats = cnt.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("n_total"),
    )
    top = (
        cnt.crossJoin(F.broadcast(stats))
        .select(
            *keys,
            "n_rows",
            "n_keys",
            (F.col("n_rows") / F.col("n_total")).alias("share"),
            (
                F.col("n_rows")
                * F.col("n_keys")
                / F.col("n_total").cast("double")
            ).alias("x_mean"),
        )
        .orderBy(F.col("n_rows").desc(), *[F.col(k).asc() for k in keys])
        .limit(top_n)
    )
    return top.select(
        *keys,
        "n_rows",
        F.round("share", 6).alias("share"),
        F.round("x_mean", 2).alias("x_mean"),
        F.least(
            F.lit(64), F.greatest(F.lit(1), F.ceil("x_mean"))
        ).cast("int").alias("suggested_salts"),
    )
