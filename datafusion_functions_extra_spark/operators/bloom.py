"""Distributed Bloom-filter build + probe as plain DataFrame algebra.

The 100 TB join-pruning pattern: instead of shuffling a huge fact table to
semi-join against a filtered dimension, build a tiny bit-array sketch of
the dimension keys (one aggregate over the *dimension*), broadcast it, and
probe fact keys with pure expression work — rows that miss the filter are
discarded before any fact-side shuffle.  Spark's own runtime bloom
pushdown (`spark.sql.optimizer.runtime.bloomFilter.enabled`) does this
opaquely inside the optimizer; this operator makes the sketch a
first-class, oracle-checkable DataFrame so pipelines can persist and
reuse it across jobs (e.g. "was this doc id seen in yesterday's crawl").

Everything is deterministic md5 arithmetic (``hash60`` — the same
primitive as the MinHash/sampling modules), so the filter's exact bit
pattern — and therefore every probe verdict, including the false
positives — is reproducible in the DuckDB oracle, bit for bit.

Representation: the m-bit array is stored as ``m/32`` rows of
``(bucket, bits)`` 32-bit words (`bucket = position >> 5`,
`bit = position & 31`).  32-bit words keep ``1 << bit`` comfortably
positive in both engines' signed 64-bit integers.  Build is one hash
aggregate over (k × |keys|) positions; probe is a broadcast equi-join on
bucket, ``k`` rows per probed key, followed by an all-bits-set aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _hash60_sql, hash60

#: default sketch geometry — callers size m at ~10 bits/key for ~1% FP;
#: the suite query deliberately undersizes m to exercise the
#: false-positive path deterministically at test scale
M_BITS = 1 << 16
K_HASHES = 4


def _positions(key: Column, k: int, m_bits: int) -> Column:
    """array of the key's k bit positions: hash60(key || ':' || i) % m."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: hash60(
            F.concat(key.cast("string"), F.lit(":"), i.cast("string"))
        ) % F.lit(m_bits),
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
) -> DataFrame:
    """(bucket, bits): the filter's non-zero 32-bit words.

    One explode to (k × |keys|) positions, one hash aggregate on at most
    ``m/32`` buckets — output is sketch-sized regardless of key count.
    """
    pos = (
        df.select(F.explode(_positions(F.col(key_col), k, m_bits)).alias("pos"))
        # SQL-form shiftleft: the Python wrapper only takes a literal
        # shift amount, the SQL function takes a column
        .select(
            F.expr("pos >> 5").alias("bucket"),
            F.expr("shiftleft(1L, cast(pos & 31 AS INT))").alias("mask"),
        )
    )
    return pos.groupBy("bucket").agg(F.bit_or("mask").alias("bits"))


def bloom_probe(
    probe: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
) -> DataFrame:
    """(key, maybe_present) per distinct probe key.

    The sketch side broadcasts (≤ m/32 rows); each key contributes k
    probe rows joined on bucket, and ``maybe_present`` is the AND over
    its k bit tests — no shuffle of the probe side beyond the per-key
    aggregate, and a real deployment pushes that AND into a filter.
    """
    keys = probe.select(F.col(key_col).alias("key")).distinct()
    probes = keys.select(
        "key", F.explode(_positions(F.col("key"), k, m_bits)).alias("pos")
    ).select(
        "key",
        F.expr("pos >> 5").alias("bucket"),
        F.expr("shiftleft(1L, cast(pos & 31 AS INT))").alias("mask"),
    )
    tested = probes.join(F.broadcast(bloom), "bucket", "left").select(
        "key",
        F.coalesce(
            F.col("bits").bitwiseAND(F.col("mask")) != 0, F.lit(False)
        ).alias("hit"),
    )
    return tested.groupBy("key").agg(F.min("hit").alias("maybe_present"))


def bloom_build_sql(
    keys_cte: str, m_bits: int = M_BITS, k: int = K_HASHES
) -> str:
    """DuckDB CTE body mirroring :func:`bloom_build` over ``{keys_cte}``
    (a CTE named ``keys`` with a single ``key`` column) — splice with
    f-strings so geometry can never desynchronize."""
    h = _hash60_sql("key::VARCHAR || ':' || i::VARCHAR")
    return f"""
pos AS (
  SELECT ({h}) % {m_bits} AS pos
  FROM {keys_cte}, generate_series(0, {k - 1}) g(i)
),
bloom AS (
  SELECT pos >> 5 AS bucket, bit_or(1::BIGINT << (pos & 31)) AS bits
  FROM pos GROUP BY 1
)"""
