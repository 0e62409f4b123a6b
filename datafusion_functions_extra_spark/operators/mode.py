"""Deterministic ``mode`` as a two-stage DataFrame aggregation.

The reference implements ``mode`` as a per-group hash map of value->count
with NULLs skipped, ties broken by the MAX value, and all-NULL groups
yielding NULL (``/root/reference/src/mode.rs:23-217``,
``src/common/mode/native.rs:109-134``, ``src/common/mode/bytes.rs:117-134``).

Spark-first formulation — the standard scalable "count then argmax" plan:

1. ``groupBy(keys, x).count()``  — map-side partial combine, one shuffle
   keyed on ``(keys, x)``; per-partition state is O(distinct values seen),
   exactly the reference accumulator's hash map, but distributed.
2. ``groupBy(keys).agg(max_by(x, struct(count, x)))`` — one shuffle keyed
   on ``keys``; lexicographic struct ordering reproduces the max-on-tie
   rule deterministically.

At scale this beats any single-pass map<value,count> UDAF: stage 1's key
space ``(keys, x)`` spreads hot groups across the cluster (a built-in skew
dodge), AQE coalesces/splits post-shuffle partitions, and everything stays
in whole-stage codegen.  Spark 3.4+'s native ``F.mode`` is NOT used because
its tie-break is non-deterministic, which would break oracle hashing.

State-size expectation (the one §2.1 operator with a real scale footgun;
the reference documents O(distinct-per-group) accumulator state,
``src/common/mode/native.rs:28``): stage 1's hash-aggregate state is
O(distinct (keys, x) pairs) *per task*, spread over the shuffle — the
distributed analog of the reference's map, bounded by partition count
rather than a single process.  A pathological domain (mode over a
near-unique column) degrades stage 1 to ~input cardinality; that is
inherent to mode, not this plan — the shuffle spills, and the job
completes instead of OOMing a single accumulator.  For skewed domains
keep AQE on (``spark.sql.adaptive.enabled`` plus
``skewJoin.enabled``/``coalescePartitions.enabled``, set in
``sources.get_spark``): stage 1 partials absorb hot (keys, x) pairs
map-side, and AQE re-splits oversized post-shuffle partitions at
runtime.

Type support mirrors the reference dispatch (``src/mode.rs:99-215``):
integers, floats, strings, dates, timestamps; anything else (boolean,
binary, decimal, nested) raises, like the reference's ``not_impl_err``
(``src/mode.rs:207-212``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SUPPORTED: tuple[type, ...] = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.StringType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
)

# Spark 4.0+ has a native TIME type, closing the reference's
# Time32/Time64 dispatch rows (src/mode.rs:151-170) natively; on older
# Spark those columns arrive as bigint nanos-of-day and are covered by
# the LongType row above.
if hasattr(T, "TimeType"):  # pragma: no branch — pyspark >= 4.0 here
    _SUPPORTED = _SUPPORTED + (T.TimeType,)


def _check_type(df: DataFrame, value: str) -> None:
    field = df.schema[value]
    if not isinstance(field.dataType, _SUPPORTED):
        raise TypeError(
            f"mode over {field.dataType.simpleString()} is not supported "
            "(reference parity: src/mode.rs:207-212 — numeric, string, "
            "date and timestamp inputs only)"
        )


def mode_agg(
    df: DataFrame,
    keys: Sequence[str | Column] | None,
    value: str,
    alias: str = "mode",
    *,
    keep_null_groups: bool = True,
) -> DataFrame:
    """Per-group deterministic mode of ``df[value]``.

    ``keys`` empty/None -> global aggregate (always exactly one row, NULL
    when the input is empty or all-NULL, matching the reference's empty
    accumulator).  With ``keep_null_groups`` (default), groups whose values
    are all NULL still appear with a NULL mode, matching per-group
    accumulator semantics — derived from the stage-1 aggregate itself (the
    NULL value-row rides along and stage 2's conditional argmax ignores it),
    so the plan stays one scan + two shuffles either way.  NULL *keys* form
    ordinary groups, like GROUP BY everywhere.  Pass
    ``keep_null_groups=False`` to filter NULL values before the first
    shuffle (smaller stage-1 keyspace; all-NULL groups drop out).

    Signature parity note: the reference declares ``mode`` as
    ``variadic_any`` (``src/mode.rs:57``) but its accumulator dispatch
    only ever consumes the FIRST argument; this builder makes the
    one-value-column contract explicit in the signature instead of
    accepting-and-ignoring extras (passing a list for ``value`` is a
    ``TypeError`` at the ``df[value]`` resolution, loudly).

    Float edge semantics (deliberate micro-deviation): the reference's
    ``FloatModeAccumulator`` hashes raw f64 *bit patterns*
    (``src/common/mode/native.rs:142-261``), so ``-0.0`` and ``0.0`` are
    two distinct candidate keys there.  Spark's NormalizeFloatingNumbers
    rule canonicalizes ``-0.0 == 0.0`` into one groupBy key — and DuckDB
    (the correctness oracle) normalizes the same way — so this
    implementation pins the normalized semantics: a corpus of three
    ``-0.0`` + two ``0.0`` has mode ``0.0`` with count 5 here, versus the
    reference seeing two keys of count 3 and 2.  NaN grouping agrees on
    both engines (NaN is one key; all-NaN input yields NaN).  Pinned by
    ``tests/test_r8_fixes.py::test_float_mode_zero_normalization_and_nan_grouping``.
    """
    _check_type(df, value)
    keys = list(keys or [])
    # Expression keys are materialized under their derived name first;
    # plain string/column references resolve to themselves.
    key_names: list[str] = []
    for k in keys:
        if isinstance(k, str):
            key_names.append(k)
        else:
            name = df.select(k).columns[0]
            df = df.withColumn(name, k)
            key_names.append(name)

    x = F.col(value)
    winner_expr = F.max_by(
        value,
        F.when(x.isNotNull(), F.struct(F.col("__cnt").alias("c"), x.alias("v"))),
    ).alias(alias)

    if not key_names:
        # Global: one row always; filtering NULLs first shrinks the shuffle
        # and an empty post-filter input still yields the single NULL row.
        counted = (
            df.where(x.isNotNull())
            .groupBy(value)
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        return counted.agg(winner_expr)

    src = df if keep_null_groups else df.where(x.isNotNull())
    counted = src.groupBy(*key_names, value).agg(F.count(F.lit(1)).alias("__cnt"))
    return counted.groupBy(*key_names).agg(winner_expr)
