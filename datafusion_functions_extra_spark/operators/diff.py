"""Snapshot diff — the regression harness a data pipeline runs between
two versions of a table (yesterday's crawl vs today's, pre- vs
post-migration): which keys were added, removed, or changed.

Plan: each side reduces to (key, row_hash) — the hash computed
JVM-side from the compared columns with explicit NULL/separator
sentinels so it is engine-reproducible — then one full-outer equi-join
on the key classifies every row.  Nothing ever compares full rows
across the join; the shuffle carries (key, 32-byte hash) regardless of
row width, which is what makes this viable on 100 TB-wide tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ASCII unit separator / NUL — cannot appear in the text corpus columns;
#: explicit sentinels keep ('a', NULL) and ('a', '') distinct
_COL_SEP = "\x1f"
_NULL = "\x00"


def row_hash(cols: list[str]) -> Column:
    """md5 over the sentinel-joined string forms of ``cols`` —
    reproducible anywhere with md5 (DuckDB twin in :func:`row_hash_sql`)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_COL_SEP, *parts).cast("binary"))


def row_hash_sql(cols: list[str]) -> str:
    parts = ", ".join(f"coalesce(CAST({c} AS VARCHAR), chr(0))" for c in cols)
    return f"md5(concat_ws(chr(31), {parts}))"


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(keys..., change_type, old_hash, new_hash) for every key whose
    presence or content differs between ``old`` and ``new``.

    ``change_type`` is 'added' (key only in new), 'removed' (only in
    old), or 'changed' (both sides, hash differs).  Unchanged keys are
    dropped — on a mostly-stable table the output is delta-sized.
    ``compare_cols`` defaults to all non-key columns shared by both
    sides.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    o = old.select(*keys, row_hash(compare_cols).alias("old_hash"))
    n = new.select(*keys, row_hash(compare_cols).alias("new_hash"))
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
    )
    return (
        joined.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(*keys, "change_type", "old_hash", "new_hash")
    )
