"""Binned range join — point-in-interval joins without a cartesian plan.

``point_in_interval_join(points, intervals, ...)`` pairs every point row
with every interval row of the same key whose [start, end] contains the
point's timestamp.  Spark plans a raw ``BETWEEN`` join condition as a
broadcast-nested-loop (or worse, cartesian) — O(|points| x |intervals|)
per key.  The standard scale fix is binning:

1. intervals explode to one row per fixed-width time bin they overlap;
2. points map to their single containing bin;
3. equi-join on (key, bin) — a plain shuffled/broadcast hash join;
4. residual ``BETWEEN`` filter removes same-bin near-misses.

Each (point, interval) pair can meet in exactly one bin (the point's), so
no dedup is needed.  Cost scales with interval_span/bin_width; pick the
bin near the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_seconds: int = 1800,
) -> DataFrame:
    """Join interval rows to every same-key interval row they overlap
    (inclusive bounds: ``l_start <= r_end AND r_start <= l_end``) — the
    interval-interval sibling of :func:`point_in_interval_join`.

    Both sides explode to one row per covered time bin and meet in a
    plain equi-join on (key..., bin).  An overlapping pair shares every
    bin of its intersection, so the join would emit duplicates; instead
    of a ``distinct`` (a second shuffle carrying the whole payload) the
    residual filter keeps each pair only in the ONE bin that contains
    ``greatest(l_start, r_start)`` — the first bin of the intersection —
    making the join exactly-once by construction.  Cost scales with
    span/bin_width per side; at 100 TB both exploded relations
    hash-partition on (key, bin), so skew follows the busiest time bin,
    not the busiest key alone.
    """
    binw = F.lit(bin_seconds * 1_000_000)
    l_lo = (F.unix_micros(F.col(l_start)) / binw).cast("long")
    l_hi = (F.unix_micros(F.col(l_end)) / binw).cast("long")
    r_lo = (F.unix_micros(F.col(r_start)) / binw).cast("long")
    r_hi = (F.unix_micros(F.col(r_end)) / binw).cast("long")

    l = left.withColumn("__bin", F.explode(F.sequence(l_lo, l_hi)))
    r = right.withColumn("__bin", F.explode(F.sequence(r_lo, r_hi)))
    meet = (
        F.unix_micros(F.greatest(F.col(l_start), F.col(r_start))) / binw
    ).cast("long")
    return (
        l.join(r, on + ["__bin"])
        .where(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("__bin") == meet)
        )
        .drop("__bin")
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 1800,
    how: str = "inner",
) -> DataFrame:
    """Join point rows into containing [start_col, end_col] intervals.

    Column names of ``points`` and ``intervals`` must be disjoint apart
    from the ``on`` keys.  Bounds are inclusive on both ends.
    """
    binw = F.lit(bin_seconds * 1_000_000)
    p_bin = (F.unix_micros(F.col(point_ts)) / binw).cast("long")
    i_lo = (F.unix_micros(F.col(start_col)) / binw).cast("long")
    i_hi = (F.unix_micros(F.col(end_col)) / binw).cast("long")

    p = points.withColumn("__bin", p_bin)
    i = intervals.withColumn("__bin", F.explode(F.sequence(i_lo, i_hi)))
    return (
        p.join(i, on + ["__bin"], how)
        .where(
            F.col(point_ts).between(F.col(start_col), F.col(end_col))
            | F.col(start_col).isNull()
        )
        .drop("__bin")
    )
