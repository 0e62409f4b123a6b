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
