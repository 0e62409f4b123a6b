"""As-of join (backward / forward, inclusive) — an operator Spark lacks natively.

``asof_join(left, right, ...)`` attaches, to every left row, the columns
of the right row with the greatest timestamp <= the left row's timestamp
within the same key group (the time-series / attribution join; DuckDB and
pandas ``merge_asof`` ship it built in).

Spark-first formulation — the union-sort trick, no per-row search:

1. union both sides by name, tagging right rows to sort *before* left
   rows at equal timestamps (inclusive semantics);
2. one shuffle partitioning by key, one sort by (ts, side);
3. ``last(value, ignorenulls=True)`` over an unbounded-preceding window
   carries the most recent right values forward onto each left row;
4. filter back to left rows.

Cost: one Exchange + one in-partition sort over |left| + |right| rows —
the same shape as sessionization, linear at 100 TB.  Right rows are
deduplicated to one per (key, ts) first (max tiebreak id wins) so results
are deterministic when the right side has timestamp collisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    tiebreak_col: str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Inclusive as-of join; ``direction`` picks the side of the clock.

    * ``"backward"`` (default) — greatest right ts <= left ts (the
      attribution/price-lookup join; DuckDB ``ASOF ... ON l.ts >= r.ts``).
    * ``"forward"`` — smallest right ts >= left ts (next-event lookup;
      DuckDB ``ASOF ... ON l.ts <= r.ts``).  Same union-sort plan with
      the scan order reversed: carrying "last right seen" while walking
      descending timestamps IS the next right at or after each left row.
    * ``"nearest"`` — whichever of the two is closer in time; equal
      distance resolves backward (pandas ``merge_asof`` convention).
      Computed in a SINGLE pass: both carried sets come from two window
      scans over the same union — same partitioning, so Spark reuses
      one Exchange and only adds the second in-partition sort.

    ``right`` must carry ``on + [ts_col] + value_cols`` (+ optional
    ``tiebreak_col`` for deterministic dedup of equal-ts right rows:
    max wins backward, min wins forward, max for nearest);
    ``value_cols`` must not collide with left column names.  Left rows
    with no match in the chosen direction get NULLs (left-join
    semantics).

    ``tolerance`` (pandas ``merge_asof`` parity): maximum allowed time
    distance between the left row and its matched right row, INCLUSIVE —
    in SECONDS when ``ts_col`` is a timestamp, in the column's own units
    when numeric.  Matches farther away revert to NULLs.  Implemented as
    a post-carry filter on the matched right timestamp, so the plan
    shape (one union + in-partition window scans) is unchanged.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if tiebreak_col is not None:
        # backward/nearest keep the max-tiebreak row among equal-ts right
        # rows, forward the min — mirror images, deterministic either way
        tb = (
            F.col(tiebreak_col).asc()
            if direction == "forward"
            else F.col(tiebreak_col).desc()
        )
        w_dedup = Window.partitionBy(*on, ts_col).orderBy(tb)
        right = (
            right.withColumn("__rn", F.row_number().over(w_dedup))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    right = right.select(*on, ts_col, *value_cols)

    left_cols = left.columns
    # right rows sort before left rows at the same ts -> "<=" semantics
    l_tag = left.withColumn("__side", F.lit(1))
    r_tag = right.withColumn("__side", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    def _carry(w: Window, cols: list[str], prefix: str) -> list:
        return [
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in cols
        ]

    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    is_ts = dict(unioned.dtypes)[ts_col].startswith("timestamp")

    def _within(rts_col):
        if tolerance is None:
            return F.lit(True)
        if is_ts:
            diff = F.abs(
                F.unix_micros(F.col(ts_col)) - F.unix_micros(rts_col)
            )
            return rts_col.isNotNull() & (diff <= int(tolerance * 1_000_000))
        return rts_col.isNotNull() & (
            F.abs(F.col(ts_col) - rts_col) <= tolerance
        )

    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        rts0 = F.when(F.col("__side") == 0, F.col(ts_col))
        filled = unioned.withColumn("__rts", rts0).select(
            "*", *_carry(w, value_cols + ["__rts"], "__asof_")
        )
        ok = _within(F.col("__asof___rts"))
        return filled.where(F.col("__side") == 1).select(
            *left_cols,
            *[
                F.when(ok, F.col(f"__asof_{c}")).alias(c)
                for c in value_cols
            ],
        )

    # nearest: carry both directions plus the matched right timestamp so
    # the per-row winner is decided by time distance (tie -> backward)
    rts = F.when(F.col("__side") == 0, F.col(ts_col))
    both = unioned.withColumn("__rts", rts).select(
        "*",
        *_carry(w_back, value_cols + ["__rts"], "__b_"),
        *_carry(w_fwd, value_cols + ["__rts"], "__f_"),
    )
    t = F.col(ts_col)
    back_wins = F.col("__f___rts").isNull() | (
        F.col("__b___rts").isNotNull()
        & ((t - F.col("__b___rts")) <= (F.col("__f___rts") - t))
    )
    win_rts = F.when(back_wins, F.col("__b___rts")).otherwise(
        F.col("__f___rts")
    )
    ok = _within(win_rts)
    return both.where(F.col("__side") == 1).select(
        *left_cols,
        *[
            F.when(
                ok & back_wins, F.col(f"__b_{c}")
            )
            .when(ok & ~back_wins, F.col(f"__f_{c}"))
            .alias(c)
            for c in value_cols
        ],
    )
