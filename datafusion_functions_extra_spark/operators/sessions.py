"""Event-stream batch operators: tumbling windows and gap sessionization.

Batch-first formulations (SURVEY.md §7 phase 3); the Structured Streaming
variants (watermarked ``F.window``, native ``F.session_window``) live in
:mod:`..streaming.events`.  :func:`session_window_stats` below is the
batch form of the native session-window plan — same results as
:func:`session_stats`, one hash aggregate instead of a window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    unit: str = "hour",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """count / sum(value) / distinct users per (date_trunc(unit, ts), keys).

    One shuffle on (window, keys); count-distinct expands to Spark's
    two-phase distinct aggregate automatically.
    """
    w = F.date_trunc(unit, F.col(ts_col)).alias("window_start")
    return events.groupBy(w, *keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the user's previous event exceeds ``gap_seconds``.

    Plan: one shuffle partitioning by user, then two window functions over
    the same (user, ts) ordering — Spark evaluates both in a single sort,
    so the whole operator is shuffle+sort+project.  Per-user event counts
    are small relative to partitions, and the ordering includes a unique
    tiebreak so results are deterministic.
    """
    order = [F.col(ts_col).asc(), F.col(order_tiebreak).asc()]
    by_user = Window.partitionBy(user_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(by_user)
    is_new = F.when(
        prev.isNull() | (us - prev > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(by_user.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame, gap_seconds: int = 1800, **kw
) -> DataFrame:
    """Per-session rollup: bounds, event count, value sum, duration."""
    s = sessionize(events, gap_seconds, **kw)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup via Spark's native ``session_window`` aggregate.

    Same session-boundary rule as :func:`sessionize` (a strictly larger
    gap starts a new session) but planned as ONE hash aggregate with
    merging session state — no window-function sort, and the identical
    code runs under Structured Streaming (see streaming.events).
    """
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            user_col,
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )
