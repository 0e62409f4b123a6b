"""Late-data tests for the watermarked streaming operators.

The happy-path replay tests (test_streaming.py) drain every file in one
micro-batch, so the watermark never gets a chance to drop anything — they
prove batch parity, not late-data semantics.  These tests feed each
operator THREE micro-batches (``maxFilesPerTrigger=1``, file mtimes
ordered): an on-time batch that advances the watermark to 10:30, a small
mid batch that advances it to 11:05, then a batch whose event times sit
4+ hours behind the watermark.

Three batches, not two, because Spark carries TWO watermark values per
micro-batch: late-input *filtering* uses the watermark committed as of
the previous batch, while state *eviction/emission* uses the value
updated at the current batch's start.  Late rows landing in batch N+1
right after the advancing batch N therefore sail past the filter (the
filter still holds batch N-1's epoch value) — observed live on Spark 4.1
while writing this test, and the reason a "two-batch" late-data test
silently tests nothing.  With the late rows in batch 2, the filter
watermark is 10:30 and the drops are real.

The contract pinned, in **append** output mode (the deployment shape
every watermarked suite entry documents): late input rows are dropped
(``numRowsDroppedByWatermark``), the emitted result equals the batch
computation restricted to watermark-closed windows, and state size stays
bounded.  Update mode is deliberately NOT tested for drops: there the
watermark only evicts state, and a late row arriving after eviction
re-opens its window.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from datafusion_functions_extra_spark.streaming import (
    streaming_interval_join,
    streaming_moment_stats,
    streaming_session_stats,
    streaming_sliding_counts,
    streaming_tumbling_counts,
)

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _ts(h: int, m: int = 0) -> datetime:
    return datetime(2024, 3, 1, h, m, tzinfo=timezone.utc)


def _row(eid, h, m=0, user=1, etype="click", value=1.0):
    return (eid, _ts(h, m), user, etype, value, "{}")


#: batch 0 (on-time): events 09:00-12:30 -> watermark 10:30 afterwards
ON_TIME = [
    _row(1, 9, 0), _row(2, 9, 20, value=3.0), _row(3, 10, 5),
    _row(4, 10, 40, user=2, value=2.0), _row(5, 11, 10, user=2),
    _row(6, 11, 15, etype="purchase", value=7.0),
    _row(7, 12, 0, user=2, etype="purchase", value=5.0),
    _row(8, 12, 30, value=4.0),
]

#: batch 1 (mid): one fresh event at 13:05 -> watermark 11:05 afterwards
MID = [_row(9, 13, 5, user=3, value=9.0)]

#: batch 2 (late): 05:00-06:00 — 4+ hours behind the 10:30 filter
#: watermark; every window/session these rows belong to closed long ago.
LATE = [
    _row(101, 5, 0, value=100.0), _row(102, 5, 30, user=2, value=100.0),
    _row(103, 6, 0, etype="purchase", value=100.0),
]

#: eviction watermark in force for the final batch: max(ON_TIME ∪ MID) - 2h
WM = _ts(11, 5).replace(tzinfo=None)


def _three_phase_source(spark, tmp_path):
    """Write ON_TIME / MID / LATE as three single-file parquets with
    ordered mtimes; ``maxFilesPerTrigger=1`` replays them as three
    micro-batches (oldest file first)."""
    src = tmp_path / f"src_{uuid.uuid4().hex[:6]}"
    src.mkdir()
    for i, rows in enumerate([ON_TIME, MID, LATE]):
        scratch = tmp_path / f"w{i}_{uuid.uuid4().hex[:6]}"
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(
            str(scratch)
        )
        part = next(p for p in scratch.iterdir() if p.name.endswith(".parquet"))
        dest = src / f"phase{i}.parquet"
        shutil.copy(part, dest)
        os.utime(dest, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )


def _drain(sdf, output_mode):
    """availableNow drain into a memory sink; returns (rows, total rows
    dropped by watermark across all stateful operators and triggers)."""
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dfx-late-ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    return sdf.sparkSession.table(name).collect(), dropped


def _on_time_df(spark):
    """The rows the stream may legitimately aggregate (batches 0+1)."""
    return spark.createDataFrame(ON_TIME + MID, EVENTS_SCHEMA)


def test_tumbling_append_drops_late_and_emits_closed_windows(spark, tmp_path):
    stream = streaming_tumbling_counts(_three_phase_source(spark, tmp_path))
    rows, dropped = _drain(stream, "append")
    got = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in rows}

    batch = (
        _on_time_df(spark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("s"))
        .where(F.col("w.end") <= F.lit(WM))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "s")
    )
    want = {(r.ws, r.event_type): (r.n, r.s) for r in batch.collect()}
    # the drop counter ticks AFTER the map-side partial aggregate, so it
    # counts late (window, type) groups, not raw rows: 2 here (05:00
    # click x2 collapses, 06:00 purchase)
    assert dropped == 2
    assert got == want and len(got) > 0
    # the late 05:00/06:00 windows are behind the watermark: emitting them
    # would mean late rows were admitted after their windows closed
    assert all(ws >= _ts(9).replace(tzinfo=None) for ws, _ in got)


def test_session_append_drops_late_and_emits_closed_sessions(spark, tmp_path):
    stream = streaming_session_stats(
        _three_phase_source(spark, tmp_path), gap="30 minutes"
    )
    rows, dropped = _drain(stream, "append")
    got = {(r.user_id, r.session_start): (r.n_events, r.sum_value) for r in rows}

    # sessions whose end (last event + gap) predates the final 11:05
    # watermark: u1 09:00+09:20 (ends 09:50) and u1 10:05 (ends 10:35);
    # all later on-time sessions are still open, all late sessions dropped
    want = {
        (1, _ts(9).replace(tzinfo=None)): (2, 4.0),
        (1, _ts(10, 5).replace(tzinfo=None)): (1, 1.0),
    }
    assert dropped == len(LATE)
    assert got == want


def test_sliding_append_drops_late_and_emits_closed_windows(spark, tmp_path):
    stream = streaming_sliding_counts(_three_phase_source(spark, tmp_path))
    rows, dropped = _drain(stream, "append")
    got = {r.window_start: (r.n_events, r.sum_value) for r in rows}

    batch = (
        _on_time_df(spark)
        .groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("s"))
        .where(F.col("w.end") <= F.lit(WM))
        .select(F.col("w.start").alias("ws"), "n", "s")
    )
    want = {r.ws: (r.n, r.s) for r in batch.collect()}
    # post-partial-agg groups: each late row lands in window/slide = 2
    # overlapping windows -> 6 dropped group rows
    assert dropped == 6
    assert got == want and len(got) > 0


def test_moment_stats_append_drop_late(spark, tmp_path):
    from datafusion_functions_extra_spark.functions.aggregates import (
        kurtosis,
        kurtosis_pop,
        skewness,
    )
    from datafusion_functions_extra_spark.functions.rounding import r6n

    stream = streaming_moment_stats(_three_phase_source(spark, tmp_path))
    rows, dropped = _drain(stream, "append")
    got = {
        (r.window_start, r.event_type): (r.n, r.skew_value, r.kurt_value, r.kpop_value)
        for r in rows
    }
    batch = (
        _on_time_df(spark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("value").alias("n"),
            r6n(skewness("value")).alias("sk"),
            r6n(kurtosis("value")).alias("ku"),
            r6n(kurtosis_pop("value")).alias("kp"),
        )
        .where(F.col("w.end") <= F.lit(WM))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sk", "ku", "kp")
    )
    want = {(r.ws, r.event_type): (r.n, r.sk, r.ku, r.kp) for r in batch.collect()}
    assert dropped == 2  # late (window, type) groups, post-partial-agg
    # the value=100.0 late outliers would wreck the moments if admitted
    assert got == want and len(got) > 0


def test_interval_join_drops_late_beyond_watermark(spark, tmp_path):
    stream = streaming_interval_join(
        _three_phase_source(spark, tmp_path), within_minutes=120
    )
    rows, dropped = _drain(stream, "append")
    got = {(r.user_id, r.left_id, r.right_id) for r in rows}

    e = _on_time_df(spark)
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("left_id"),
        F.col("ts").alias("left_ts"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("right_id"),
        F.col("ts").alias("right_ts"),
    )
    cond = F.expr(
        "l_user = r_user AND right_ts >= left_ts "
        "AND right_ts <= left_ts + INTERVAL 120 MINUTES"
    )
    want = {
        (r.l_user, r.left_id, r.right_id)
        for r in clicks.join(purchases, cond).collect()
    }
    assert got == want and len(got) > 0
    # late clicks 101/102 and late purchase 103 are dropped on input;
    # none may appear in any joined pair
    assert dropped > 0
    assert not any(lid >= 100 or rid >= 100 for _, lid, rid in got)


def test_hll_registers_append_drops_late_and_matches_closed_windows(
    spark, tmp_path
):
    from datafusion_functions_extra_spark.operators import sketches as SKCH
    from datafusion_functions_extra_spark.streaming.events import (
        streaming_hll_users,
    )

    stream = streaming_hll_users(_three_phase_source(spark, tmp_path))
    rows, dropped = _drain(stream, "append")
    got = {(r.window_start, r.event_type, r.bucket): r.r for r in rows}

    batch = (
        SKCH.hll_registers(
            _on_time_df(spark).withColumn("w", F.window("ts", "1 hour")),
            "user_id",
            ["w", "event_type"],
        )
        .where(F.col("w.end") <= F.lit(WM))
        .select(F.col("w.start").alias("ws"), "event_type", "bucket", "r")
    )
    want = {(r.ws, r.event_type, r.bucket): r.r for r in batch.collect()}
    assert dropped > 0  # late register groups were refused
    assert got == want and len(got) > 0
    # no register window behind the watermark-closed on-time range
    assert all(ws >= _ts(9).replace(tzinfo=None) for ws, _, _ in got)


def test_cms_counters_append_drop_late_and_match_closed_windows(
    spark, tmp_path
):
    from datafusion_functions_extra_spark.operators.similarity import (
        MERSENNE_P,
        hash60,
    )
    from datafusion_functions_extra_spark.operators.sketches import (
        CMS_DEPTH,
        _cms_col,
    )
    from datafusion_functions_extra_spark.streaming.events import (
        streaming_cms_values,
    )

    stream = streaming_cms_values(_three_phase_source(spark, tmp_path))
    rows, dropped = _drain(stream, "append")
    got = {(r.window_start, r.r, r.c): r.cnt for r in rows}

    h = (hash60(F.col("value").cast("string")) % F.lit(MERSENNE_P)).alias("h")
    arr = F.array(
        *[
            F.struct(F.lit(d).alias("r"), _cms_col(F.col("h"), d).alias("c"))
            for d in range(CMS_DEPTH)
        ]
    )
    batch = (
        _on_time_df(spark)
        .select(F.window("ts", "1 hour").alias("w"), h)
        .select("w", F.explode(arr).alias("rc"))
        .where(F.col("w.end") <= F.lit(WM))
        .groupBy(
            F.col("w.start").alias("ws"),
            F.col("rc.r").alias("r"),
            F.col("rc.c").alias("c"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    want = {(r.ws, r.r, r.c): r.cnt for r in batch.collect()}
    assert dropped > 0
    assert got == want and len(got) > 0
