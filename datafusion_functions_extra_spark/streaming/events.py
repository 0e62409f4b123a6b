"""Structured Streaming variants of the event-stream operators.

Batch forms live in :mod:`..operators.sessions`; these are the
``readStream`` -> windowed-aggregate -> ``writeStream`` formulations a
production pipeline runs on a live event feed:

* tumbling windows via ``F.window`` with a watermark bounding state for
  late data;
* gap sessionization via Spark's native ``F.session_window`` — the
  streaming-safe equivalent of the batch lag+cumsum plan (same boundary
  rule: a new session starts when the gap since the previous event
  *exceeds* the threshold).

The file source replays the driver's events parquet, so the streaming
plans are exercised end-to-end locally with ``availableNow`` triggers; on
a cluster the same code points at a directory/Kafka source.  State stays
bounded by the watermark at any scale — the shuffle is keyed on
(window/session, keys) exactly like the batch plans.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: events.parquet physical schema, ts as raw nanos (read via nanosAsLong)
EVENTS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events table with a proper microsecond ``ts``.

    File sources need an explicit schema; ts arrives as TIMESTAMP(NANOS)
    which Spark reads as long under ``nanosAsLong`` (set here at runtime,
    like the batch catalog) and converts with exact integer division.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def streaming_tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """count/sum(value) per (tumbling window, keys) with late-data bound.

    The watermark lets Spark evict window state once event time passes
    window_end + watermark — the piece that makes this run forever on an
    unbounded feed.  (No countDistinct here: distinct aggregation is
    unsupported in update-mode streaming; use approx_count_distinct if an
    estimate is acceptable.)
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def streaming_session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-(user, session) rollup via native ``session_window`` — windows
    merge while consecutive events are within ``gap``; a strictly larger
    gap starts a new session (same rule as the batch lag+cumsum plan)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def run_available_now(sdf: DataFrame, table_name: str | None = None) -> DataFrame:
    """Drain all currently-available input through the streaming plan into
    an in-memory sink and return the result as a batch DataFrame.

    This is the local-test/driver bridge: ``availableNow`` processes every
    existing file then stops, so the call is deterministic and bounded.
    """
    name = table_name or f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="dfx-stream-ckpt-"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)
