"""Round-6c: LEFT OUTER stream-stream interval join must reproduce the
batch left join over the same files after an availableNow drain, up to
the watermark-open tail (null rows are emittable only once the final
watermark proves no match can arrive) — with the tail computed from the
query's OWN reported watermark, not guessed."""

from __future__ import annotations

import datetime as dt
import tempfile
import uuid

from pyspark.sql import functions as F

from datafusion_functions_extra_spark.sources.catalog import load_table
from datafusion_functions_extra_spark.streaming import (
    read_events_stream,
    run_available_now,
)
from datafusion_functions_extra_spark.streaming.events import (
    streaming_interval_join,
    streaming_interval_join_outer,
)

SF_DIR = "/root/testdata/sf0.001"


def _drain_with_watermark(sdf):
    name = f"oj_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="dfx-oj-ckpt-")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wm = q.lastProgress["eventTime"].get("watermark")
    spark = sdf.sparkSession
    out = spark.table(name)
    return out, dt.datetime.fromisoformat(wm.replace("Z", "+00:00")).replace(
        tzinfo=None
    )


def test_outer_interval_join_matches_batch(spark):
    stream = read_events_stream(spark, SF_DIR)
    out, wm = _drain_with_watermark(streaming_interval_join_outer(stream))
    got = {(r.left_id, r.right_id) for r in out.collect()}

    e = load_table(spark, SF_DIR, "events")
    left = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("left_id"),
        F.col("ts").alias("left_ts"),
    )
    right = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("right_id"),
        F.col("ts").alias("right_ts"),
    )
    cond = (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("right_ts") >= F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    batch = left.join(right, cond, "leftOuter").select(
        "left_id", "right_id", "left_ts"
    ).collect()

    # the streaming contract: a null row is emittable only if the FINAL
    # watermark (read from the query's own progress) has passed
    # left_ts + 30min; unmatched lefts past that horizon remain in
    # state at drain end.
    want = set()
    still_open = set()
    for r in batch:
        if r.right_id is None and r.left_ts + dt.timedelta(minutes=30) >= wm:
            still_open.add((r.left_id, None))
        else:
            want.add((r.left_id, r.right_id))
    assert got == want
    assert still_open, "fixture should exercise the watermark-open tail"

    # outer ⊇ inner, extras are exactly the unconverted null-right rows
    inner = {
        (r.left_id, r.right_id)
        for r in run_available_now(
            streaming_interval_join(stream), output_mode="append"
        ).collect()
    }
    assert inner <= got
    extras = got - inner
    assert extras and all(rid is None for _, rid in extras)
