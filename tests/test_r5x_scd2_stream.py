"""Round-5x: streaming SCD2 temporal enrichment must reproduce the
batch point-in-interval join over the same files (availableNow), and
must attach the HISTORICAL version — not the latest snapshot."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_functions_extra_spark.sources.catalog import load_table
from datafusion_functions_extra_spark.streaming import (
    read_events_stream,
    run_available_now,
)
from datafusion_functions_extra_spark.streaming.events import (
    streaming_scd2_enrich,
)

SF_DIR = "/root/testdata/sf0.001"


def _purchase_scd2(spark):
    """SCD2 dim built from purchase events: per user, each purchase's
    value is the 'tier' valid until the next purchase."""
    e = load_table(spark, SF_DIR, "events")
    p = e.where(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return p.select(
        "user_id",
        F.col("value").alias("tier_value"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
    )


def test_streaming_scd2_enrich_matches_batch(spark):
    dim = _purchase_scd2(spark)
    stream = read_events_stream(spark, SF_DIR)
    out = run_available_now(
        streaming_scd2_enrich(stream, dim).select(
            "event_id", "tier_value", "valid_from_us"
        ),
        output_mode="append",
    )
    got = {
        r.event_id: (r.tier_value, r.valid_from_us) for r in out.collect()
    }

    e = load_table(spark, SF_DIR, "events")
    d = dim.withColumnRenamed("user_id", "d_user")
    batch = e.join(
        d,
        (F.col("user_id") == F.col("d_user"))
        & (F.unix_micros("ts") >= F.col("valid_from_us"))
        & (
            F.col("valid_to_us").isNull()
            | (F.unix_micros("ts") < F.col("valid_to_us"))
        ),
        "left",
    ).select("event_id", "tier_value", "valid_from_us")
    want = {
        r.event_id: (r.tier_value, r.valid_from_us) for r in batch.collect()
    }
    assert got == want
    # every event matched at most one version (row counts equal)
    assert out.count() == e.count()
    # and the enrichment is genuinely temporal: at least one user has
    # two versions, so some events carry a NON-latest tier
    latest = {
        r.user_id: r.tier_value
        for r in dim.where(F.col("valid_to_us").isNull()).collect()
    }
    ev = {
        r.event_id: r.user_id for r in e.select("event_id", "user_id").collect()
    }
    non_latest = [
        eid
        for eid, (tv, _) in got.items()
        if tv is not None and latest.get(ev[eid]) != tv
    ]
    assert non_latest, "fixture should exercise historical versions"
