"""Gap-fill + interpolation (operators/timeseries.py) and the round-2
join/profile/sampling suite additions."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datafusion_functions_extra_spark.operators.timeseries import gap_fill_interpolate


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def series(spark):
    # key "a": hours 0, 1, 4 observed (gap at 2, 3); key "b": single hour.
    rows = [
        ("a", _ts(0, 10), 10.0),
        ("a", _ts(0, 50), 20.0),
        ("a", _ts(1, 5), 6.0),
        ("a", _ts(4, 0), 90.0),
        ("b", _ts(2, 30), 5.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_gap_fill_dense_grid(series):
    out = gap_fill_interpolate(series, "k", "ts", "v").orderBy("k", "bucket_us")
    rows = out.collect()
    # key a: hours 0..4 inclusive = 5 buckets; key b: 1 bucket
    assert [r.k for r in rows] == ["a"] * 5 + ["b"]
    assert [r.is_gap for r in rows] == [0, 0, 1, 1, 0, 0]
    assert [r.n_events for r in rows] == [2, 1, 0, 0, 1, 1]


def test_gap_fill_linear_interpolation(series):
    out = {
        (r.k, r.bucket_us): r.value_filled
        for r in gap_fill_interpolate(series, "k", "ts", "v").collect()
    }
    h = 3_600_000_000  # one hour in micros
    base = int(dt.datetime(2024, 1, 1).timestamp()) * 1_000_000
    assert out[("a", base)] == 30.0  # observed: 10+20
    assert out[("a", base + h)] == 6.0
    # linear between 6.0 (hour 1) and 90.0 (hour 4): 6 + 84*(1/3), 6 + 84*(2/3)
    assert out[("a", base + 2 * h)] == 34.0
    assert out[("a", base + 3 * h)] == 62.0
    assert out[("a", base + 4 * h)] == 90.0
    assert out[("b", base + 2 * h)] == 5.0


def test_gap_fill_edge_fill(spark):
    # value NULL in an *observed* bucket (all-NULL sums) takes the nearest
    # neighbor fill path; leading gap back-fills from the first observed.
    rows = [
        ("x", _ts(0), None),
        ("x", _ts(2), 8.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        r.bucket_us % (10**12): (r.value_filled, r.is_gap, r.n_events)
        for r in gap_fill_interpolate(df, "k", "ts", "v").collect()
    }
    h = 3_600_000_000
    base = int(dt.datetime(2024, 1, 1).timestamp()) * 1_000_000 % (10**12)
    assert out[base] == (8.0, 0, 1)  # observed bucket, null sum -> backfill
    assert out[base + h] == (8.0, 1, 0)  # gap bucket
    assert out[base + 2 * h] == (8.0, 0, 1)


def test_edit_distance_verified_pairs(spark):
    from datafusion_functions_extra_spark.operators.similarity import (
        edit_distance_verified_pairs,
    )

    text = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (1, text),
        (2, text.replace("lazy", "hazy")),  # near dup, 1 edit
        (3, "completely different content that shares nothing at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = edit_distance_verified_pairs(df, "text", "doc_id", min_similarity=0.8).collect()
    assert [(r.id_a, r.id_b, r.edit_dist) for r in got] == [(1, 2, 1)]
    assert got[0].edit_sim == round(1 - 1 / len(text), 6)


def test_weighted_sample_probability(spark):
    from datafusion_functions_extra_spark.functions.sampling import weighted_sample

    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("w")
    )
    kept = weighted_sample(df, "id", "w", scale=100.0)
    got = kept.groupBy((F.col("w") >= 50).alias("heavy")).count().collect()
    counts = {r.heavy: r["count"] for r in got}
    # heavier rows must be kept substantially more often; all w=0 rows drop
    assert counts[True] > counts[False] > 0
    assert kept.where(F.col("w") == 0).count() == 0
    # determinism: same rows survive on a different partitioning
    again = weighted_sample(df.repartition(7), "id", "w", scale=100.0)
    assert sorted(r.id for r in again.collect()) == sorted(
        r.id for r in kept.collect()
    )


class TestEwma:
    def test_hand_computed(self, spark):
        from datafusion_functions_extra_spark.operators.timeseries import (
            ewma_bounded,
        )

        df = spark.createDataFrame(
            [(1, 1, 100, 10.0), (1, 2, 200, 20.0), (1, 3, 300, 30.0)],
            "k int, eid int, ts long, v double",
        ).select(
            "k", "eid", F.timestamp_micros(F.col("ts")).alias("ts"), "v"
        )
        out = {
            r.eid: r.ewma
            for r in ewma_bounded(df, "k", "ts", "v", "eid", n=10, alpha=0.2).collect()
        }
        # eid=3: (30 + 20*0.8 + 10*0.64) / (1 + 0.8 + 0.64) = 52.4/2.44
        assert out[1] == 10.0
        assert abs(out[3] - round(52.4 / 2.44, 6)) < 2e-6

    def test_recent_weighted_harder_than_mean(self, spark):
        from datafusion_functions_extra_spark.operators.timeseries import (
            ewma_bounded,
        )

        rows = [(1, i, i * 100, 0.0 if i < 10 else 100.0) for i in range(1, 11)]
        df = spark.createDataFrame(
            rows, "k int, eid int, ts long, v double"
        ).select("k", "eid", F.timestamp_micros(F.col("ts")).alias("ts"), "v")
        out = {
            r.eid: r.ewma
            for r in ewma_bounded(df, "k", "ts", "v", "eid", n=10, alpha=0.2).collect()
        }
        # last row: single 100 among nine 0s -> mean 10, EWMA much higher
        assert out[10] > 20.0
