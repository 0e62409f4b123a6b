"""Binned range join semantics on a planted fixture."""

from __future__ import annotations

import datetime as dt

from datafusion_functions_extra_spark.operators.ranges import point_in_interval_join


def ts(m):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=m)


def test_point_in_interval_inclusive_bounds(spark):
    points = spark.createDataFrame(
        [(1, "u", ts(0)), (2, "u", ts(10)), (3, "u", ts(61)), (4, "v", ts(10))],
        "pid bigint, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("u", ts(0), ts(10), "a"), ("u", ts(40), ts(60), "b")],
        "k string, lo timestamp, hi timestamp, tag string",
    )
    got = {
        (r.pid, r.tag)
        for r in point_in_interval_join(
            points, intervals, ["k"], "ts", "lo", "hi", bin_seconds=600
        ).collect()
    }
    # pid1 at lo bound and pid2 at hi bound are inclusive; pid3 is 1 min
    # past interval b (same bin, killed by residual filter); key v matches
    # nothing
    assert got == {(1, "a"), (2, "a")}


def test_interval_spanning_many_bins(spark):
    points = spark.createDataFrame(
        [(1, "u", ts(35))], "pid bigint, k string, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [("u", ts(0), ts(59), "wide")], "k string, lo timestamp, hi timestamp, tag string"
    )
    rows = point_in_interval_join(
        points, intervals, ["k"], "ts", "lo", "hi", bin_seconds=60
    ).collect()
    assert len(rows) == 1 and rows[0].tag == "wide"  # matched once, not per bin


# ---------------------------------------------------------------------------
# interval_overlap_join
# ---------------------------------------------------------------------------

from datafusion_functions_extra_spark.operators.ranges import interval_overlap_join


def _iv(spark, rows, tag_name):
    return spark.createDataFrame(
        rows, f"k string, lo timestamp, hi timestamp, {tag_name} string"
    )


def test_overlap_inclusive_touch_and_containment(spark):
    left = _iv(spark, [("u", ts(0), ts(10), "a"), ("u", ts(20), ts(30), "b")], "la")
    right = _iv(
        spark,
        [("u", ts(10), ts(15), "x"), ("u", ts(0), ts(60), "y"), ("u", ts(31), ts(40), "z")],
        "ra",
    )
    r = interval_overlap_join(
        left.withColumnRenamed("lo", "llo").withColumnRenamed("hi", "lhi"),
        right.withColumnRenamed("lo", "rlo").withColumnRenamed("hi", "rhi"),
        ["k"], "llo", "lhi", "rlo", "rhi", bin_seconds=600,
    )
    got = {(row.la, row.ra) for row in r.collect()}
    # a touches x at the shared minute-10 endpoint (inclusive); y contains
    # both; z starts 1 min after b ends -> no pair
    assert got == {("a", "x"), ("a", "y"), ("b", "y")}


def test_overlap_exactly_once_across_shared_bins(spark):
    # both intervals span many common 1-min bins; the pair must appear once
    left = _iv(spark, [("u", ts(0), ts(59), "a")], "la")
    right = _iv(spark, [("u", ts(5), ts(50), "x")], "ra")
    rows = interval_overlap_join(
        left.withColumnRenamed("lo", "llo").withColumnRenamed("hi", "lhi"),
        right.withColumnRenamed("lo", "rlo").withColumnRenamed("hi", "rhi"),
        ["k"], "llo", "lhi", "rlo", "rhi", bin_seconds=60,
    ).collect()
    assert len(rows) == 1


def test_overlap_key_separation(spark):
    left = _iv(spark, [("u", ts(0), ts(10), "a")], "la")
    right = _iv(spark, [("v", ts(0), ts(10), "x")], "ra")
    assert (
        interval_overlap_join(
            left.withColumnRenamed("lo", "llo").withColumnRenamed("hi", "lhi"),
            right.withColumnRenamed("lo", "rlo").withColumnRenamed("hi", "rhi"),
            ["k"], "llo", "lhi", "rlo", "rhi", bin_seconds=600,
        ).count()
        == 0
    )
