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
