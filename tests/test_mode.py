"""mode_agg tests — the reference's accumulator grid (F1/F5):
{single clear mode, with NULLs, tie -> max wins, all-NULL -> NULL} per type
(/root/reference/src/common/mode/native.rs:263-637, bytes.rs:156-324,
tests/main.rs:39-115)."""

from __future__ import annotations

import datetime as dt

import pytest

from datafusion_functions_extra_spark import mode_agg


def one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0][-1]


def test_mode_test_table(spark, test_table):
    # tests/main.rs:51-93 golden anchors
    assert one(mode_agg(test_table, None, "utf8_col")) == "apple"
    assert one(mode_agg(test_table, None, "int64_col")) == 3
    assert one(mode_agg(test_table, None, "float64_col")) == 3.0
    assert one(mode_agg(test_table, None, "date64_col")) == dt.date(2021, 1, 3)
    # time64 as nanos-of-day (tests/main.rs:108-114 -> 03:00:00)
    assert one(mode_agg(test_table, None, "time64_col")) == 10_800_000_000_000


def test_mode_tie_max_wins(spark):
    df = spark.createDataFrame([(1,), (1,), (2,), (2,)], "x int")
    assert one(mode_agg(df, None, "x")) == 2
    df = spark.createDataFrame([("a",), ("a",), ("b",), ("b",)], "x string")
    assert one(mode_agg(df, None, "x")) == "b"


def test_mode_nulls_skipped(spark):
    df = spark.createDataFrame([(None,), (3,), (3,), (1,)], "x int")
    assert one(mode_agg(df, None, "x")) == 3


def test_mode_all_null_global(spark):
    df = spark.createDataFrame([(None,), (None,)], "x int")
    assert one(mode_agg(df, None, "x")) is None


def test_mode_empty_global(spark):
    df = spark.createDataFrame([(1,)], "x int").where("1=0")
    assert one(mode_agg(df, None, "x")) is None


def test_mode_grouped(spark):
    df = spark.createDataFrame(
        [("g1", 1), ("g1", 1), ("g1", 2), ("g2", 5), ("g2", None), ("g3", None)],
        "g string, x int",
    )
    rows = {r.g: r.m for r in mode_agg(df, ["g"], "x", alias="m").collect()}
    assert rows == {"g1": 1, "g2": 5, "g3": None}  # all-NULL group kept as NULL


def test_mode_grouped_drop_null_groups(spark):
    df = spark.createDataFrame([("g1", 1), ("g3", None)], "g string, x int")
    rows = mode_agg(df, ["g"], "x", alias="m", keep_null_groups=False).collect()
    assert {r.g for r in rows} == {"g1"}


def test_mode_timestamp(spark):
    t = dt.datetime(2021, 1, 3, 12, 0, 0)
    df = spark.createDataFrame(
        [(dt.datetime(2021, 1, 1, 1, 0, 0),), (t,), (t,)], "x timestamp"
    )
    assert one(mode_agg(df, None, "x")) == t


def test_mode_null_key_group(spark):
    # GROUP BY groups NULL keys; their mode must be computed normally, not
    # blanked (regression: the old distinct+left-join plan never matched
    # NULL keys in the equi-join).
    df = spark.createDataFrame(
        [(None, 7), (None, 7), (None, 1), ("g1", 2)], "g string, x int"
    )
    rows = {r.g: r.m for r in mode_agg(df, ["g"], "x", alias="m").collect()}
    assert rows == {None: 7, "g1": 2}


def test_mode_expression_key(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 1), ("A", 1), ("A", 2), ("b", 9)], "g string, x int"
    )
    res = mode_agg(df, [F.upper("g").alias("gu")], "x", alias="m")
    rows = {r.gu: r.m for r in res.collect()}
    assert rows == {"A": 1, "B": 9}


def test_mode_plan_single_scan(spark, test_table):
    # keep_null_groups must not cost an extra scan + join: the plan is
    # scan -> aggregate -> exchange -> aggregate -> exchange -> aggregate.
    plan = mode_agg(test_table, ["utf8_col"], "int64_col")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_mode_unsupported_type_raises(spark):
    df = spark.createDataFrame([(True,), (False,)], "x boolean")
    with pytest.raises(TypeError, match="not supported"):
        mode_agg(df, None, "x")


def test_mode_native_timetype(spark):
    """Spark 4.0+ native TIME closes the reference's Time32/Time64
    dispatch rows (src/mode.rs:151-170) without the bigint nanos-of-day
    detour: the same {clear mode, NULL-skip, tie -> max, all-NULL ->
    NULL} grid over a time(6) column.  Requires the TIME feature flag
    (grouping on TIME is gated behind spark.sql.timeType.enabled)."""
    from pyspark.sql import types as T

    if not hasattr(T, "TimeType"):
        pytest.skip("pyspark < 4.0: no native TimeType")
    prev = spark.conf.get("spark.sql.timeType.enabled", "false")
    spark.conf.set("spark.sql.timeType.enabled", "true")
    try:
        schema = T.StructType(
            [
                T.StructField("g", T.StringType()),
                T.StructField("t", T.TimeType()),
            ]
        )
        df = spark.createDataFrame(
            [
                # clear winner
                ("clear", dt.time(3, 0)),
                ("clear", dt.time(3, 0)),
                ("clear", dt.time(1, 30, 15, 250000)),
                # NULLs skipped, winner among non-NULLs
                ("nulls", None),
                ("nulls", dt.time(7, 45)),
                ("nulls", dt.time(7, 45)),
                ("nulls", dt.time(23, 59, 59, 999999)),
                # tie -> MAX time wins
                ("tie", dt.time(1, 0)),
                ("tie", dt.time(2, 0)),
                # all-NULL group -> NULL mode
                ("allnull", None),
            ],
            schema,
        )
        rows = {r.g: r.m for r in mode_agg(df, ["g"], "t", alias="m").collect()}
        assert rows == {
            "clear": dt.time(3, 0),
            "nulls": dt.time(7, 45),
            "tie": dt.time(2, 0),
            "allnull": None,
        }
        # global over the same relation: 3:00 and 7:45 tie at 2 -> max
        assert one(mode_agg(df, None, "t")) == dt.time(7, 45)
    finally:
        spark.conf.set("spark.sql.timeType.enabled", prev)
