"""as-of join semantics on a planted fixture: backward inclusive, NULL
when no prior right row, deterministic tie handling."""

from __future__ import annotations

import datetime as dt

from datafusion_functions_extra_spark.operators.asof import asof_join


def ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, "u", ts(5)), (2, "u", ts(10)), (3, "u", ts(2)), (4, "v", ts(5))],
        "id bigint, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", ts(3), 30.0), ("u", ts(10), 100.0), ("w", ts(1), 1.0)],
        "k string, ts timestamp, px double",
    )
    got = {
        r.id: r.px
        for r in asof_join(left, right, ["k"], "ts", ["px"]).collect()
    }
    assert got[1] == 30.0  # latest right at ts<=5 is ts(3)
    assert got[2] == 100.0  # equal timestamp is inclusive
    assert got[3] is None  # no right row at or before ts(2)... ts(3)>2
    assert got[4] is None  # key with no right rows at all


def test_asof_tie_dedup_max_id(spark):
    left = spark.createDataFrame([(1, "u", ts(5))], "id bigint, k string, ts timestamp")
    right = spark.createDataFrame(
        [("u", ts(5), 1.0, 10), ("u", ts(5), 2.0, 20)],
        "k string, ts timestamp, px double, rid bigint",
    )
    [row] = asof_join(left, right, ["k"], "ts", ["px"], tiebreak_col="rid").collect()
    assert row.px == 2.0  # max tiebreak id wins deterministically


def test_forward_direction(spark):
    from datafusion_functions_extra_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "L1"), (1, 20, "L2"), (2, 5, "L3")], "k int, ts int, lbl string"
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (1, 25, 250.0), (2, 1, 10.0)],
        "k int, ts int, v double",
    )
    out = {
        r.lbl: r.v
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", value_cols=["v"],
            direction="forward",
        ).collect()
    }
    # L1 at ts=10: next right >= 10 is ts=10 (inclusive) -> 100
    # L2 at ts=20: next is ts=25 -> 250
    # L3 at ts=5 for k=2: no right at/after 5 -> NULL
    assert out == {"L1": 100.0, "L2": 250.0, "L3": None}


def test_forward_equal_ts_tiebreak(spark):
    from datafusion_functions_extra_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, "L")], "k int, ts int, lbl string")
    right = spark.createDataFrame(
        [(1, 10, 1, "a"), (1, 10, 2, "b")], "k int, ts int, tb int, v string"
    )
    out = asof_join(
        left, right, on=["k"], ts_col="ts", value_cols=["v"],
        tiebreak_col="tb", direction="forward",
    ).collect()
    assert out[0].v == "a"  # forward dedup keeps the MIN tiebreak row


def test_bad_direction_raises(spark):
    import pytest as _pytest

    from datafusion_functions_extra_spark.operators.asof import asof_join

    df = spark.createDataFrame([(1, 1)], "k int, ts int")
    with _pytest.raises(ValueError):
        asof_join(df, df, on=["k"], ts_col="ts", value_cols=[], direction="sideways")


def test_nearest_direction(spark):
    from datafusion_functions_extra_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "A"), (1, 14, "B"), (1, 30, "C"), (2, 50, "D")],
        "k int, ts int, lbl string",
    )
    right = spark.createDataFrame(
        [(1, 8, 80.0), (1, 16, 160.0)], "k int, ts int, v double"
    )
    out = {
        r.lbl: r.v
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", value_cols=["v"],
            direction="nearest",
        ).collect()
    }
    # A ts=10: back 8 (d=2) vs fwd 16 (d=6) -> 80
    # B ts=14: back 8 (d=6) vs fwd 16 (d=2) -> 160
    # C ts=30: back 16 only -> 160
    # D k=2: no right rows at all -> NULL
    assert out == {"A": 80.0, "B": 160.0, "C": 160.0, "D": None}


def test_nearest_tie_resolves_backward(spark):
    from datafusion_functions_extra_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, "L")], "k int, ts int, lbl string")
    right = spark.createDataFrame(
        [(1, 8, "back"), (1, 12, "fwd")], "k int, ts int, v string"
    )
    out = asof_join(
        left, right, on=["k"], ts_col="ts", value_cols=["v"], direction="nearest"
    ).collect()
    assert out[0].v == "back"  # d=2 both ways -> backward wins
