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


def test_asof_tolerance_matches_pandas(spark):
    """asof_join(tolerance=...) must reproduce pandas merge_asof with a
    Timedelta tolerance for all three directions on real event data."""
    import pandas as pd
    from pyspark.sql import functions as F

    from datafusion_functions_extra_spark.operators.asof import asof_join
    from datafusion_functions_extra_spark.sources.catalog import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    left = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    right = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    lp = left.toPandas().sort_values("ts", kind="mergesort")
    rp = (
        right.toPandas()
        .sort_values(["ts", "click_id"], kind="mergesort")
        # mirror the operator's deterministic equal-ts dedup (max id for
        # backward/nearest) so pandas sees one row per (user, ts)
    )
    tol_s = 3600.0
    for direction in ("backward", "forward", "nearest"):
        keep = "last" if direction != "forward" else "first"
        rp_d = rp.drop_duplicates(["user_id", "ts"], keep=keep)
        got = (
            asof_join(
                left,
                right,
                on=["user_id"],
                ts_col="ts",
                value_cols=["click_id", "click_value"],
                tiebreak_col="click_id",
                direction=direction,
                tolerance=tol_s,
            )
            .toPandas()
            .sort_values(["user_id", "ts", "view_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            lp,
            rp_d,
            on="ts",
            by="user_id",
            direction=direction,
            tolerance=pd.Timedelta(seconds=tol_s),
        ).sort_values(["user_id", "ts", "view_id"], kind="mergesort").reset_index(
            drop=True
        )
        assert len(got) == len(want) > 0
        assert got["view_id"].tolist() == want["view_id"].tolist()
        a = got["click_id"].fillna(-1).astype("int64").tolist()
        b = want["click_id"].fillna(-1).astype("int64").tolist()
        assert a == b, (direction, sum(x != y for x, y in zip(a, b)))
    # tolerance=None superset check: every toleranced match appears in the
    # unbounded join too
    un = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        value_cols=["click_id"], tiebreak_col="click_id",
    ).where(F.col("click_id").isNotNull()).count()
    to = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        value_cols=["click_id"], tiebreak_col="click_id", tolerance=tol_s,
    ).where(F.col("click_id").isNotNull()).count()
    assert to <= un
