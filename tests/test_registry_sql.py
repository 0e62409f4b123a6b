"""SQL-text registry tests: the opt-in pandas-UDAF surface registered by
register_all must match the JVM builders' semantics, including NULL
skipping and per-type variants (reference type dispatch src/mode.rs:101-213)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from datafusion_functions_extra_spark import register_all


@pytest.fixture(scope="module")
def sql(spark):
    register_all(spark)

    def run(q):
        return spark.sql(q).collect()

    return run


def test_typed_mode_int(spark, sql):
    spark.createDataFrame(
        [(1,), (3,), (3,), (None,)], "x bigint"
    ).createOrReplaceTempView("tmode_i")
    [r] = sql("SELECT extra_mode_int(x) AS m FROM tmode_i")
    assert r.m == 3


def test_typed_mode_float_and_tie(spark, sql):
    spark.createDataFrame(
        [(1.5,), (1.5,), (2.5,), (2.5,)], "x double"
    ).createOrReplaceTempView("tmode_f")
    [r] = sql("SELECT extra_mode_float(x) AS m FROM tmode_f")
    assert r.m == 2.5  # tie -> max


def test_typed_mode_date(spark, sql):
    d1, d2 = dt.date(2021, 1, 1), dt.date(2021, 1, 3)
    spark.createDataFrame([(d1,), (d2,), (d2,)], "x date").createOrReplaceTempView(
        "tmode_d"
    )
    [r] = sql("SELECT extra_mode_date(x) AS m FROM tmode_d")
    assert r.m == d2


def test_mode_unsuffixed_is_string(spark, sql):
    spark.createDataFrame(
        [("a",), ("b",), ("b",), (None,)], "x string"
    ).createOrReplaceTempView("tmode_s")
    [r] = sql("SELECT extra_mode(x) AS m FROM tmode_s")
    assert r.m == "b"


def test_numeric_udafs_skip_nulls(spark, sql):
    # golden skewness anchor with NULLs interleaved: NULLs must be skipped,
    # not propagated as NaN (reference .flatten() null-skip)
    vals = [1.0, None, 2.0, 2.0, None, 3.0, 3.0, 3.0]
    spark.createDataFrame([(v,) for v in vals], "x double").createOrReplaceTempView(
        "tskew"
    )
    [r] = sql(
        "SELECT extra_skewness(x) AS s, extra_kurtosis_pop(x) AS kp FROM tskew"
    )
    assert math.isclose(r.s, -0.8573214099741201, rel_tol=1e-12)
    assert r.kp is not None and not math.isnan(r.kp)


def test_max_by_int_null_ordering_ignored(spark, sql):
    rows = [(1, 10.0), (2, None), (3, 15.0), (None, 8.0)]
    spark.createDataFrame(rows, "x bigint, y double").createOrReplaceTempView("tmb")
    [r] = sql(
        "SELECT extra_max_by_int(x, y) AS mx, extra_min_by_int(x, y) AS mn FROM tmb"
    )
    assert r.mx == 3  # NULL y ignored (Spark/DuckDB semantics, not reference's)
    assert r.mn is None  # x at min y=8.0 is NULL


def test_max_by_nan_ordering_ignored(spark, sql):
    rows = [(1, float("nan")), (2, 1.0)]
    spark.createDataFrame(rows, "x bigint, y double").createOrReplaceTempView("tnan")
    [r] = sql("SELECT extra_max_by_int(x, y) AS mx FROM tnan")
    assert r.mx == 2


def test_grouped_sql_mode(spark, sql):
    spark.createDataFrame(
        [("g1", 1), ("g1", 1), ("g2", 5)], "g string, x bigint"
    ).createOrReplaceTempView("tgrp")
    rows = {r.g: r.m for r in sql("SELECT g, extra_mode_int(x) AS m FROM tgrp GROUP BY g")}
    assert rows == {"g1": 1, "g2": 5}


def test_reference_verbatim_sql_with_empty_prefix(spark):
    # prefix="" opt-in: the reference's own SQL text runs unchanged
    # (tests/main.rs:48 `SELECT MODE(utf8_col)`, case-insensitive;
    # main.rs:124 `SELECT max_by(x, y)`).  Registered in an ISOLATED
    # spark.newSession(): the unprefixed temp functions shadow Spark's
    # built-in max_by/min_by in whatever session they land (and Spark
    # refuses to DROP an overriding registration whose name matches a
    # built-in), so verbatim registration belongs in a dedicated session
    # — the pattern the register_all docstring prescribes.
    s2 = spark.newSession()
    names = register_all(s2, prefix="")
    assert "mode" in names and "max_by" in names and "min_by" in names
    s2.createDataFrame(
        [("a",), ("b",), ("b",), (None,)], "utf8_col string"
    ).createOrReplaceTempView("t_verbatim")
    [r] = s2.sql("SELECT MODE(utf8_col) AS m FROM t_verbatim").collect()
    assert r.m == "b"
    s2.createDataFrame(
        [(1, 10), (2, 5), (3, 15), (4, 8)], "x bigint, y bigint"
    ).createOrReplaceTempView("t_verbatim_xy")
    # unsuffixed max_by/min_by alias the string x-variant (pandas UDAFs
    # must declare a return type, unlike the reference's polymorphic
    # UDAF); int-valued x goes through the _int variant
    [r] = s2.sql(
        "SELECT max_by_int(x, y) AS mx, min_by_int(x, y) AS mn FROM t_verbatim_xy"
    ).collect()
    assert (r.mx, r.mn) == (3, 2)
    # the parent session's built-ins must be untouched by the isolated
    # registration — this is the property that makes the opt-in safe
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, 10), (2, 5)], "x int, y int")
    [r] = df.agg(F.max_by("x", "y").alias("m")).collect()
    assert r.m == 1
