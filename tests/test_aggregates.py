"""Spark-side golden tests for the six aggregates — mirrors the reference
integration suite /root/reference/tests/main.rs (F1/F2/F4 fixtures).

1:1 anchor index (reference tests/main.rs -> pytest id):

  main.rs:48-93    mode utf8/int64/float64/date64   -> test_mode.py::test_mode_test_table
  main.rs:95-115   mode time64 (no Spark TIME type) -> test_mode.py::test_mode_test_table
                   (nanos-of-day long; SURVEY §1.2 documents the mapping)
  main.rs:121-149  max_by/min_by int grid           -> test_max_by_min_by_ints
  main.rs:151-175  max_by/min_by strings by length  -> test_max_by_strings_by_length
  main.rs:177-205  NULL ordering grid               -> test_max_by_null_ordering_ignored
                   (pinned deviation) + test_max_by_null_wins_reference_semantics
                   (reference-exact opt-in, both return 2)
  main.rs:207-231  single-row grid                  -> test_max_by_single_row_and_empty
  main.rs:233-262  empty relation WHERE 1=0         -> test_max_by_single_row_and_empty
  main.rs:272-297  kurtosis_pop int64/float64       -> test_kurtosis_pop_golden
  main.rs:299-322  kurtosis_pop single/literal/null -> test_kurtosis_pop_single_value
  main.rs:336-361  skewness int64/float64           -> test_skewness_golden
  main.rs:363-384  skewness literal / n=2           -> test_skewness_small_n
  main.rs:389-404  kurtosis 5-value golden          -> test_kurtosis_golden
  main.rs:416-426  kurtosis n=3                     -> test_kurtosis_n3_null
  main.rs:427-458  kurtosis literal int/float/null  -> test_kurtosis_null_literalish
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datafusion_functions_extra_spark import (
    kurtosis,
    kurtosis_pop,
    max_by,
    min_by,
    skewness,
)


def one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0][0]


# --- skewness (tests/main.rs:328-384) -------------------------------------

def test_skewness_golden(spark, test_table):
    v = one(test_table.agg(skewness("float64_col")))
    assert v == -0.8573214099741201
    # int column goes through implicit double cast (tests/main.rs:336-347)
    v = one(test_table.agg(skewness("int64_col")))
    assert v == -0.8573214099741201


def test_skewness_small_n(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    assert one(df.agg(skewness("x"))) is None
    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    assert one(df.agg(skewness("x"))) is None


def test_skewness_zero_variance(spark):
    df = spark.createDataFrame([(5.0,), (5.0,), (5.0,)], "x double")
    assert one(df.agg(skewness("x"))) is None


def test_skewness_empty(spark):
    df = spark.createDataFrame([(1.0,)], "x double").where("1=0")
    assert one(df.agg(skewness("x"))) is None


# --- kurtosis (tests/main.rs:386-458) --------------------------------------

def test_kurtosis_golden(spark):
    df = spark.createDataFrame([(1.0,), (10.0,), (100.0,), (10.0,), (1.0,)], "x double")
    assert one(df.agg(kurtosis("x"))) == 4.777292927667962


def test_kurtosis_n3_null(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x double")
    assert one(df.agg(kurtosis("x"))) is None


def test_kurtosis_null_literalish(spark):
    df = spark.createDataFrame([(None,)], "x double")
    assert one(df.agg(kurtosis("x"))) is None


# --- kurtosis_pop (tests/main.rs:264-326) -----------------------------------

def test_kurtosis_pop_golden(spark, test_table):
    assert one(test_table.agg(kurtosis_pop("float64_col"))) == -0.9599999999999755
    assert one(test_table.agg(kurtosis_pop("int64_col"))) == -0.9599999999999755


def test_kurtosis_pop_single_value(spark):
    # main.rs:299-312 (single value / literal 1.0) and :314-322 (null)
    df = spark.createDataFrame([(1.0,)], "x double")
    assert one(df.agg(kurtosis_pop("x"))) is None
    null_df = spark.createDataFrame([(None,)], "x double")
    assert one(null_df.agg(kurtosis_pop("x"))) is None


# --- max_by / min_by (tests/main.rs:117-262, F2) ----------------------------

def test_max_by_min_by_ints(spark):
    df = spark.createDataFrame([(1, 10), (2, 5), (3, 15), (4, 8)], "x int, y int")
    row = df.agg(
        max_by("x", "y").alias("mx"), min_by("x", "y").alias("mn")
    ).collect()[0]
    assert (row.mx, row.mn) == (3, 2)


def test_max_by_strings_by_length(spark):
    df = spark.createDataFrame([("Alice",), ("Bob",), ("Charlie",)], "name string")
    row = df.agg(
        max_by("name", F.length("name")).alias("mx"),
        min_by("name", F.length("name")).alias("mn"),
    ).collect()[0]
    assert (row.mx, row.mn) == ("Charlie", "Bob")


def test_max_by_null_ordering_ignored(spark):
    # Pinned deviation (SURVEY §2 row 2): NULL y is IGNORED (Spark/DuckDB),
    # whereas the reference treats it as greatest (tests/main.rs:177-205).
    df = spark.createDataFrame([(1, 10), (2, None), (3, 15), (None, 8)], "x int, y int")
    row = df.agg(
        max_by("x", "y", deterministic=True).alias("mx"),
        min_by("x", "y", deterministic=True).alias("mn"),
    ).collect()[0]
    assert (row.mx, row.mn) == (3, None)  # min y=8 row has x=NULL


def test_max_by_null_wins_reference_semantics(spark):
    # Reference exact semantics opt-in (src/max_min_by.rs:90-113 rewrite to
    # last_value .. NULLS LAST): the NULL-y row WINS for both max_by and
    # min_by — pinned to the tests/main.rs:177-205 fixture where both
    # return 2 over (1,10),(2,NULL),(3,15),(NULL,8).
    df = spark.createDataFrame([(1, 10), (2, None), (3, 15), (None, 8)], "x int, y int")
    row = df.agg(
        max_by("x", "y", null_wins=True).alias("mx"),
        min_by("x", "y", null_wins=True).alias("mn"),
    ).collect()[0]
    assert (row.mx, row.mn) == (2, 2)
    # without NULL ordering values, null_wins degrades to plain max_by/min_by
    # (tests/main.rs:121-149: max_by -> 3, min_by -> 2)
    clean = spark.createDataFrame([(1, 10), (2, 5), (3, 15), (4, 8)], "x int, y int")
    row = clean.agg(
        max_by("x", "y", null_wins=True, deterministic=True).alias("mx"),
        min_by("x", "y", null_wins=True, deterministic=True).alias("mn"),
    ).collect()[0]
    assert (row.mx, row.mn) == (3, 2)


def test_max_by_single_row_and_empty(spark):
    df = spark.createDataFrame([(1, 10)], "x int, y int")
    row = df.agg(max_by("x", "y").alias("mx"), min_by("x", "y").alias("mn")).collect()[0]
    assert (row.mx, row.mn) == (1, 1)
    empty = df.where("1=0")
    row = empty.agg(max_by("x", "y").alias("mx"), min_by("x", "y").alias("mn")).collect()[0]
    assert (row.mx, row.mn) == (None, None)


def test_max_by_deterministic_tiebreak(spark):
    df = spark.createDataFrame([(1, 10), (2, 10), (3, 5)], "x int, y int")
    row = df.agg(
        max_by("x", "y", deterministic=True).alias("mx"),
        min_by("x", "y", deterministic=True).alias("mn"),
    ).collect()[0]
    assert row.mx == 2  # tie on y=10 -> larger x
    assert row.mn == 3


def test_max_by_type_combinations(spark):
    # F3 — src/max_min_by.rs:326-469 (dictionary column folds into string)
    df = spark.createDataFrame(
        [("b", 0, 0.5), ("a", -1, 0.25), ("c", 1, 0.75)],
        "string string, int64 bigint, float64 double",
    )
    row = df.agg(
        max_by("string", "int64").alias("a"),
        max_by("string", "float64").alias("b"),
        max_by("float64", "string").alias("c"),
        max_by("int64", "string").alias("d"),
        min_by("string", "int64").alias("e"),
        min_by("float64", "string").alias("f"),
    ).collect()[0]
    assert (row.a, row.b, row.c, row.d, row.e, row.f) == (
        "c", "c", 0.75, 1, "a", 0.25,
    )


# --- grouped variants (inherent to UDAF contract, SURVEY §2.3) ---------------

def test_grouped_stats(spark):
    import datafusion_functions_extra_spark.functions._numerics as num

    data = [("a", float(v)) for v in [1, 2, 2, 3, 3, 3]] + [
        ("b", float(v)) for v in [1, 10, 100, 10, 1]
    ]
    df = spark.createDataFrame(data, "g string, x double")
    rows = {
        r.g: r
        for r in df.groupBy("g")
        .agg(
            skewness("x").alias("sk"),
            kurtosis("x").alias("k"),
            kurtosis_pop("x").alias("kp"),
        )
        .collect()
    }
    assert math.isclose(rows["a"].sk, -0.8573214099741201, rel_tol=1e-12)
    assert math.isclose(rows["b"].k, 4.777292927667962, rel_tol=1e-12)
    assert math.isclose(
        rows["a"].kp, num.kurtosis_pop_py([1, 2, 2, 3, 3, 3]), rel_tol=1e-12
    )


def test_binned_percentiles_within_bin_width_of_exact(spark):
    """The 256-bin histogram estimate must sit within half a bin width
    of the exact percentile (midpoint rule) for every group/percentile."""
    from pyspark.sql import functions as F

    from datafusion_functions_extra_spark import suite

    sf = "/root/testdata/sf0.001"
    est = {
        r.l_returnflag: r
        for r in suite.QUERIES["price_quantiles_binned"](spark, sf).collect()
    }
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    for flag, e in est.items():
        x = exact[flag]
        half_bin = (x.hi - x.lo) / 256 / 2
        for p in ("p50", "p90", "p99"):
            got = getattr(e, f"{p}_est")
            true = getattr(x, p)
            # midpoint of the covering bin: within half a bin width, plus
            # one bin of slack for the discrete rank-vs-interpolated gap
            assert abs(got - true) <= 3 * half_bin, (flag, p, got, true)
