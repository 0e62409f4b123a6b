"""Property-based tests (hypothesis): the JVM Column builders must agree
with the pure-Python reference formulas (_numerics) on arbitrary inputs,
and the pipeline operators must be total on empty inputs.

Spark's partial aggregation sums partitions in a different order than the
sequential Python loop, so float comparisons use 1e-9 relative tolerance
(the same tolerance class the driver's oracle hash relies on via 6-dp
rounding).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from datafusion_functions_extra_spark import kurtosis, kurtosis_pop, mode_agg, skewness
from datafusion_functions_extra_spark.functions import _numerics as num

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
values = st.lists(st.one_of(finite, st.none()), min_size=0, max_size=40)

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def close(a, b):
    if a is None or b is None:
        return a is None and b is None
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)


@given(values)
@SET
def test_moment_builders_match_reference_formulas(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals] or [(None,)], "x double")
    if not vals:
        df = df.where("1=0")
    row = df.agg(
        skewness("x").alias("s"), kurtosis("x").alias("k"), kurtosis_pop("x").alias("kp")
    ).collect()[0]
    assert close(row.s, num.skewness_py(vals))
    assert close(row.k, num.kurtosis_py(vals))
    assert close(row.kp, num.kurtosis_pop_py(vals))


@given(st.lists(st.one_of(st.integers(-50, 50), st.none()), min_size=0, max_size=60))
@SET
def test_mode_agg_matches_reference_formula(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals] or [(None,)], "x int")
    if not vals:
        df = df.where("1=0")
    got = mode_agg(df, None, "x").collect()[0][0]
    assert got == num.mode_py(vals)


# --- totality on empty inputs ------------------------------------------------


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


def test_similarity_pipelines_total_on_empty(spark, empty_docs):
    from datafusion_functions_extra_spark.operators import similarity as SIM

    assert SIM.near_dup_pairs(empty_docs, "text", "doc_id").count() == 0
    assert SIM.near_dup_clusters(empty_docs, "text", "doc_id").count() == 0
    assert SIM.simhash_pairs(empty_docs, "text", "doc_id").count() == 0


def test_dedup_and_asof_total_on_empty(spark, empty_docs):
    from datafusion_functions_extra_spark.operators.asof import asof_join
    from datafusion_functions_extra_spark.operators.dedup import exact_dedup

    assert exact_dedup(empty_docs, "text", "doc_id").count() == 0
    left = spark.createDataFrame([], "id bigint, k string, ts timestamp")
    right = spark.createDataFrame([], "k string, ts timestamp, px double")
    assert asof_join(left, right, ["k"], "ts", ["px"]).count() == 0
