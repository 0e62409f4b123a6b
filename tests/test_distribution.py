"""Two-phase global-cumsum primitives (functions/distribution.py): must
equal the naive single-partition formulation on any input."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datafusion_functions_extra_spark.functions.distribution import (
    discrete_percentile_cutoffs,
    global_cumsum,
    global_cumsum_multi,
)


@pytest.fixture(scope="module")
def hist(spark):
    # deliberately unsorted input with gaps; keys unique (histogram shape)
    rows = [(k, (k * 7) % 13 + 1) for k in [5, 1, 9, 2, 30, 17, 4, 8, 26, 11]]
    return spark.createDataFrame(rows, "k int, n int")


def test_global_cumsum_matches_naive(hist):
    got = {
        r.k: r.cum for r in global_cumsum(hist, "k", "n", "cum").collect()
    }
    rows = sorted((r.k, r.n) for r in hist.collect())
    acc, want = 0, {}
    for k, n in rows:
        acc += n
        want[k] = acc
    assert got == want


def test_global_cumsum_descending(hist):
    got = {
        r.k: r.cum
        for r in global_cumsum(hist, "k", "n", "cum", ascending=False).collect()
    }
    rows = sorted(((r.k, r.n) for r in hist.collect()), reverse=True)
    acc, want = 0, {}
    for k, n in rows:
        acc += n
        want[k] = acc
    assert got == want


def test_discrete_percentile_cutoffs_match_expansion(hist):
    qs = [0.1, 0.25, 0.5, 0.9]
    row = discrete_percentile_cutoffs(hist, "k", "n", qs).collect()[0]
    expanded = sorted(
        k for k, n in ((r.k, r.n) for r in hist.collect()) for _ in range(n)
    )
    n = len(expanded)
    for i, q in enumerate(qs):
        # lower order statistic at 1-indexed rank floor(q*(n-1)) + 1
        want = expanded[math.floor(round(q * 100) * (n - 1) / 100)]
        assert row[f"p_{i}"] == want, (q, row[f"p_{i}"], want)


def test_global_cumsum_multi_matches_two_singles(hist):
    h2 = hist.withColumn("m", F.col("n") * 3 + 1)
    got = {
        r.k: (r.cn, r.cm)
        for r in global_cumsum_multi(
            h2, "k", {"cn": "n", "cm": "m"}
        ).collect()
    }
    rows = sorted((r.k, r.n, r.m) for r in h2.collect())
    accn = accm = 0
    want = {}
    for k, n, m in rows:
        accn += n
        accm += m
        want[k] = (accn, accm)
    assert got == want


def test_revenue_concentration_matches_bruteforce(spark):
    """customer_revenue_concentration's integer Lorenz arithmetic (Gini
    rank identity with tie groups, within-group k80 fill) must equal the
    naive per-customer expansion."""
    import random

    from datafusion_functions_extra_spark.suite import QUERIES

    row = QUERIES["customer_revenue_concentration"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import duckdb

    cents = [
        int(v)
        for (v,) in duckdb.sql(
            """SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
               FROM '/root/testdata/sf0.001/orders.parquet'
               GROUP BY o_custkey"""
        ).fetchall()
    ]
    xs = sorted(cents)
    n, t = len(xs), sum(xs)
    s_r = sum((i + 1) * x for i, x in enumerate(xs))
    gini = 2.0 * s_r / (n * t) - (n + 1.0) / n
    assert row.n_customers == n
    assert row.total_revenue_cents == t
    assert abs(row.gini - gini) < 2e-6
    # k80: strip customers ascending while the remainder still holds 80%
    k10 = max(1, n // 10)
    assert row.top_decile_n == k10
    top10 = sum(xs[n - k10:])
    assert abs(row.top_decile_share - top10 / t) < 2e-6
    dropped = 0
    acc = 0
    for x in xs:
        if 5 * (acc + x) <= t:
            acc += x
            dropped += 1
        else:
            break
    assert row.k80 == n - dropped


def test_global_cumsum_more_partitions_than_rows(spark):
    tiny = spark.createDataFrame([(1, 2), (2, 3)], "k int, n int")
    got = {r.k: r.cum for r in global_cumsum(tiny, "k", "n", "cum").collect()}
    assert got == {1: 2, 2: 5}


def test_global_cumsum_consistent_over_cached_input(spark):
    """Regression: the ranged relation inside global_cumsum is consumed
    twice (offsets + join); when the INPUT subtree is cached, exchange
    reuse between the two consumers can break, and without the eager
    layout pin each consumer would sample its own range boundaries —
    silently corrupting the running total (observed live in
    docs_perplexity_prune at 8 shuffle partitions).  Cached input +
    repeated runs must reproduce the exact driver-computed cumsum."""
    import random

    from pyspark.sql import functions as F

    from datafusion_functions_extra_spark.functions.distribution import (
        global_cumsum,
    )

    rng = random.Random(7)
    rows = [(rng.random(), rng.randint(1, 9)) for _ in range(5000)]
    expected = {}
    acc = 0
    for k, v in sorted(rows):
        acc += v
        expected[k] = acc
    for _ in range(3):
        df = spark.createDataFrame(rows, "k double, v int").persist()
        got = {
            r.k: r.c
            for r in global_cumsum(df, "k", "v", "c").collect()
        }
        df.unpersist()
        assert got == expected
