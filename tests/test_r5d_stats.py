"""Planted-fixture tests for the round-5d batch: rank-sum AUC,
Kaplan-Meier survival, HRW sharding, plus self-consistency checks for
the Welch/chi-square/bitmap/HLL-set-ops/incremental-view/alignment
suite queries on the sf0.001 corpus (cross-engine hash parity is the
oracle sweep's job; these pin the *semantics*)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datafusion_functions_extra_spark import suite
from datafusion_functions_extra_spark.functions.distribution import rank_sum_auc
from datafusion_functions_extra_spark.functions.sampling import hrw_shard
from datafusion_functions_extra_spark.operators.timeseries import kaplan_meier

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# rank_sum_auc
# ---------------------------------------------------------------------------


def _brute_auc(pairs):
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    tot = 0.0
    for p in pos:
        for n in neg:
            tot += 1.0 if p > n else (0.5 if p == n else 0.0)
    return tot / (len(pos) * len(neg))


def test_rank_sum_auc_matches_bruteforce_with_ties(spark):
    rows = [
        (0.1, 0), (0.2, 0), (0.2, 1), (0.3, 1), (0.3, 0), (0.3, 0),
        (0.4, 1), (0.4, 1), (0.5, 0), (0.6, 1),
    ]
    df = spark.createDataFrame(rows, "score double, y int")
    got = rank_sum_auc(df, "score", "y").collect()[0]
    assert got.n_pos == 5 and got.n_neg == 5 and got.n_scores == 6
    assert abs(got.auc - _brute_auc(rows)) < 2e-6


def test_rank_sum_auc_separable_extremes(spark):
    perfect = [(float(i), 1 if i >= 5 else 0) for i in range(10)]
    df = spark.createDataFrame(perfect, "score double, y int")
    assert abs(rank_sum_auc(df, "score", "y").collect()[0].auc - 1.0) < 2e-6
    inverted = [(float(i), 0 if i >= 5 else 1) for i in range(10)]
    df = spark.createDataFrame(inverted, "score double, y int")
    assert abs(rank_sum_auc(df, "score", "y").collect()[0].auc - 0.0) < 2e-6


# ---------------------------------------------------------------------------
# kaplan_meier
# ---------------------------------------------------------------------------


def test_kaplan_meier_hand_example(spark):
    # durations: 1 death; 2 death + 2 censored; 3 death (exhausts risk set)
    lab = spark.createDataFrame(
        [(1, 0), (2, 0), (2, 1), (3, 0)], "dur int, cens int"
    )
    rows = {r.duration_days: r for r in kaplan_meier(lab).collect()}
    assert rows[1].at_risk == 4 and abs(rows[1].survival - 0.75) < 2e-6
    assert rows[2].n_death == 1 and rows[2].n_censored == 1
    assert rows[2].at_risk == 3 and abs(rows[2].survival - 0.5) < 2e-6
    # d == at_risk at t=3 -> absorbing zero, exactly
    assert rows[3].at_risk == 1 and rows[3].survival == 0.0


def test_kaplan_meier_all_censored_stays_flat(spark):
    lab = spark.createDataFrame(
        [(5, 1), (7, 1), (7, 1), (9, 1)], "dur int, cens int"
    )
    for r in kaplan_meier(lab).collect():
        assert abs(r.survival - 1.0) < 2e-6
        assert r.n_death == 0


# ---------------------------------------------------------------------------
# hrw_shard
# ---------------------------------------------------------------------------


def test_hrw_moves_only_into_the_new_shard(spark):
    keys = spark.createDataFrame([(i,) for i in range(200)], "k bigint")
    a8 = hrw_shard(keys, "k", 8, "s8")
    a9 = hrw_shard(keys, "k", 9, "s9")
    j = a8.join(a9, "k").collect()
    moved = [r for r in j if r.s8 != r.s9]
    # HRW's whole point: additions steal, never reshuffle
    assert all(r.s9 == 8 for r in moved)
    # expected move fraction 1/9 ~ 0.11; generous bound
    assert 0 < len(moved) / len(j) < 0.35


def test_hrw_deterministic_and_covering(spark):
    keys = spark.createDataFrame([(i,) for i in range(200)], "k bigint")
    one = sorted((r.k, r.s8) for r in hrw_shard(keys, "k", 8, "s8").collect())
    two = sorted((r.k, r.s8) for r in hrw_shard(keys, "k", 8, "s8").collect())
    assert one == two
    by_shard = {}
    for _, s in one:
        by_shard[s] = by_shard.get(s, 0) + 1
    assert set(by_shard) == set(range(8))  # every shard populated


# ---------------------------------------------------------------------------
# suite-query semantics on sf0.001
# ---------------------------------------------------------------------------


def test_bitmap_distinct_equals_exact(spark):
    rows = suite.QUERIES["weekly_user_bitmap_distinct"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.bitmap_distinct == r.exact_users


def test_hll_set_ops_inclusion_exclusion(spark):
    rows = {r.set_name: r for r in suite.QUERIES["hll_set_ops"](spark, SF_DIR).collect()}
    assert set(rows) == {"purchase", "click", "union", "intersection"}
    ie = rows["purchase"].hll_est + rows["click"].hll_est - rows["union"].hll_est
    assert abs(rows["intersection"].hll_est - ie) < 1e-6 + 1e-8
    assert rows["intersection"].exact_users <= min(
        rows["purchase"].exact_users, rows["click"].exact_users
    )
    assert rows["union"].exact_users >= max(
        rows["purchase"].exact_users, rows["click"].exact_users
    )
    assert rows["intersection"].n_zero_buckets is None


def test_incremental_view_merge_equals_direct(spark):
    got = sorted(
        suite.QUERIES["orders_incremental_view_merge"](spark, SF_DIR).collect(),
        key=lambda r: r.o_custkey,
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    want = sorted(
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 6).alias("total_spend"),
            F.max("o_totalprice").alias("max_order_price"),
            F.max(F.unix_date(F.col("o_orderdate").cast("date"))).alias(
                "last_order_day"
            ),
        )
        .collect(),
        key=lambda r: r.o_custkey,
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.o_custkey == w.o_custkey
        assert g.n_orders == w.n_orders
        assert g.max_order_price == w.max_order_price
        assert g.last_order_day == w.last_order_day
        assert abs(g.total_spend - w.total_spend) < 2e-6


def test_welch_t_sign_and_df_bounds(spark):
    rows = suite.QUERIES["event_type_welch_t"](spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5,2) type pairs
    for r in rows:
        assert r.type_a < r.type_b
        if r.mean_a != r.mean_b:
            assert math.copysign(1, r.t_stat) == math.copysign(
                1, r.mean_a - r.mean_b
            )
        # Welch df lies in [min(na,nb)-1, na+nb-2]
        assert min(r.n_a, r.n_b) - 1 <= r.welch_df <= r.n_a + r.n_b - 2


def test_chi2_grid_margins(spark):
    rows = suite.QUERIES["lang_source_chi2"](spark, SF_DIR).collect()
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_lang = d.select("lang").distinct().count()
    n_src = d.select("source").distinct().count()
    total = d.count()
    assert len(rows) == n_lang * n_src  # full grid incl. zero cells
    assert sum(r.n for r in rows) == total
    assert abs(sum(r.expected for r in rows) - total) < 1e-3
    assert all(r.chi2_term >= 0 for r in rows)


def test_alignment_uniformity_bounds(spark):
    r = suite.QUERIES["embedding_alignment_uniformity"](spark, SF_DIR).collect()[0]
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert r.n_rand_pairs == n
    assert 0.0 <= r.alignment <= 4.0
    assert r.uniformity <= 1e-9  # ln of a mean of values <= 1
    # positives should be at least as aligned as random pairs:
    # uniformity of perfectly-aligned pairs would be 0
    assert r.n_pos_pairs > 0


def test_survival_curve_shape(spark):
    rows = sorted(
        suite.QUERIES["users_survival_curve"](spark, SF_DIR).collect(),
        key=lambda r: r.duration_days,
    )
    assert rows
    # survival is non-increasing and within [0, 1]
    prev = 1.0 + 1e-9
    for r in rows:
        assert 0.0 <= r.survival <= 1.0 + 1e-9
        assert r.survival <= prev + 1e-9
        prev = r.survival
    # at_risk decreases and starts at the user count
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert rows[0].at_risk == e.select("user_id").distinct().count()


def test_quality_neardup_auc_range(spark):
    r = suite.QUERIES["quality_neardup_auc"](spark, SF_DIR).collect()[0]
    assert r.n_pos > 0 and r.n_neg > 0
    assert 0.0 <= r.auc <= 1.0
