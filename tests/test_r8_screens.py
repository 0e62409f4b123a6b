"""Round-8 batch 2: Bloom decontamination screen, LSH band jackknife,
sequential pattern mining — contract tests beyond the driver hash."""

from __future__ import annotations

from datafusion_functions_extra_spark import suite

SF = "/root/testdata/sf0.001"


def test_bloom_decontam_no_false_negatives(spark):
    r = suite.QUERIES["docs_bloom_decontam"](spark, SF).collect()[0].asDict()
    # Bloom filters never miss a true member: every exactly-contaminated
    # (doc, gram) pair must be bloom-positive, at pair AND doc level
    assert r["n_bloom_pairs"] >= r["n_exact_pairs"]
    assert r["n_docs_bloom"] >= r["n_docs_exact"]
    # the 64 Kbit filter is far from saturated at this corpus size, and
    # the measured FPR must sit near the theoretical (fill_ratio)^k
    assert r["fill_ratio"] < 0.5
    theo = r["fill_ratio"] ** 3
    assert r["pair_fpr"] <= 10 * theo + 0.01
    assert r["n_train_docs"] > 0 and r["n_bench_grams"] > 0


def test_band_jackknife_bounds(spark):
    r = (
        suite.QUERIES["near_dup_band_jackknife"](spark, SF)
        .collect()[0]
        .asDict()
    )
    # leaving a band out can only lose pairs, never add them
    for i in range(4):
        assert 0 <= r[f"n_loo_b{i}"] <= r["n_pairs_full"]
    assert 0 <= r["theta_bar"] <= r["n_pairs_full"]
    assert r["jk_se"] >= 0
    # a pair colliding in >= 2 bands survives every leave-one-out; the
    # full count minus any loo count is the band's EXCLUSIVE pairs
    assert sum(r["n_pairs_full"] - r[f"n_loo_b{i}"] for i in range(4)) <= r[
        "n_pairs_full"
    ] * 4


def test_seq_patterns_apriori_monotonicity(spark):
    rows = [
        r.asDict()
        for r in suite.QUERIES["events_seq_patterns"](spark, SF).collect()
    ]
    assert len(rows) <= 125
    sup2 = {}
    for r in rows:
        sup2[(r["a"], r["b"])] = r["n_users_ab"]
        # a-priori: extending a pattern can only shrink its support
        assert r["n_users_abc"] <= r["n_users_ab"]
        assert 0 < r["confidence"] <= 1.0
        assert 0 < r["support"] <= 1.0
    # downward closure across levels: support(a,b) as a prefix is itself
    # bounded by the level-1 support of a (every user counted for (a,b)
    # has an a) — spot-check via the (a,b) table being internally
    # consistent with the triple table's maxima
    for (a, b), s in sup2.items():
        best_ext = max(
            (r["n_users_abc"] for r in rows if r["a"] == a and r["b"] == b),
            default=0,
        )
        assert best_ext <= s
