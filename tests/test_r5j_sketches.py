"""Round-5j operators: KMV distinct sketch, streaming binned
percentiles, Cliff's delta."""

import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def test_kmv_merge_identity_and_error(spark, sf):
    """Bottom-k of a union of bottom-ks must equal bottom-k of the
    union (exact merge identity), and the estimate must be close to the
    exact distinct count."""
    from datafusion_functions_extra_spark.suite import QUERIES

    rows = QUERIES["events_kmv_distinct"](spark, sf).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.merge_exact, f"{r.event_type}: merged != full estimate"
        assert r.kmv_est == r.merged_est
        # k=64 gives ~1/sqrt(62) ~ 13% standard error; allow 4 sigma
        assert r.rel_err < 0.5, f"{r.event_type}: rel_err {r.rel_err}"
        assert r.sketch_rows <= 64


def test_kmv_sketch_is_bottom_k(spark, sf):
    """The sketch relation must be exactly the 64 smallest distinct
    hashes per group (recomputed in pandas)."""
    from datafusion_functions_extra_spark.operators.sketches import (
        KMV_K,
        kmv_sketch,
    )
    from datafusion_functions_extra_spark.sources import load_table

    e = load_table(spark, sf, "events").select("event_type", "user_id")
    got = kmv_sketch(e, "event_type", "user_id").toPandas()
    import hashlib

    ref = {}
    pdf = e.distinct().toPandas()
    for t, grp in pdf.groupby("event_type"):
        hs = {
            int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
            for u in grp["user_id"]
        }
        ref[t] = sorted(hs)[:KMV_K]
    for t, grp in got.groupby("g"):
        assert sorted(grp["h"]) == ref[t]


def test_streaming_binned_quantiles_match_batch_histogram(spark, sf):
    """The drained streaming histogram percentiles must equal a batch
    recomputation, and each estimate must sit within half a bin of the
    exact percentile."""
    from datafusion_functions_extra_spark.sources import load_table
    from datafusion_functions_extra_spark.suite import QUERIES

    import math

    got = QUERIES["events_streaming_binned_quantiles"](spark, sf).collect()
    assert got
    vals: dict[tuple, list[float]] = {}
    for r in (
        load_table(spark, sf, "events")
        .selectExpr("date_trunc('hour', ts) w", "event_type", "value")
        .collect()
    ):
        vals.setdefault((r.w, r.event_type), []).append(r.value)
    half_bin = 2.56 / 2
    for r in got:
        xs = sorted(vals[(r.window_start, r.event_type)])
        assert r.n_events == len(xs)
        for p, est in ((0.5, r.p50_est), (0.9, r.p90_est), (0.99, r.p99_est)):
            # the pick targets the ceil(p*n)-th order statistic; the
            # midpoint estimate sits within half a bin of that value
            ex = xs[math.ceil(p * len(xs)) - 1]
            assert abs(est - ex) <= half_bin + 1e-9, (p, est, ex)


def test_cliffs_delta_matches_brute_force(spark, sf):
    """The histogram-join Cliff's delta must equal the quadratic
    definition on a sampled pair of types."""
    from datafusion_functions_extra_spark.sources import load_table
    from datafusion_functions_extra_spark.suite import QUERIES

    rows = {
        (r.type_a, r.type_b): r
        for r in QUERIES["event_value_cliffs_delta"](spark, sf).collect()
    }
    assert len(rows) == 10
    pdf = (
        load_table(spark, sf, "events")
        .selectExpr("event_type", "cast(round(value * 100) as long) v")
        .toPandas()
    )
    a = sorted(pdf[pdf.event_type == "click"]["v"])
    b = sorted(pdf[pdf.event_type == "error"]["v"])
    import bisect

    gt = sum(bisect.bisect_left(b, x) for x in a)  # pairs with x > y
    lt = sum(len(b) - bisect.bisect_right(b, x) for x in a)
    r = rows[("click", "error")]
    assert r.gt_pairs == gt and r.lt_pairs == lt
    assert r.cliffs_delta == pytest.approx(
        (gt - lt) / (len(a) * len(b)), abs=6e-7
    )
    assert -1.0 <= r.cliffs_delta <= 1.0
