"""Planted-fixture semantics for the round-5 additions: blocked entity
resolution, product-quantization ADC, and UniMax water-filling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_functions_extra_spark.functions.sampling import unimax_allocation
from datafusion_functions_extra_spark.operators.clustering import (
    pq_adc_topk,
    pq_codebooks_and_codes,
)
from datafusion_functions_extra_spark.operators.entity import blocked_name_matches


# ---------------------------------------------------------------------------
# blocked_name_matches
# ---------------------------------------------------------------------------


def test_blocking_multi_pass_and_verify(spark):
    df = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "red gadget"),   # shares word 1 with #1; lev(widget,gadget)=2
            (3, "blue widget"),  # shares word 2 with #1; lev(red,blue)=4 -> dist 4 > 3
            (4, "tiny bolt"),    # shares no word with anything
            (5, "red widget"),   # duplicate name — canonicalized away
        ],
        "id bigint, name string",
    )
    got = {
        (r.name_a, r.name_b, r.distance)
        for r in blocked_name_matches(df, "name", max_distance=3).collect()
    }
    assert got == {("red gadget", "red widget", 2)}


def test_blocking_orientation_and_dedup(spark):
    # a pair sharing BOTH words (identical names) never appears (a < b on
    # distinct names); a pair sharing both positions appears once
    df = spark.createDataFrame(
        [(1, "hot gear"), (2, "hot bear")], "id bigint, name string"
    )
    rows = blocked_name_matches(df, "name", max_distance=3).collect()
    assert len(rows) == 1
    assert rows[0].name_a == "hot bear" and rows[0].name_b == "hot gear"
    assert rows[0].distance == 1


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_vectors(spark):
    # 4-dim vectors, 2 subspaces of 2 dims; two tight clusters per subspace
    rows = [
        (0, [0.0, 0.0, 10.0, 10.0]),
        (1, [0.1, 0.0, 10.0, 10.1]),
        (2, [5.0, 5.0, 0.0, 0.0]),
        (3, [5.1, 5.0, 0.0, 0.1]),
        (4, [0.0, 0.1, 0.1, 0.0]),
        (5, [5.0, 5.1, 10.1, 10.0]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_pq_codes_shape_and_codebook(tiny_vectors):
    books, codes = pq_codebooks_and_codes(
        tiny_vectors, n_sub=2, sub_dim=2, seed_ids=(0, 2), n_iters=2
    )
    b = books.collect()
    assert {(r.sub, r.cid) for r in b} == {(0, 0), (0, 1), (1, 0), (1, 1)}
    assert all(len(r.cvec) == 2 for r in b)
    c = codes.collect()
    assert len(c) == 6 * 2  # one code per (vector, subspace)
    by = {(r.vec_id, r.sub): r.code for r in c}
    # subspace 0: ids 0,1,4 near [0,0] (seed 0); ids 2,3,5 near [5,5]
    assert by[(0, 0)] == by[(1, 0)] == by[(4, 0)]
    assert by[(2, 0)] == by[(3, 0)] == by[(5, 0)]
    assert by[(0, 0)] != by[(2, 0)]
    # subspace 1: ids 0,1,5 near [10,10]; ids 2,3,4 near [0,0]
    assert by[(0, 1)] == by[(1, 1)] == by[(5, 1)]
    assert by[(2, 1)] == by[(3, 1)] == by[(4, 1)]


def test_pq_adc_nearest_is_true_cluster_mate(tiny_vectors):
    top = pq_adc_topk(
        tiny_vectors, [0], k=2, n_sub=2, sub_dim=2, seed_ids=(0, 2), n_iters=2
    ).collect()
    assert [r.neighbor_id for r in top] == [1, 5]
    # vector 1 shares both codes with the query -> ADC distance is the
    # query's own quantization residual, strictly below any cross-cluster
    # distance; ranks are 1-based and ordered
    assert [r.rank for r in top] == [1, 2]
    assert top[0].adc_dist < top[1].adc_dist


# ---------------------------------------------------------------------------
# unimax_allocation
# ---------------------------------------------------------------------------


def _caps(spark, rows):
    return spark.createDataFrame(rows, "lang string, cap_tokens bigint")


def test_unimax_budget_exceeds_total_gives_full_caps(spark):
    caps = _caps(spark, [("en", 100), ("de", 50)])
    # budget = floor(150 * 10 / 10) = 150 >= total -> every lang full
    out = {r.lang: r for r in unimax_allocation(caps, "lang", "cap_tokens", 10, 10).collect()}
    assert out["en"].alloc_tokens == 100.0 and out["en"].epochs == 1.0
    assert out["de"].alloc_tokens == 50.0 and out["de"].epochs == 1.0


def test_unimax_water_level_caps_dominant_language(spark):
    caps = _caps(spark, [("en", 800), ("de", 100), ("fr", 100)])
    # budget = floor(1000 * 6 / 10) = 600: de/fr fit fully (100*3+0 <= 600,
    # 100*2+100 <= 600), en takes the remainder 400
    out = {r.lang: r for r in unimax_allocation(caps, "lang", "cap_tokens", 6, 10).collect()}
    assert out["de"].alloc_tokens == 100.0 and out["fr"].alloc_tokens == 100.0
    assert out["en"].alloc_tokens == 400.0
    assert out["en"].epochs == 0.5


def test_unimax_uniform_split_when_all_above_level(spark):
    caps = _caps(spark, [("a", 400), ("b", 500), ("c", 600)])
    # budget = floor(1500 * 2 / 10) = 300; even the smallest cap 400*3 > 300
    # -> nobody is full, everyone gets budget/3 = 100
    out = {r.lang: r for r in unimax_allocation(caps, "lang", "cap_tokens", 2, 10).collect()}
    assert {r.alloc_tokens for r in out.values()} == {100.0}
    assert out["a"].epochs == 0.25


def test_unimax_allocation_sums_to_budget(spark):
    caps = _caps(spark, [("a", 7), ("b", 13), ("c", 101), ("d", 3)])
    out = unimax_allocation(caps, "lang", "cap_tokens", 6, 10).collect()
    total = sum(r.alloc_tokens for r in out)
    budget = (7 + 13 + 101 + 3) * 6 // 10
    assert abs(total - budget) < 1e-5
