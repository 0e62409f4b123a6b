"""Unit tests: DSIR importance weights, count-min sketch, hard-negative
mining — semantics on tiny planted fixtures (driver-mandated pipeline
extras; no reference analog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_functions_extra_spark.operators import importance as IMP
from datafusion_functions_extra_spark.operators import sketches as SKCH
from datafusion_functions_extra_spark.operators.similarity import hard_negative_topk


@pytest.fixture(scope="module")
def corpus(spark):
    # docs 1-2: "target" dialect; docs 3-4: off-target dialect; doc 5 mixed
    return spark.createDataFrame(
        [
            (1, "alpha beta alpha beta gamma", "t"),
            (2, "alpha beta gamma alpha", "t"),
            (3, "delta epsilon zeta delta epsilon", "r"),
            (4, "zeta epsilon delta zeta", "r"),
            (5, "alpha beta delta epsilon", "r"),
        ],
        "doc_id bigint, text string, kind string",
    )


def test_dsir_scores_target_like_docs_higher(corpus):
    out = {
        r.doc_id: r.score
        for r in IMP.dsir_importance(
            corpus, "text", "doc_id", F.col("kind") == "t"
        ).collect()
    }
    assert len(out) == 5
    # pure target-dialect docs must outscore pure off-target docs, with
    # the mixed doc in between
    assert min(out[1], out[2]) > out[5] > max(out[3], out[4])


def test_dsir_deterministic_across_partitionings(corpus):
    a = sorted(
        (r.doc_id, r.n_features, r.score)
        for r in IMP.dsir_importance(
            corpus, "text", "doc_id", F.col("kind") == "t"
        ).collect()
    )
    b = sorted(
        (r.doc_id, r.n_features, r.score)
        for r in IMP.dsir_importance(
            corpus.repartition(7), "text", "doc_id", F.col("kind") == "t"
        ).collect()
    )
    # integer micro-nat accumulation: bit-identical under any partitioning
    assert a == b


def test_cms_estimate_upper_bounds_exact(corpus, spark):
    items = corpus.select(F.explode(F.split("text", " ")).alias("item"))
    sketch = SKCH.cms_build(items, "item")
    exact = {
        r.item: r.n
        for r in items.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    probes = spark.createDataFrame(
        [(t,) for t in exact], "item string"
    )
    est = {
        r.item: r.est_n
        for r in SKCH.cms_estimate(sketch, probes, "item").collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert est[t] >= n  # count-min never underestimates
    # 7 distinct tokens into 4x256 counters: no collisions, all exact
    assert est == exact


def test_cms_sketch_merges_as_monoid(corpus, spark):
    """sketch(A union B) == re-summed union of sketch(A) and sketch(B) —
    the property that lets partial sketches merge across corpora/batches."""
    items = corpus.select(
        "doc_id", F.explode(F.split("text", " ")).alias("item")
    )
    a = SKCH.cms_build(items.where(F.col("doc_id") <= 2), "item")
    b = SKCH.cms_build(items.where(F.col("doc_id") > 2), "item")
    merged = (
        a.unionByName(b).groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))
    )
    whole = SKCH.cms_build(items, "item")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_unknown_item_estimates_zero_or_collision(corpus, spark):
    items = corpus.select(F.explode(F.split("text", " ")).alias("item"))
    sketch = SKCH.cms_build(items, "item")
    probes = spark.createDataFrame([("neverseen",)], "item string")
    (row,) = SKCH.cms_estimate(sketch, probes, "item").collect()
    assert row.est_n == 0  # 7 tokens in 1024 counters: no collision


def test_hard_negatives_exclude_same_label(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0, 0.0], 0),   # same label, closest vector
        (2, [0.9, 0.2, 0.0, 0.0], 1),    # different label, next closest
        (3, [0.0, 1.0, 0.0, 0.0], 1),
        (4, [-1.0, 0.0, 0.0, 0.0], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    got = hard_negative_topk(emb, [0], k=2)
    out = [(r.neighbor_id, r.neighbor_label, r.rank) for r in got.collect()]
    # vec 1 (label 0) is nearest but must be skipped; vec 2 leads
    assert out == [(2, 1, 1), (3, 1, 2)]


def test_cms_join_size_estimate_upper_bounds_exact(spark):
    a = spark.createDataFrame(
        [("u1",)] * 3 + [("u2",)] * 2 + [("u3",)], "item string"
    )
    b = spark.createDataFrame(
        [("u1",)] * 2 + [("u2",)] * 4 + [("u9",)], "item string"
    )
    est = SKCH.cms_join_size_estimate(
        SKCH.cms_build(a, "item"), SKCH.cms_build(b, "item")
    ).collect()[0].est_pairs
    exact = 3 * 2 + 2 * 4  # u1: 3x2, u2: 2x4, u3/u9 unmatched
    assert est >= exact
    # 4 distinct keys in 4x256 counters: collision-free, estimate exact
    assert est == exact


def test_cms_join_size_disjoint_is_zero(spark):
    a = spark.createDataFrame([("x1",), ("x2",)], "item string")
    b = spark.createDataFrame([("y1",), ("y2",)], "item string")
    est = SKCH.cms_join_size_estimate(
        SKCH.cms_build(a, "item"), SKCH.cms_build(b, "item")
    ).collect()[0].est_pairs
    assert est == 0


# -- HyperLogLog register relation ------------------------------------------


def test_hll_registers_merge_monoid(spark):
    from pyspark.sql import functions as F

    from datafusion_functions_extra_spark.operators import sketches as SKCH

    df = spark.range(0, 2000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 700).alias("v")
    )
    whole = SKCH.hll_registers(df, "v", ["g"])
    half1 = SKCH.hll_registers(df.where(F.col("id") < 1000), "v", ["g"])
    half2 = SKCH.hll_registers(df.where(F.col("id") >= 1000), "v", ["g"])
    merged = (
        half1.unionByName(half2)
        .groupBy("g", "bucket")
        .agg(F.max("r").alias("r"))
    )
    w = {(r.g, r.bucket): r.r for r in whole.collect()}
    m = {(r.g, r.bucket): r.r for r in merged.collect()}
    assert w == m  # union + re-max IS the sketch merge


def test_hll_estimate_accuracy(spark):
    from pyspark.sql import functions as F

    from datafusion_functions_extra_spark.operators import sketches as SKCH

    df = spark.range(0, 50000).select(
        F.lit("a").alias("g"), (F.col("id") % 5000).alias("v")
    )
    regs = SKCH.hll_registers(df, "v", ["g"])
    est = SKCH.hll_estimate(regs, ["g"]).collect()[0]
    assert est.n_zero_buckets >= 0
    # 256 registers -> sigma ~6.5%; assert within 3 sigma of 5000
    assert abs(est.hll_est - 5000) / 5000 < 0.20
