"""Deterministic sampling: stability across partitionings and versions."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_functions_extra_spark.functions import sampling as SMP
from datafusion_functions_extra_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_split_stable_across_partitionings(spark):
    d = load_table(spark, SF_DIR, "documents")
    a = {r.doc_id: r.split for r in SMP.train_test_split(d, "doc_id").collect()}
    b = {
        r.doc_id: r.split
        for r in SMP.train_test_split(d.repartition(17), "doc_id").collect()
    }
    assert a == b  # membership is a pure function of the key


def test_split_fraction_roughly_held(spark):
    d = load_table(spark, SF_DIR, "documents")
    counts = (
        SMP.train_test_split(d, "doc_id", test_fraction=0.2)
        .groupBy("split")
        .count()
        .collect()
    )
    by = {r.split: r["count"] for r in counts}
    total = sum(by.values())
    assert 0.1 < by.get("test", 0) / total < 0.3


def test_sample_is_subset_of_larger_sample(spark):
    # growing the fraction only ADDS keys — the version-stability property
    d = load_table(spark, SF_DIR, "documents")
    s10 = {r.doc_id for r in SMP.deterministic_sample(d, "doc_id", 0.1).collect()}
    s30 = {r.doc_id for r in SMP.deterministic_sample(d, "doc_id", 0.3).collect()}
    assert s10 <= s30


def test_pack_sequences_invariants(spark):
    d = load_table(spark, SF_DIR, "documents").select(
        "doc_id", (F.length("text") / 10).cast("long").alias("sz")
    )
    packed = SMP.pack_sequences(d, "doc_id", "sz", budget=100, n_shards=4)
    rows = packed.collect()
    # offsets are within budget and bins are dense per shard from 0
    assert all(0 <= r.offset_in_bin < 100 for r in rows)
    per_shard_bins = {}
    for r in rows:
        per_shard_bins.setdefault(r.shard, set()).add(r.bin)
    for bins in per_shard_bins.values():
        assert bins == set(range(max(bins) + 1))
    # deterministic across partitionings
    again = SMP.pack_sequences(
        d.repartition(13), "doc_id", "sz", budget=100, n_shards=4
    ).collect()
    assert {(r.doc_id, r.shard, r.bin) for r in rows} == {
        (r.doc_id, r.shard, r.bin) for r in again
    }


def test_stratified_sample_counts(spark):
    d = load_table(spark, SF_DIR, "documents")
    out = SMP.stratified_sample_n(d, ["lang"], "doc_id", 5)
    per = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    langs = {r.lang for r in d.select("lang").distinct().collect()}
    assert set(per) == langs
    assert all(v <= 5 for v in per.values())
    # reruns identical
    again = {r.doc_id for r in SMP.stratified_sample_n(d, ["lang"], "doc_id", 5).collect()}
    assert {r.doc_id for r in out.collect()} == again


class TestWeightedReservoir:
    def test_exact_size_and_partitioning_invariance(self, spark):
        from datafusion_functions_extra_spark.functions.sampling import (
            weighted_reservoir_topn,
        )

        rows = [(i, (i % 7 + 1) * 100) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, n_chars long")
        a = weighted_reservoir_topn(df, "doc_id", "n_chars", n=50).collect()
        b = weighted_reservoir_topn(
            df.repartition(13, "doc_id"), "doc_id", "n_chars", n=50
        ).collect()
        assert len(a) == 50
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_weight_bias(self, spark):
        from datafusion_functions_extra_spark.functions.sampling import (
            weighted_reservoir_topn,
        )

        # half the population weighs 10x more; it must dominate the sample
        rows = [(i, 1000 if i < 500 else 100) for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, n_chars long")
        got = weighted_reservoir_topn(df, "doc_id", "n_chars", n=100).collect()
        heavy = sum(1 for r in got if r.n_chars == 1000)
        assert heavy > 70  # E[heavy] ~ 90+ under A-ES; 70 is a safe floor
