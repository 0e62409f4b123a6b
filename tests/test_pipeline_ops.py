"""Unit tests for the training-pipeline operators added in round 2:
decontamination, repetition scoring, chunking, temperature mixing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_functions_extra_spark.functions import sampling as SMP
from datafusion_functions_extra_spark.functions import text as TX
from datafusion_functions_extra_spark.operators import decontaminate as DECON


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "alpha beta gamma delta epsilon completely different tail here"),
        (4, "tiny"),
        (5, "rep rep rep rep rep rep"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDecontaminate:
    def test_overlap_flags(self, spark, docs):
        train = docs.where(F.col("doc_id") != 1)
        bench = docs.where(F.col("doc_id") == 1)
        out = DECON.ngram_overlap_flags(train, bench, n=5)
        got = {r.doc_id: r.n_bench_hits for r in out.collect()}
        # doc 3 shares the 5-gram "alpha beta gamma delta epsilon" with doc 1
        assert got == {3: 1}

    def test_no_overlap(self, spark, docs):
        train = docs.where(F.col("doc_id") == 2)
        bench = docs.where(F.col("doc_id") == 1)
        assert DECON.ngram_overlap_flags(train, bench, n=5).count() == 0

    def test_distinct_hits_not_occurrences(self, spark):
        # the contaminated phrase appears twice in the train doc -> still 1
        bench = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id long, text string"
        )
        train = spark.createDataFrame(
            [(2, "a b c d e x a b c d e")], "doc_id long, text string"
        )
        got = DECON.ngram_overlap_flags(train, bench, n=5).collect()
        assert [(r.doc_id, r.n_bench_hits) for r in got] == [(2, 1)]


class TestRepetition:
    def test_top_bigram(self, spark, docs):
        out = TX.top_ngram_stats(docs, "text", "doc_id", n=2)
        got = {r.doc_id: r for r in out.collect()}
        # doc 5: "rep rep" x5 of 5 bigrams -> frac 1.0
        assert got[5].top_gram == "rep rep"
        assert got[5].top_count == 5
        assert got[5].top_frac == 1.0
        # doc 2: all bigrams unique -> top_count 1, deterministic max-gram tie
        assert got[2].top_count == 1
        assert got[2].top_gram == "the quick"  # max lexicographic among ties
        # doc 4: shorter than n -> whole-text fallback, one "gram"
        assert got[4].top_count == 1 and got[4].top_frac == 1.0

    def test_every_doc_scored(self, spark, docs):
        assert TX.top_ngram_stats(docs, "text", "doc_id").count() == docs.count()


class TestChunking:
    def _mk(self, spark, n_tokens: int):
        text = " ".join(f"t{i}" for i in range(n_tokens))
        return spark.createDataFrame([(1, text)], "doc_id long, text string")

    @pytest.mark.parametrize(
        "n,expected_chunks", [(1, 1), (63, 1), (64, 1), (65, 2), (120, 2), (121, 3)]
    )
    def test_chunk_counts(self, spark, n, expected_chunks):
        out = TX.chunk_documents(self._mk(spark, n), "text", "doc_id")
        assert out.count() == expected_chunks

    def test_coverage_and_sizes(self, spark):
        # stride 56 / width 64: chunks [1..64], [57..120], [113..130]
        out = TX.chunk_documents(self._mk(spark, 130), "text", "doc_id")
        rows = sorted(out.collect(), key=lambda r: r.chunk_idx)
        assert [r.n_tokens for r in rows] == [64, 64, 18]
        assert [r.chunk_idx for r in rows] == [0, 1, 2]

    def test_chunk_hash_matches_slice(self, spark):
        df = self._mk(spark, 70)
        out = {r.chunk_idx: r.chunk_hash for r in
               TX.chunk_documents(df, "text", "doc_id").collect()}
        import hashlib

        toks = [f"t{i}" for i in range(70)]
        assert out[0] == hashlib.md5(" ".join(toks[:64]).encode()).hexdigest()
        assert out[1] == hashlib.md5(" ".join(toks[56:70]).encode()).hexdigest()


class TestTemperatureMixture:
    def test_rates_and_counts(self, spark):
        rows = [(i, "big" if i < 90 else "small") for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = {r.source: r for r in
               SMP.temperature_mixture(df, "source", "doc_id").collect()}
        assert out["big"].n_docs == 90 and out["small"].n_docs == 10
        # alpha=0.5 upweights the small source relative to its size
        assert out["small"].rate > out["big"].rate
        for r in out.values():
            assert 0.0 <= r.rate <= 1.0
            assert 0 <= r.n_kept <= r.n_docs

    def test_alpha_one_is_uniform(self, spark):
        rows = [(i, f"s{i % 4}") for i in range(80)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = SMP.temperature_mixture(
            df, "source", "doc_id", alpha=1.0, budget_frac=0.5
        ).collect()
        # alpha=1 keeps proportions: every source rate == budget_frac
        assert {r.rate for r in out} == {0.5}

    def test_deterministic_across_partitionings(self, spark):
        rows = [(i, f"s{i % 3}") for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        a = SMP.temperature_mixture(df, "source", "doc_id").collect()
        b = SMP.temperature_mixture(
            df.repartition(7, "doc_id"), "source", "doc_id"
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestKMeans:
    def test_two_obvious_clusters(self, spark):
        from datafusion_functions_extra_spark.operators.clustering import (
            kmeans_assign,
        )

        # two tight blobs around (0,0,...) and (10,10,...); seeds 0 and 4
        rows = []
        for i in range(4):
            rows.append((i, [0.0 + i * 0.01] * 8))
        for i in range(4, 8):
            rows.append((i, [10.0 + i * 0.01] * 8))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = kmeans_assign(emb, centroid_ids=(0, 4), n_iters=2)
        got = {r.vec_id: r.cluster for r in out.collect()}
        assert {got[i] for i in range(4)} == {0}
        assert {got[i] for i in range(4, 8)} == {1}

    def test_assignment_total(self, spark):
        from datafusion_functions_extra_spark.operators.clustering import (
            kmeans_assign,
        )
        from datafusion_functions_extra_spark.sources.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        out = kmeans_assign(emb)
        assert out.count() == emb.count()
        assert out.where(F.col("dist") < 0).count() == 0


def test_approx_distinct_within_rsd_envelope(spark):
    """The HLL estimate must land within a generous multiple of the
    configured rsd (2%) of the exact count — the bound the suite's
    rows-only query is judged against."""
    from datafusion_functions_extra_spark.suite import QUERIES

    rows = QUERIES["approx_distinct_users"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        assert r.rel_error <= 5 * 0.02, (r.event_type, r.rel_error)


def test_percentile_approx_within_rank_error(spark):
    """price_quantiles_approx (the 100 TB sibling of the exact-percentile
    query) must land within the Greenwald-Khanna rank-error envelope:
    with accuracy=10000 the estimate's rank is within n/10000 of the
    target rank, so the value must fall between the exact percentiles at
    q ± 5/accuracy (generous 5x slack, same spirit as the HLL bound)."""
    from datafusion_functions_extra_spark.suite import QUERIES
    from datafusion_functions_extra_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    approx = {
        r.l_returnflag: r
        for r in QUERIES["price_quantiles_approx"](spark, sf).collect()
    }
    li = load_table(spark, sf, "lineitem")
    slack = 5.0 / 10000
    for q, fieldname in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        lo_q, hi_q = max(0.0, q - slack), min(1.0, q + slack)
        bounds = {
            r.l_returnflag: (r.lo, r.hi)
            for r in li.groupBy("l_returnflag")
            .agg(
                F.percentile("l_extendedprice", F.lit(lo_q)).alias("lo"),
                F.percentile("l_extendedprice", F.lit(hi_q)).alias("hi"),
            )
            .collect()
        }
        for flag, row in approx.items():
            lo, hi = bounds[flag]
            got = getattr(row, fieldname)
            assert lo <= got <= hi, (flag, fieldname, got, lo, hi)


class TestPlanContracts:
    """Plan-shape assertions: the properties PLANS.md audits, pinned in
    tests so a regression fails loudly rather than silently de-optimizing."""

    SF = "/root/testdata/sf0.001"

    def _plan(self, df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    def test_column_pruning_reaches_scan(self, spark):
        from datafusion_functions_extra_spark.suite import QUERIES

        plan = self._plan(QUERIES["mode_returnflag_global"](spark, self.SF))
        assert "ReadSchema: struct<l_returnflag:string>" in plan

    def test_filter_pushdown_reaches_scan(self, spark):
        from datafusion_functions_extra_spark.suite import QUERIES

        plan = self._plan(QUERIES["lineitem_pricing_summary"](spark, self.SF))
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan

    def test_no_cartesian_in_embedding_search(self, spark):
        from datafusion_functions_extra_spark.suite import QUERIES

        plan = self._plan(QUERIES["embedding_cosine_topk"](spark, self.SF))
        assert "CartesianProduct" not in plan
        # the inequality join condition forces a nested-loop join; the
        # contract is that the BROADCAST side is the tiny query set
        # (BuildLeft — q is the left input), never a shuffled cross join
        assert "BroadcastNestedLoopJoin BuildLeft" in plan

    def test_decontaminate_broadcasts_bench_side(self, spark):
        from datafusion_functions_extra_spark.suite import QUERIES

        plan = self._plan(QUERIES["docs_decontaminated"](spark, self.SF))
        assert "BroadcastHashJoin" in plan


    def test_bloom_probe_broadcasts_sketch_side(self, spark):
        from datafusion_functions_extra_spark.suite import QUERIES

        plan = self._plan(QUERIES["orders_bloom_semi_probe"](spark, self.SF))
        # the m/32-word sketch must broadcast; the probe side is never
        # shuffled for the bit-test join
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_weighted_reservoir_is_takeordered(self, spark):
        from datafusion_functions_extra_spark.suite import QUERIES

        plan = self._plan(QUERIES["docs_weighted_reservoir"](spark, self.SF))
        # top-n must plan as TakeOrderedAndProject (per-partition heaps +
        # driver merge), never a global Sort + Limit
        assert "TakeOrderedAndProject" in plan

    def test_ewma_single_exchange(self, spark):
        from datafusion_functions_extra_spark.suite import QUERIES

        plan = self._plan(QUERIES["events_ewma"](spark, self.SF))
        # one shuffle by user for the frame window, nothing else
        assert plan.count("Exchange") <= 2  # hashpartitioning (+AQE read)
        assert "CartesianProduct" not in plan

    def test_no_python_workers_on_aggregate_paths(self, spark):
        from datafusion_functions_extra_spark.suite import QUERIES

        for q in ("flagship_lineitem_profile", "stats_profile_by_returnflag"):
            plan = self._plan(QUERIES[q](spark, self.SF))
            assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestBloomSemiJoin:
    def test_no_false_negatives_and_some_pruning(self, spark):
        """Defining sketch property: every actually-present key MUST probe
        maybe_present (no false negatives, ever); with the suite's
        deliberately undersized filter some absent keys may collide, but
        pruning must still reject a nonzero share of absent keys."""
        from datafusion_functions_extra_spark.suite import QUERIES

        rows = QUERIES["orders_bloom_semi_probe"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        cells = {(r.maybe_present, r.actually_present): r.n_keys for r in rows}
        assert (False, True) not in cells  # a false negative breaks bloom
        assert cells.get((True, True), 0) > 0
        assert cells.get((False, False), 0) > 0  # pruning does something

    def test_membership_exact_on_members(self, spark):
        from datafusion_functions_extra_spark.operators import bloom as B
        from pyspark.sql import functions as F

        keys = spark.range(100).select(F.col("id").alias("k"))
        bits = B.bloom_build(keys, "k", m_bits=4096, k=4)
        probed = B.bloom_probe(spark.range(100), "id", bits, m_bits=4096, k=4)
        assert probed.where(~F.col("maybe_present")).count() == 0


class TestDupNgramCoverage:
    def test_identical_docs_fully_covered_unique_doc_zero(self, spark):
        from datafusion_functions_extra_spark.functions.text import (
            duplicate_ngram_coverage,
        )

        df = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox jumps over the lazy dog"),
                (3, "completely different words appear in this sentence here"),
            ],
            "doc_id bigint, text string",
        )
        out = {r.doc_id: r for r in duplicate_ngram_coverage(df, "text", "doc_id").collect()}
        assert out[1].dup_frac == 1.0 and out[2].dup_frac == 1.0
        assert out[3].dup_frac == 0.0
        assert out[1].n_grams == out[1].n_dup_grams

    def test_short_doc_whole_text_gram(self, spark):
        from datafusion_functions_extra_spark.functions.text import (
            duplicate_ngram_coverage,
        )

        df = spark.createDataFrame(
            [(1, "tiny doc"), (2, "tiny doc"), (3, "other")],
            "doc_id bigint, text string",
        )
        out = {r.doc_id: r for r in duplicate_ngram_coverage(df, "text", "doc_id").collect()}
        # <k-word docs fall back to one whole-text gram, shared by 1 and 2
        assert out[1].n_grams == 1 and out[1].dup_frac == 1.0
        assert out[3].dup_frac == 0.0


class TestTableDiff:
    def test_classification(self, spark):
        from datafusion_functions_extra_spark.operators.diff import table_diff

        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, t string, v long"
        )
        new = spark.createDataFrame(
            [(1, "a", 10), (2, "B", 20), (4, "d", 40)], "k long, t string, v long"
        )
        got = {r.k: r.change_type for r in table_diff(old, new, ["k"]).collect()}
        assert got == {2: "changed", 3: "removed", 4: "added"}  # 1 unchanged -> absent

    def test_null_vs_empty_distinct(self, spark):
        from datafusion_functions_extra_spark.operators.diff import table_diff

        old = spark.createDataFrame([(1, None)], "k long, t string")
        new = spark.createDataFrame([(1, "")], "k long, t string")
        got = table_diff(old, new, ["k"]).collect()
        assert len(got) == 1 and got[0].change_type == "changed"
