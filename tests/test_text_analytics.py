"""TF-IDF, vocabulary build, and int8 quantization (round-2 additions)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datafusion_functions_extra_spark.functions.text import build_vocab, tfidf_top_terms
from datafusion_functions_extra_spark.operators.similarity import quantize_int8


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta beta gamma"),
        (2, "alpha alpha delta"),
        (3, "gamma gamma gamma epsilon"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_build_vocab_ids_deterministic(docs):
    got = [(r.token_id, r.token, r.n_occurrences) for r in build_vocab(docs, "text").collect()]
    # counts: gamma 4, alpha 3, beta 2, delta 1, epsilon 1; ties by token asc
    assert got == [
        (1, "gamma", 4),
        (2, "alpha", 3),
        (3, "beta", 2),
        (4, "delta", 1),
        (5, "epsilon", 1),
    ]


def test_build_vocab_min_count(docs):
    got = {r.token for r in build_vocab(docs, "text", min_count=2).collect()}
    assert got == {"gamma", "alpha", "beta"}


def test_tfidf_scores_and_ranking(docs):
    out = tfidf_top_terms(docs, "text", "doc_id", k=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append((r.rk, r.term, r.tfidf))
    # doc 1: beta tf=2 df=1 -> 2*ln(3); alpha and gamma both tf=1 df=2 ->
    # ln(1.5) exact tie, broken by term asc -> alpha takes rank 2
    assert [t for _, t, _ in sorted(by_doc[1])] == ["beta", "alpha"]
    assert by_doc[1][0][2] == round(2 * math.log(3.0), 6)
    # doc 2: delta df=1 -> ln(3) beats alpha (idf 0)
    assert sorted(by_doc[2])[0][1] == "delta"
    # every doc gets at most k rows with contiguous ranks
    for rows in by_doc.values():
        assert [rk for rk, _, _ in sorted(rows)] == list(range(1, len(rows) + 1))


def test_quantize_int8_roundtrip(spark):
    rows = [
        (1, [1.0, -2.0, 0.5, 4.0]),  # scale 4/127
        (2, [0.0, 0.0, 0.0, 0.0]),  # all-zero: no div-by-zero, q all zeros
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r.vec_id: r.z
        for r in df.select("vec_id", quantize_int8(F.col("embedding")).alias("z")).collect()
    }
    assert out[1].q == [round(x / (4.0 / 127.0)) for x in [1.0, -2.0, 0.5, 4.0]]
    assert out[1].q[3] == 127
    assert out[1].scale == 4.0 / 127.0
    assert out[2].q == [0, 0, 0, 0]
    # max reconstruction error bounded by scale/2 per element
    recon = [q * out[1].scale for q in out[1].q]
    for orig, rec in zip([1.0, -2.0, 0.5, 4.0], recon):
        assert abs(orig - rec) <= out[1].scale / 2 + 1e-12


class TestSentenceDedup:
    def test_boilerplate_sentence_dropped_from_later_docs(self, spark):
        from datafusion_functions_extra_spark.functions.text import (
            sentence_dedup_stats,
        )

        banner = "accept all cookies to continue."
        df = spark.createDataFrame(
            [
                (1, f"unique first page. {banner}"),
                (2, f"{banner} totally different second page."),
                (3, "nothing shared here at all."),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in sentence_dedup_stats(df, "text", "doc_id").collect()}
        # doc 1 saw the banner first -> keeps both sentences
        assert (out[1].n_kept, out[1].n_dropped) == (2, 0)
        # doc 2's banner is a corpus-wide duplicate -> dropped
        assert (out[2].n_kept, out[2].n_dropped) == (1, 1)
        assert (out[3].n_kept, out[3].n_dropped) == (1, 0)
        assert all(r.n_kept + r.n_dropped == r.n_sentences for r in out.values())


def test_bigram_logprob_orders_garbage_below_prose(spark):
    """A doc of repeated common bigrams must outscore a doc of one-off
    rare transitions under the interpolated bigram LM."""
    from datafusion_functions_extra_spark import suite

    rows = suite.QUERIES["text_bigram_logprob"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_bigrams >= 1
        assert r.avg_logprob < 0.0  # log of probability < 1


def test_sentence_dedup_rebuild_drops_global_dupes(spark):
    from datafusion_functions_extra_spark.functions.text import (
        sentence_dedup_rebuild,
    )

    docs = spark.createDataFrame(
        [
            (1, "Alpha beta. Shared cookie banner. Gamma delta."),
            (2, "Shared cookie banner. Unique middle text. Alpha beta."),
            (3, "Shared cookie banner."),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.n_kept, r.clean_text)
        for r in sentence_dedup_rebuild(docs, "text", "doc_id").collect()
    }
    # doc 1 keeps everything (first occurrences); doc 2 loses both shared
    # sentences; doc 3 (all duplicate) drops out of the result entirely
    assert got[1] == (3, "alpha beta shared cookie banner gamma delta")
    assert got[2] == (1, "unique middle text")
    assert 3 not in got


def test_gopher_rules_thresholds(spark):
    from datafusion_functions_extra_spark.functions.text import (
        gopher_quality_rules,
    )

    docs = spark.createDataFrame(
        [
            # 12 prose words, healthy lengths, stopwords present -> keep
            (1, "the quick brown fox jumps over the lazy dog in the field"),
            # too short (< 10 words)
            (2, "tiny doc of words"),
            # numeric spam: alpha fraction fails and no stopwords
            (3, "111 222 333 444 555 666 777 888 999 000 123 456"),
            # mean word length too high (>10) despite word count
            (4, " ".join(["supercalifragilistic"] * 12)),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in gopher_quality_rules(docs, "text", "doc_id").collect()}
    assert got[1].keep and got[1].ok_word_count and got[1].ok_stopwords
    assert not got[2].keep and not got[2].ok_word_count
    assert not got[3].keep and not got[3].ok_alpha_frac and not got[3].ok_stopwords
    assert not got[4].keep and not got[4].ok_mean_word_len


# ---------------------------------------------------------------------------
# corpus_bpe_merges — wrapped-token greedy-replace semantics
# ---------------------------------------------------------------------------


def test_bpe_merge_greedy_and_doc_isolated(spark):
    """The wrapped-token replace must implement BPE's greedy
    left-to-right non-overlapping merge: 'a a a' merges ONCE, merges
    never cross document boundaries, and the argmax tie-break is
    (count desc, pair asc)."""
    import pandas as pd

    from datafusion_functions_extra_spark import suite

    docs = spark.createDataFrame(
        [
            (1, "a a a"),          # self-pair run: one greedy merge
            (2, "a a b"),          # contributes (a,a) and (a,b)
            (3, "b"),              # single token: no pairs
            (4, "x a"),            # doc boundary after 'a' — no (a, x) pair
        ],
        "doc_id bigint, text string",
    )
    import datafusion_functions_extra_spark.sources.catalog as cat

    orig = cat.load_table
    try:
        cat.load_table = lambda s, d, t: docs
        suite.load_table_backup = suite.load_table
        suite.load_table = lambda s, d, t: docs
        out = suite.QUERIES["corpus_bpe_merges"](spark, "ignored").toPandas()
    finally:
        cat.load_table = orig
        suite.load_table = suite.load_table_backup
    out = out.sort_values("round", ignore_index=True)
    # round 1: (a,a) x3 raw but greedy counting is RAW adjacent pairs:
    # doc1 has (a,a),(a,a); doc2 has (a,a) -> count 3; (a,b) 1, (x,a) 1
    r1 = out.iloc[0]
    assert (r1.left_tok, r1.right_tok, r1.merged, r1.pair_count) == ("a", "a", "a_a", 3)
    # after merging: doc1 = [a_a, a], doc2 = [a_a, b] -> round 2 pairs:
    # (a_a, a) 1, (a_a, b) 1, (x, a) 1 -> tie on count 1, pair-asc picks (a_a, a)
    r2 = out.iloc[1]
    assert (r2.left_tok, r2.right_tok, r2.pair_count) == ("a_a", "a", 1)
