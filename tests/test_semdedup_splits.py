"""Tests for the round-4 pipeline additions: SemDeDup, cross-source
overlap, leakage-safe splits, and cross-snapshot dedup (no reference
analog; driver-mandated training-data-pipeline extras)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_functions_extra_spark.operators import clustering as CL
from datafusion_functions_extra_spark.operators import similarity as SIM

A = "the quick brown fox jumps over the lazy dog and runs far away today"
A_NEAR = "the quick brown fox jumps over the lazy dog and runs far away tonight"
B = "completely different content about spark aggregation engines and shuffles"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, A, "s1"), (2, A_NEAR, "s2"), (3, B, "s1"), (4, A, "s2")],
        "doc_id bigint, text string, source string",
    )


# -- SemDeDup ---------------------------------------------------------------


@pytest.fixture(scope="module")
def planted_vecs(spark):
    """3 planted clusters of near-identical vectors + one outlier; seeds
    are the first rows of each cluster so k-means separates them."""
    base = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0],
    }
    rows = []
    vid = 0
    for c, v in base.items():
        for j in range(3):  # 3 near-copies per cluster
            bumped = [x + (0.01 * j if i == 3 else 0.0) for i, x in enumerate(v)]
            rows.append((vid, bumped))
            vid += 1
    rows.append((vid, [0.5, 0.5, 0.5, 0.5]))  # equidistant-ish outlier
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_semdedup_drops_within_cluster_dups(planted_vecs):
    out = {
        r.vec_id: (r.cluster, r.kept)
        for r in CL.semdedup(
            planted_vecs,
            threshold=0.99,
            centroid_ids=(0, 3, 6),
            n_iters=2,
            vec_col="embedding",
        ).collect()
    }
    assert len(out) == 10
    # in each planted cluster the min-id member is kept, near-copies drop
    for lead in (0, 3, 6):
        assert out[lead][1] is True
        for dup in (lead + 1, lead + 2):
            assert out[dup][1] is False, f"vec {dup} should drop (near-copy)"
            assert out[dup][0] == out[lead][0], "near-copies share a cluster"
    assert out[9][1] is True  # outlier has no >=0.99 neighbor


def test_semdedup_threshold_one_keeps_all_but_exact(planted_vecs):
    kept = {
        r.vec_id: r.kept
        for r in CL.semdedup(
            planted_vecs,
            threshold=1.1,  # above max cosine -> nothing drops
            centroid_ids=(0, 3, 6),
            vec_col="embedding",
        ).collect()
    }
    assert all(kept.values())


# -- cross-source overlap ---------------------------------------------------


def test_source_overlap_exact_dup_sources_fully_overlap(docs):
    out = {
        (r.src_a, r.src_b): r
        for r in SIM.source_overlap_jaccard(docs, "text", "source").collect()
    }
    r = out[("s1", "s2")]
    # s2 contains an exact copy of s1's doc 1 (doc 4) -> every shingle of
    # doc 1 is shared; s1 also has unrelated doc 3, s2 the near-dup doc 2
    assert r.n_common >= 1
    assert 0.0 < r.jaccard < 1.0
    assert r.n_a > r.n_common and r.n_b > r.n_common


def test_source_overlap_disjoint_sources_absent(spark):
    d = spark.createDataFrame(
        [(1, A, "x"), (2, B, "y")], "doc_id bigint, text string, source string"
    )
    rows = SIM.source_overlap_jaccard(d, "text", "source").collect()
    assert rows == []  # no shared shingles -> no pair row


# -- leakage-safe split -----------------------------------------------------


def test_leakage_safe_split_components_never_straddle(docs):
    rows = SIM.leakage_safe_split(docs, "text", "doc_id", threshold=0.4).collect()
    assert len(rows) == 4
    by_comp: dict[int, set[str]] = {}
    for r in rows:
        by_comp.setdefault(r.component, set()).add(r.split)
    for comp, splits in by_comp.items():
        assert len(splits) == 1, f"component {comp} straddles splits {splits}"
    # docs 1 and 4 are exact dups -> same component -> same split
    comp = {r.doc_id: r.component for r in rows}
    assert comp[1] == comp[4]
    split = {r.doc_id: r.split for r in rows}
    assert split[1] == split[4]
    assert {r.split for r in rows} <= {"train", "validation", "test"}


# -- cross-snapshot dedup (suite-level wiring) ------------------------------


def test_cross_snapshot_dedup_flags_clones_not_revisions(spark):
    from datafusion_functions_extra_spark import suite

    out = {
        r.doc_id: r.dup_of_old
        for r in suite.QUERIES["docs_cross_snapshot_dedup"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    # cloned ids (doc_id + 1000000, text unchanged) are dups of old
    clones = [i for i in out if i >= 1000000]
    assert clones and all(out[i] for i in clones)
    # revised texts (doc_id % 13 == 0, ' rev2' appended) are NOT dups
    revised = [
        i for i in out if i < 1000000 and i % 13 == 0 and i % 17 != 0
    ]
    assert revised and all(not out[i] for i in revised)


# -- duplicated token spans -------------------------------------------------


def test_duplicate_token_spans_merges_islands(spark):
    from datafusion_functions_extra_spark.operators import dedup as DD

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens -> 4 shingle starts
    d = spark.createDataFrame(
        [
            (1, shared + " unique1 tail1 words here now"),
            (2, shared + " other2 tail2 tokens there then"),
            (3, "nothing in common with anything else at all"),
        ],
        "doc_id bigint, text string",
    )
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.n_tokens)
        for r in DD.duplicate_token_spans(d, "text", "doc_id").collect()
    }
    # docs 1 and 2 share the 6-token prefix: shingle starts 1..4 merge into
    # one island covering tokens 1..6
    assert spans[1] == (1, 6, 6)
    assert spans[2] == (1, 6, 6)
    assert 3 not in spans  # no cross-doc duplication -> no span rows


def test_duplicate_token_spans_separate_islands(spark):
    from datafusion_functions_extra_spark.operators import dedup as DD

    dup_a = "one two three"
    dup_b = "seven eight nine"
    d = spark.createDataFrame(
        [
            (1, f"{dup_a} xa ya za {dup_b} qa wa ea"),
            (2, f"{dup_a} xb yb zb {dup_b} qb wb eb"),
        ],
        "doc_id bigint, text string",
    )
    rows = sorted(
        (r.span_start, r.span_end)
        for r in DD.duplicate_token_spans(d, "text", "doc_id")
        .where(F.col("doc_id") == 1)
        .collect()
    )
    # two disjoint duplicated runs -> two islands, not one merged span
    assert rows == [(1, 3), (7, 9)]


# -- asymmetric (ingest-time) LSH -------------------------------------------


def test_asymmetric_near_dup_probes_batch_against_corpus(spark):
    corpus = spark.createDataFrame(
        [(1, A), (2, B)], "doc_id bigint, text string"
    )
    batch = spark.createDataFrame(
        [(101, A), (102, A_NEAR), (103, "totally fresh new content never seen before today")],
        "doc_id bigint, text string",
    )
    ca = SIM.minhash_signatures(corpus, "text", "doc_id", materialize=True)
    ba = SIM.minhash_signatures(batch, "text", "doc_id")
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in SIM.asymmetric_near_dup_pairs(ca, ba, "doc_id", 0.4).collect()
    }
    assert pairs[(1, 101)] == 1.0  # verbatim clone of corpus doc 1
    assert (1, 102) in pairs  # near-dup revision collides + scores
    assert all(b != 103 for _, b in pairs)  # fresh content never pairs
    assert all(a != 2 for a, _ in pairs)  # unrelated corpus doc untouched
    # asymmetric: corpus is never paired against itself
    assert all(b >= 101 for _, b in pairs)


# -- LSH eval metrics ---------------------------------------------------------


def test_lsh_eval_metrics_planted(spark):
    d = spark.createDataFrame(
        [(1, A), (2, A), (3, B), (4, A_NEAR)], "doc_id bigint, text string"
    )
    m = SIM.lsh_eval_metrics(d, "text", "doc_id", threshold=0.9).collect()[0]
    # exact dup (1,2) is both truth and predicted at 0.9
    assert m.tp >= 1
    assert m.n_truth >= 1 and m.n_pred >= 1
    assert m.fp + m.tp == m.n_pred
    assert m.fn + m.tp == m.n_truth
    assert 0.0 <= m.precision <= 1.0 and 0.0 <= m.recall <= 1.0
