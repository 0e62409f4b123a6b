"""Hybrid RRF retrieval, session path mining, Heaps curve, PCA power
iteration (round-4 batch c)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from datafusion_functions_extra_spark.suite import QUERIES

SF = "/root/testdata/sf0.001"


def test_pca_matches_numpy_eigenvector(spark):
    rows = QUERIES["embedding_pca_top_component"](spark, SF).collect()
    assert len(rows) == 64
    w = np.array([r.loading for r in sorted(rows, key=lambda r: r.pos)])
    evr = rows[0].explained_ratio
    emb = np.stack(pd.read_parquet(f"{SF}/embeddings.parquet")["embedding"].to_numpy())
    X = emb.astype(float) - emb.mean(axis=0)
    C = X.T @ X / len(emb)
    vals, vecs = np.linalg.eigh(C)
    top = vecs[:, -1]
    # the synthetic spectrum is nearly flat (lambda2/lambda1 ~ 0.93), so
    # 40 power rounds converge to |cos| ~ 0.988 — the numpy rounded-
    # trajectory replica below predicts this exactly (see PCA_ITERS note)
    assert abs(float(w @ top)) > 0.98
    assert np.isclose(np.linalg.norm(w), 1.0, atol=1e-4)
    assert evr == pytest.approx(vals[-1] / np.trace(C), abs=2e-3)
    # the rounded-arithmetic replica of the exact trajectory agrees with
    # the engine's direction to float precision
    wr = np.full(64, 0.125)
    Cr = np.round(C, 6)
    for _ in range(40):
        u = np.round(Cr @ wr, 6)
        wr = np.round(u / round(float(np.sqrt((u * u).sum())), 6), 6)
    if wr[0] < 0:
        wr = -wr
    assert abs(float(w @ wr)) > 0.9999
    # sign canonicalization: first coordinate non-negative (or exactly 0)
    assert w[0] >= 0
    # one explained_ratio for the whole component
    assert len({r.explained_ratio for r in rows}) == 1


def test_heaps_curve_monotone_and_complete(spark):
    rows = sorted(QUERIES["corpus_heaps_curve"](spark, SF).collect(), key=lambda r: r.k)
    assert [r.k for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert b.n_tokens >= a.n_tokens and b.n_distinct >= a.n_distinct
        assert b.cutoff > a.cutoff
    # vocabulary grows sublinearly: distinct count rises slower than tokens
    assert rows[-1].n_distinct < rows[-1].n_tokens
    # final checkpoint covers the whole corpus
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    total_tokens = int(
        sum(len(" ".join(t.lower().strip().split()).split(" ")) for t in docs["text"])
    )
    vocab = len({w for t in docs["text"] for w in " ".join(t.lower().strip().split()).split(" ")})
    assert rows[-1].n_tokens == total_tokens
    assert rows[-1].n_distinct == vocab
    assert 0 < rows[-1].heaps_beta < 1


def test_hybrid_rrf_structure(spark):
    rows = QUERIES["hybrid_rrf_topk"](spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    max_single = 1.0 / 61  # best achievable from one leg alone
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.rrf_score for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(r.match_id != q for r in rs)
        # the winner scores at least a rank-1 single-leg hit; strictly
        # more only when the legs overlap — the synthetic corpus draws
        # text and embeddings independently, so disjoint legs are valid
        assert scores[0] >= round(max_single, 6)
        # every score is a sum of at most one hit per leg
        assert scores[0] <= 2 / 61


def test_session_top_paths(spark):
    rows = QUERIES["events_session_top_paths"](spark, SF).collect()
    assert 0 < len(rows) <= 10
    rs = sorted(rows, key=lambda r: r.rk)
    assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
    counts = [r.n_sessions for r in rs]
    assert counts == sorted(counts, reverse=True)
    for r in rs:
        steps = r.path.split(">")
        assert 1 <= len(steps) <= 5 and all(steps)


class TestRound4cPlanContracts:
    """Plan-shape pins for the round-4c queries (PLANS.md properties that
    must fail loudly on regression, not silently de-optimize)."""

    SF = "/root/testdata/sf0.001"

    def _plan(self, df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    def test_q6_filters_reach_the_scan(self, spark):
        plan = self._plan(QUERIES["forecast_revenue_change"](spark, self.SF))
        # the PushedFilters list is width-truncated in toString, so pin a
        # stable prefix of it plus the (untruncated) Filter node predicate
        assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
        assert "GreaterThanOrEqual(l_shipda" in plan
        assert "< 24.0)" in plan  # quantity bound survives to the plan
        # zero-join scalar aggregate: one exchange (partial -> final)
        assert plan.count("Exchange") <= 1

    def test_q2_argmax_is_an_aggregate_not_a_window(self, spark):
        plan = self._plan(QUERIES["best_supplier_per_brand"](spark, self.SF))
        assert "Window" not in plan  # max_by aggregate, no per-brand sort
        assert "CartesianProduct" not in plan

    def test_q10_topk_is_takeordered(self, spark):
        plan = self._plan(QUERIES["returned_item_customer_revenue"](spark, self.SF))
        assert "TakeOrderedAndProject" in plan

    def test_retrieval_queries_stay_jvm_side(self, spark):
        for q in ("text_bm25_topk", "hybrid_rrf_topk", "corpus_zipf_slope",
                  "embedding_pca_top_component", "corpus_heaps_curve"):
            plan = self._plan(QUERIES[q](spark, self.SF))
            assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, q
            assert "CartesianProduct" not in plan, q

    def test_pca_is_shuffle_bounded(self, spark):
        # corpus work = covariance aggregate; the 40 iterations add ZERO
        # exchanges (in-row array expressions over the one-row matrix)
        plan = self._plan(QUERIES["embedding_pca_top_component"](spark, self.SF))
        assert plan.count("Exchange") <= 8


def test_q13_outer_join_keeps_all_customers(spark):
    """Q13's defining semantics: the priority predicate lives in the JOIN
    condition, so customers whose orders all match the excluded priority
    (and customers with no orders) survive with count 0 — the
    distribution always covers every customer exactly once."""
    import pandas as pd

    rows = QUERIES["customer_order_count_distribution"](spark, SF).collect()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    kept = orders[orders["o_orderpriority"] != "1-URGENT"]
    per_cust = (
        cust[["c_custkey"]]
        .merge(kept[["o_custkey"]], left_on="c_custkey", right_on="o_custkey", how="left")
        .groupby("c_custkey")["o_custkey"].count()
    )
    expected = per_cust.value_counts().to_dict()
    got = {r.c_count: r.custdist for r in rows}
    assert got == {int(k): int(v) for k, v in expected.items()}
    assert sum(got.values()) == len(cust)
