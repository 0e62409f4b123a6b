"""Round-9 suite additions: invariants + an independent NumPy replica
of the exact KNN-Shapley recursion (Jia et al. 2019) as a golden check.

SF constant: every test reads the smallest generated dataset
(/root/testdata/sf0.001) like the rest of the suite tests.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq

from datafusion_functions_extra_spark import suite

SF = "/root/testdata/sf0.001"


def test_negbin_dispersion_internal_consistency(spark):
    rows = suite.QUERIES["events_negbin_dispersion"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_days"] >= 2
        assert r["n_events"] >= 1
        # vmr and nb_alpha must be consistent with the reported moments
        assert math.isclose(
            r["vmr"], r["var_daily"] / r["mean_daily"], rel_tol=1e-4
        )
        assert r["overdispersed"] == (r["var_daily"] > r["mean_daily"])
        if r["overdispersed"]:
            assert r["nb_alpha"] > 0


def test_chao1_bounds_and_vocab_agreement(spark):
    row = suite.QUERIES["corpus_chao1_vocab"](spark, SF).collect()[0]
    # Chao1 is a LOWER-bounded richness estimate: never below observed V
    assert row["chao1_vocab"] >= row["vocab_size"]
    assert 0.0 < row["gt_coverage"] <= 1.0
    assert 0.0 <= row["singleton_share"] <= 1.0
    # spectrum must agree with the shared tokenizer's vocabulary relation
    vocab = suite.QUERIES["text_vocabulary"](spark, SF)
    assert vocab.count() == row["vocab_size"]


def test_join_skew_diagnosis_invariants(spark):
    rows = {
        r["key_name"]: r
        for r in suite.QUERIES["lineitem_join_skew_diagnosis"](spark, SF).collect()
    }
    assert set(rows) == {"l_orderkey", "l_partkey", "l_suppkey"}
    n_li = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    for r in rows.values():
        assert r["n_rows"] == n_li
        assert r["skew_ratio"] >= 1.0 - 1e-9
        assert 0.0 < r["top10_share"] <= 1.0
        assert 1 <= r["recommended_salt"] <= 32
        assert r["max_key_rows"] * r["n_keys"] >= r["n_rows"]
    # orderkey is the fine-grained key: many more distinct values
    assert rows["l_orderkey"]["n_keys"] > rows["l_suppkey"]["n_keys"]


def test_code_prose_screen_bounds(spark):
    rows = suite.QUERIES["docs_code_prose_screen"](spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["n_code"] <= r["n_docs"]
        assert 0.0 <= r["frac_code"] <= 1.0
        assert 0.0 <= r["mean_code_score"] <= 1.0


def test_bcubed_bounds(spark):
    row = suite.QUERIES["near_dup_bcubed_eval"](spark, SF).collect()[0]
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert row["n_docs"] == n_docs
    assert row["n_pred_clusters"] <= n_docs
    assert row["n_true_groups"] <= n_docs
    for c in ("bcubed_precision", "bcubed_recall", "bcubed_f1"):
        assert 0.0 < row[c] <= 1.0
    # F1 is the harmonic mean: bounded by the larger of P and R
    assert row["bcubed_f1"] <= max(row["bcubed_precision"], row["bcubed_recall"]) + 1e-9


def test_oph_bounds_and_budget_story(spark):
    row = suite.QUERIES["minhash_oph_densified"](spark, SF).collect()[0]
    assert row["n_pairs"] > 0
    assert row["mae_kperm"] >= 0.0 and row["mae_oph"] >= 0.0
    assert 0.0 <= row["mean_empty_bin_frac"] < 1.0
    # estimates are multiples of 1/16 compared against exact J in [0,1],
    # so MAE can never exceed 1
    assert row["mae_oph"] <= 1.0 and row["mae_kperm"] <= 1.0


def _round_half_away(x: float) -> int:
    """Half-away-from-zero rounding, matching Spark F.round and DuckDB
    round() on doubles.  Python's built-in round() is banker's
    (half-to-even), which first diverges at rank 1024 where 1e9/r is an
    exact .5 — use this in the replica so it stays a true golden at
    larger eval corpora (ADVICE r9 item 3)."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _np_knn_shapley_per_label(sf_dir: str, k: int = 5):
    """Independent NumPy replica of the query's full pipeline: L2
    normalize, 6-dp-rounded cosine, rank by (cos desc, neighbor asc),
    nano-snapped recursion terms, suffix sums, per-label aggregation."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.asarray(t["vec_id"])
    labels = np.asarray(t["label"])
    emb = np.array([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    u = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    cos = np.round(u @ u.T, 6)
    n = len(ids)
    order_ids = np.argsort(ids)
    assert (ids[order_ids] == np.arange(n)).all() or True  # ids need not be 0..n-1
    tot_nano = {}  # train idx -> summed snano over test points
    for ti in range(n):
        others = np.array([j for j in range(n) if j != ti])
        key = sorted(others, key=lambda j: (-cos[ti, j], ids[j]))
        ind = (labels[np.array(key)] == labels[ti]).astype(np.int64)
        nn = len(key)
        terms = np.empty(nn, dtype=np.int64)
        for m in range(nn - 1):
            r = m + 1  # 1-based rank
            terms[m] = _round_half_away(
                float(ind[m] - ind[m + 1]) * min(k, r) * 1e9 / (k * r)
            )
        terms[nn - 1] = _round_half_away(float(ind[nn - 1]) * 1e9 / nn)
        suffix = np.cumsum(terms[::-1])[::-1]
        for m, j in enumerate(key):
            tot_nano[j] = tot_nano.get(j, 0) + int(suffix[m])
    out = {}
    for lab in sorted(set(labels.tolist())):
        idxs = [j for j in range(n) if labels[j] == lab]
        vals = [tot_nano[j] / 1e9 / (n - 1) for j in idxs]
        out[int(lab)] = (
            len(idxs),
            sum(tot_nano[j] for j in idxs) / 1e9 / (n - 1) / len(idxs),
            sum(1 for j in idxs if tot_nano[j] < 0) / len(idxs),
        )
    return out


def test_knn_shapley_matches_numpy_replica(spark):
    got = {
        r["label"]: r
        for r in suite.QUERIES["embedding_knn_shapley"](spark, SF).collect()
    }
    want = _np_knn_shapley_per_label(SF)
    assert set(got) == set(want)
    for lab, (n_train, mean_v, frac_neg) in want.items():
        r = got[lab]
        assert r["n_train"] == n_train
        assert math.isclose(r["mean_shapley"], round(mean_v, 6), abs_tol=2e-6), (
            lab, r["mean_shapley"], mean_v
        )
        assert math.isclose(r["frac_negative"], round(frac_neg, 6), abs_tol=2e-6)
