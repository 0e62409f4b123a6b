"""Round-10 suite additions: an independent NumPy replica of the
logistic-regression distillation GD trajectory, closed-form identities of
the scaling-law fit, and shard-locality invariants.

SF constant: every test reads the smallest generated dataset
(/root/testdata/sf0.001) like the rest of the suite tests.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow.parquet as pq

from datafusion_functions_extra_spark import suite
from datafusion_functions_extra_spark.functions import text as TX

SF = "/root/testdata/sf0.001"


def _round_half_away(x: float) -> int:
    """Spark F.round / DuckDB round both round halves AWAY from zero;
    Python round() is half-to-even — use the engines' convention."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _norm_tokens(text: str) -> list[str]:
    norm = re.sub(r"\s+", " ", text).strip().lower()
    return norm.split(" ")


def _quality(text: str) -> float:
    toks = _norm_tokens(text)
    norm = " ".join(toks)
    stop = set(TX.STOPWORDS)
    diversity = len(set(toks)) / len(toks)
    sw = sum(1 for t in toks if t in stop) / len(toks)
    prose = 1.0 - min(1.0, abs(sw - 0.4) / 0.6)
    len_score = min(1.0, len(norm) / 500.0)
    q = 0.3 * len_score + 0.4 * diversity + 0.3 * prose
    return _round_half_away((q + 1e-9) * 1e6) / 1e6


def _logreg_replica():
    """The full docs_quality_logreg_gd pipeline in NumPy: micro-int
    features, exact-integer-moment standardization, nano-snapped
    full-batch GD — the golden twin of both engines' trajectory."""
    tbl = pq.read_table(f"{SF}/documents.parquet").to_pydict()
    y, f1, f2, f3 = [], [], [], []
    for text, n_chars in zip(tbl["text"], tbl["n_chars"]):
        toks = _norm_tokens(text)
        y.append(1 if _quality(text) >= 0.5 else 0)
        f1.append(_round_half_away(math.log(1.0 + n_chars) * 1e6 + 1e-3))
        f2.append(_round_half_away(math.log(1.0 + len(toks)) * 1e6 + 1e-3))
        f3.append(_round_half_away(n_chars / len(toks) * 1e6 + 1e-3))
    y = np.array(y, dtype=np.float64)
    n = len(y)
    Z = np.empty((n, 3))
    for j, f in enumerate((f1, f2, f3)):
        f = np.array(f, dtype=object)  # exact python-int moments
        s, q = int(sum(f)), int(sum(v * v for v in f))
        Z[:, j] = [
            float(n * int(v) - s) / math.sqrt(float(n * q - s * s)) for v in f
        ]
    X = np.hstack([np.ones((n, 1)), Z])
    w = np.zeros(4)

    def snap_sum(terms):
        return sum(_round_half_away(t * 1e9) for t in terms) / 1e9

    for _ in range(suite._LR_ITERS):
        z = np.clip(X @ w, -30.0, 30.0)
        p = 1.0 / (1.0 + np.exp(-z))
        g = np.array(
            [snap_sum((p - y) * X[:, j]) for j in range(4)]
        )
        w = w - suite._LR_RATE * g / n
    z = np.clip(X @ w, -30.0, 30.0)
    p = np.clip(1.0 / (1.0 + np.exp(-z)), 1e-12, 1.0 - 1e-12)
    sll = snap_sum(y * np.log(p) + (1.0 - y) * np.log(1.0 - p))
    acc = float(np.mean((z >= 0.0) == (y == 1.0)))
    return {
        "n": n,
        "n_pos": int(y.sum()),
        "w": w,
        "logloss_model": -sll / n,
        "accuracy": acc,
    }


def test_logreg_gd_numpy_replica(spark):
    row = suite.QUERIES["docs_quality_logreg_gd"](spark, SF).collect()[0]
    rep = _logreg_replica()
    assert row["n_docs"] == rep["n"]
    assert row["n_pos"] == rep["n_pos"]
    for col, j in (
        ("w_intercept", 0),
        ("w_log_chars", 1),
        ("w_log_tokens", 2),
        ("w_mean_tok_len", 3),
    ):
        assert abs(row[col] - rep["w"][j]) < 2e-6, (col, row[col], rep["w"][j])
    assert abs(row["logloss_model"] - rep["logloss_model"]) < 2e-6
    assert abs(row["accuracy"] - rep["accuracy"]) < 2e-6
    # the student must beat the base-rate predictor on its training set
    assert row["logloss_model"] < row["logloss_base"]
    # but distillation is lossy: the teacher's diversity/stopword terms
    # are invisible to the length-family features
    assert row["accuracy"] < 1.0


def test_scaling_law_fit_identities(spark):
    row = suite.QUERIES["corpus_scaling_law_fit"](spark, SF).collect()[0]
    # the NLL points are the (negated) learning-curve outputs
    lc = {
        r["train_eighths"]: -r["mean_logprob"]
        for r in suite.QUERIES["corpus_learning_curve"](spark, SF).collect()
    }
    for k in (1, 2, 4, 7):
        assert abs(row[f"nll_{k}"] - lc[k]) < 1e-9
    d12, d24 = lc[1] - lc[2], lc[2] - lc[4]
    assert row["fit_valid"] == (d12 > 0 and d24 > 0 and d12 > d24)
    if row["fit_valid"]:
        beta, e = row["beta"], row["irreducible_nll"]
        a = lc[1] - e
        # the closed form interpolates its three fitted points exactly
        for f, l in ((1.0, lc[1]), (2.0, lc[2]), (4.0, lc[4])):
            assert abs(e + a * f ** (-beta) - l) < 5e-6, (f, l)
        # and the held-out point identity: resid_7 = nll_7 - pred_nll_7
        assert abs(row["resid_7"] - (row["nll_7"] - row["pred_nll_7"])) < 2e-6
        # extrapolation is monotone toward the irreducible floor
        assert row["pred_nll_full"] <= row["pred_nll_7"] + 1e-9
        assert e - 1e-9 <= row["pred_nll_10x"] <= row["pred_nll_full"] + 1e-9
    else:
        assert row["beta"] is None and row["pred_nll_10x"] is None


def test_shard_locality_band_beats_id_hash(spark):
    rows = {
        r["strategy"]: r
        for r in suite.QUERIES["dedup_shard_locality_loss"](spark, SF).collect()
    }
    assert set(rows) == {"band_key", "id_hash"}
    band, idh = rows["band_key"], rows["id_hash"]
    assert band["n_pairs"] == idh["n_pairs"] > 0
    for r in rows.values():
        assert 0 <= r["within_pairs"] <= r["n_pairs"]
        assert 0.0 <= r["recall"] <= 1.0
        # no shard can hold fewer than its even share's floor
        assert r["max_shard_frac"] >= 1.0 / r["n_shards"] - 1e-9
    # content-keyed sharding must dominate random placement on recall:
    # a same-band-0 pair is co-sharded by construction, an id-hash pair
    # only by 1/8 chance
    assert band["recall"] > idh["recall"]
    # random placement concentrates near 1/8 (loose envelope, small n)
    assert idh["recall"] < 0.5


def _np_spectral(pairs, ids_x0):
    """The near_dup_spectral_bipartition iteration replicated in NumPy:
    lazy walk M = (I + D^-1/2 A D^-1/2)/2, v1 deflation, nano-snapped
    cross-node sums — given the pair list and the init values."""
    nodes = sorted({v for p in pairs for v in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n, dtype=np.int64)
    for a, b in pairs:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    m2 = int(deg.sum())
    v1 = np.sqrt(deg / m2)
    x = np.array([ids_x0[v] for v in nodes])

    def snap_sum_vec(terms):
        return sum(_round_half_away(t * 1e9) for t in terms) / 1e9

    v1n = snap_sum_vec(v1 * v1)

    def lazy_step(x):
        s = np.zeros(n, dtype=np.int64)
        xd = x / np.sqrt(deg.astype(float))
        for a, b in pairs:
            ia, ib = idx[a], idx[b]
            s[ia] += _round_half_away(xd[ib] * 1e9)
            s[ib] += _round_half_away(xd[ia] * 1e9)
        return (x + (s / 1e9) / np.sqrt(deg.astype(float))) / 2.0

    for _ in range(suite._SP_ITERS):
        y = lazy_step(x)
        dp = snap_sum_vec(v1 * y)
        ss = snap_sum_vec(y * y)
        # fused deflated norm: ||y - dp*v1||^2 = ss - 2dp^2 + dp^2*||v1||^2
        nr = math.sqrt(ss - 2.0 * dp * dp + dp * dp * v1n)
        x = (y - dp * v1) / nr
    yf = lazy_step(x)
    dpf = snap_sum_vec(v1 * yf)
    sxy = snap_sum_vec(x * yf)
    sxv = snap_sum_vec(x * v1)
    mu = sxy - dpf * sxv
    pos = x >= 0.0
    cut = sum(1 for a, b in pairs if pos[idx[a]] != pos[idx[b]])
    vol_pos = int(deg[pos].sum())
    vol_neg = int(deg[~pos].sum())
    return {
        "n_nodes": n,
        "n_edges": len(pairs),
        "n_side_pos": int(pos.sum()),
        "n_side_neg": int((~pos).sum()),
        "cut_edges": cut,
        "conductance": (
            cut / min(vol_pos, vol_neg) if min(vol_pos, vol_neg) > 0 else None
        ),
        "lambda2": 2.0 * mu - 1.0,
        "cheeger_upper": math.sqrt(2.0 * max(0.0, 2.0 - 2.0 * mu)),
    }


def test_spectral_bipartition_numpy_replica(spark):
    import hashlib

    row = suite.QUERIES["near_dup_spectral_bipartition"](spark, SF).collect()[0]
    pairs = [
        (r["id_a"], r["id_b"])
        for r in suite.QUERIES["near_dup_pairs"](spark, SF).collect()
    ]

    def hash60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    ids_x0 = {
        v: ((hash60(f"sp:{v}") % 2001) - 1000) / 1000.0
        for p in pairs
        for v in p
    }
    want = _np_spectral(pairs, ids_x0)
    for col in ("n_nodes", "n_edges", "n_side_pos", "n_side_neg", "cut_edges"):
        assert row[col] == want[col], (col, row[col], want[col])
    for col in ("conductance", "lambda2", "cheeger_upper"):
        assert abs(row[col] - want[col]) < 2e-6, (col, row[col], want[col])
    # the partitionability certificate on a union of duplicate clusters:
    # a (near-)zero-conductance balanced cut with lambda2 at the top of
    # the spectrum
    assert row["conductance"] <= 0.5
    assert row["lambda2"] <= 1.0 + 1e-9
    assert abs(row["n_side_pos"] - row["n_side_neg"]) <= row["n_nodes"]
