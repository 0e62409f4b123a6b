"""Round-5k operators: MMR diversified retrieval, KS drift screen,
type/value mutual information, quantile-normalization mapping."""

import math

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def _round6(x: float) -> float:
    # the house convention rounds the double's shortest decimal repr
    return float(round(x + 0.0, 6))


def test_mmr_topk_matches_greedy_brute_force(spark, sf):
    """Replicate the whole greedy MMR trajectory in numpy: pool =
    6-dp-cosine top-16 (id tie-break), then k-1 rounds of
    argmax(cos - 0.5 * max-sim-to-selected)."""
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        (r.q_id, r.pick_rank): (r.neighbor_id, r.relevance, r.mmr)
        for r in QUERIES["embedding_mmr_topk"](spark, sf).collect()
    }
    pdf = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
    )
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    by_id = {int(i): mat[j] for j, i in enumerate(ids)}
    for qid in range(8):
        qv = by_id[qid]
        cos = {
            int(i): _round6(float(qv @ by_id[int(i)]))
            for i in ids
            if int(i) != qid
        }
        pool = sorted(cos, key=lambda i: (-cos[i], i))[:16]
        sel = [pool[0]]
        assert got[(qid, 1)] == (pool[0], cos[pool[0]], None)
        for r in range(2, 6):
            best = None
            for c in pool:
                if c in sel:
                    continue
                msim = max(
                    _round6(float(by_id[c] @ by_id[s])) for s in sel
                )
                mmr = _round6(cos[c] - 0.5 * msim)
                if best is None or (-mmr, c) < (-best[1], best[0]):
                    best = (c, mmr)
            sel.append(best[0])
            nid, rel, mmr = got[(qid, r)]
            assert nid == best[0]
            assert rel == cos[best[0]]
            assert mmr == pytest.approx(best[1], abs=2e-6)


def test_ks_drift_matches_brute_force(spark, sf):
    """Per-source KS distance vs a direct two-sample CDF sweep on the
    same 6-dp-rounded scores."""
    from datafusion_functions_extra_spark.suite import QUERIES
    from datafusion_functions_extra_spark.functions.text import quality_score

    rows = {r.source: r for r in QUERIES["source_quality_ks_drift"](spark, sf).collect()}
    import pyspark.sql.functions as F

    pdf = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(
            "source",
            F.round(quality_score("text") + F.lit(1e-9), 6).alias("score"),
        )
        .toPandas()
    )
    n = len(pdf)
    assert sum(r.n_docs for r in rows.values()) == n
    for src, grp in pdf.groupby("source"):
        a = np.sort(grp["score"].to_numpy())
        b = np.sort(pdf.loc[pdf["source"] != src, "score"].to_numpy())
        vals = np.unique(pdf["score"].to_numpy())
        fa = np.searchsorted(a, vals, side="right") / len(a)
        fb = np.searchsorted(b, vals, side="right") / len(b)
        d = float(np.max(np.abs(fa - fb)))
        r = rows[src]
        assert r.ks_d == pytest.approx(d, abs=2e-6)
        lam = math.sqrt(len(a) * len(b) / n) * d
        assert r.ks_lambda == pytest.approx(lam, abs=2e-6)
        p = 2.0 * sum(
            (-1.0) ** (j - 1) * math.exp(-2.0 * j * j * r.ks_lambda**2)
            for j in range(1, 6)
        )
        assert r.p_asymp == pytest.approx(min(1.0, max(0.0, p)), abs=2e-6)
        assert 0.0 <= r.p_asymp <= 1.0


def test_type_value_mi_matches_direct(spark, sf):
    """MI / entropies vs a direct plug-in computation on the same
    16-bin contingency table; NMI bounded in [0, 1]."""
    from datafusion_functions_extra_spark.suite import QUERIES

    got = QUERIES["events_type_value_mi"](spark, sf).collect()[0]
    pdf = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "event_type",
            "least(15, cast(floor(cast(round(value * 100) as long) / 4096.0) as long)) as bin",
        )
        .toPandas()
    )
    n = len(pdf)
    ct = pdf.groupby(["event_type", "bin"]).size()
    pi = pdf.groupby("event_type").size() / n
    pj = pdf.groupby("bin").size() / n
    mi = 0.0
    for (t, b), c in ct.items():
        pij = c / n
        mi += pij * math.log(pij / (pi[t] * pj[b]))
    h_t = -sum(p * math.log(p) for p in pi)
    h_b = -sum(p * math.log(p) for p in pj)
    assert got.n_rows == n
    assert got.n_cells == len(ct)
    # per-term micro-nat rounding: <= 0.5e-6 per cell/marginal term
    assert got.mi_nats == pytest.approx(mi, abs=len(ct) * 1e-6)
    assert got.h_type_nats == pytest.approx(h_t, abs=1e-4)
    assert got.h_bin_nats == pytest.approx(h_b, abs=1e-4)
    assert got.nmi == pytest.approx(mi / math.sqrt(h_t * h_b), abs=1e-3)
    assert got.mi_nats >= 0.0
    assert 0.0 <= got.nmi <= 1.0


def test_quantile_norm_map_order_statistics(spark, sf):
    """Cutoffs are exact discrete order statistics: min score whose
    cumulative count reaches ceil(d*n/10); pooled cutoffs identical
    across sources; cutoffs non-decreasing in the decile."""
    from datafusion_functions_extra_spark.suite import QUERIES
    from datafusion_functions_extra_spark.functions.text import quality_score
    import pyspark.sql.functions as F

    out = QUERIES["quality_quantile_norm_map"](spark, sf).collect()
    pdf = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(
            "source",
            F.round(quality_score("text") + F.lit(1e-9), 6).alias("score"),
        )
        .toPandas()
    )

    def cutoff(scores, d):
        s = np.sort(scores)
        return float(s[math.ceil(d * len(s) / 10.0) - 1])

    pooled = {d: cutoff(pdf["score"].to_numpy(), d) for d in range(1, 10)}
    per_src = {}
    for r in out:
        per_src.setdefault(r.source, {})[r.decile] = r
        assert r.pooled_cutoff == pytest.approx(pooled[r.decile], abs=1e-9)
        grp = pdf.loc[pdf["source"] == r.source, "score"].to_numpy()
        assert r.src_cutoff == pytest.approx(cutoff(grp, r.decile), abs=1e-9)
        assert r.shift == pytest.approx(
            round(pooled[r.decile] - cutoff(grp, r.decile) + math.copysign(1e-9, pooled[r.decile] - cutoff(grp, r.decile)), 6),
            abs=2e-6,
        )
    for src, rows in per_src.items():
        assert sorted(rows) == list(range(1, 10))
        for d in range(2, 10):
            assert rows[d].src_cutoff >= rows[d - 1].src_cutoff
            assert rows[d].pooled_cutoff >= rows[d - 1].pooled_cutoff
