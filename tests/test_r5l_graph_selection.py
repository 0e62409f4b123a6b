"""Round-5l operators: candidate-graph PageRank, k-center coreset,
winnowing fingerprints, Kendall tau-b, BH-FDR, ANN nDCG."""

import math

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def test_pagerank_matches_integer_reference(spark, sf):
    """Replicate the whole integer fixed-point trajectory in pure
    Python from the same candidate-pair relation."""
    from datafusion_functions_extra_spark.operators import similarity as SIM
    from datafusion_functions_extra_spark.operators.similarity import (
        PAGERANK_SCALE,
    )
    from datafusion_functions_extra_spark.suite import QUERIES

    d = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = [
        (r.id_a, r.id_b)
        for r in SIM.near_dup_pairs(d, "text", "doc_id", 0.5)
        .select("id_a", "id_b")
        .collect()
    ]
    edges = set()
    for a, b in pairs:
        edges.add((a, b))
        edges.add((b, a))
    nodes = sorted({a for a, _ in edges})
    deg = {v: sum(1 for a, _ in edges if a == v) for v in nodes}
    n = len(nodes)
    pr = {v: PAGERANK_SCALE // n for v in nodes}
    for _ in range(6):
        inflow = {v: 0 for v in nodes}
        for a, b in edges:
            inflow[b] += pr[a] // deg[a]
        pr = {
            v: (15 * (PAGERANK_SCALE // n) + 85 * inflow[v]) // 100
            for v in nodes
        }
    want = sorted(nodes, key=lambda v: (-pr[v], v))[:20]
    got = QUERIES["near_dup_pagerank_exact"](spark, sf).collect()
    assert [r.doc_id for r in sorted(got, key=lambda r: r.rank)] == want
    for r in got:
        assert r.pr_int == pr[r.doc_id]
        assert r.pr == pytest.approx(pr[r.doc_id] / PAGERANK_SCALE, abs=1e-6)
    # mass conservation up to integer-division loss
    assert sum(pr.values()) <= PAGERANK_SCALE
    assert sum(pr.values()) >= PAGERANK_SCALE - 100 * (n + len(edges))


def test_kcenter_matches_greedy_and_radius_monotone(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = sorted(
        QUERIES["embedding_kcenter_coreset"](spark, sf).collect(),
        key=lambda r: r.pick_rank,
    )
    pdf = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
    )
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    sel = [0]  # min id is first after the sort
    mind = np.round(1.0 - np.round(mat @ mat[0], 6), 6)
    want = [(1, int(ids[0]), None)]
    for r in range(2, 9):
        # argmax by (mind desc, id asc): ids sorted so argmax picks it
        i = int(np.argmax(mind))
        want.append((r, int(ids[i]), float(mind[i])))
        mind = np.minimum(mind, np.round(1.0 - np.round(mat @ mat[i], 6), 6))
    assert [(r.pick_rank, r.center_id) for r in got] == [
        (a, b) for a, b, _ in want
    ]
    assert got[0].radius is None
    radii = [r.radius for r in got[1:]]
    for g, (_, _, w) in zip(radii, want[1:]):
        assert g == pytest.approx(w, abs=2e-6)
    assert all(
        radii[i] >= radii[i + 1] - 1e-12 for i in range(len(radii) - 1)
    )
    assert len({r.center_id for r in got}) == 8


def test_winnow_matches_pure_python_replica(spark, sf):
    """Replicate the WHOLE winnowing pipeline (3-word shingles, 40-bit
    md5 hashes, window-4 min with rightmost tie-break, df<=50 hub
    screen, shared>=2 pair join) in pure Python."""
    import hashlib
    import re

    from datafusion_functions_extra_spark.operators.similarity import (
        WINNOW_W,
        _WINNOW_POS_BITS,
        _WINNOW_POS_MASK,
    )
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        (r.id_a, r.id_b): r.shared_fps
        for r in QUERIES["docs_winnow_pairs"](spark, sf).collect()
    }
    assert got, "winnowing found no candidate pairs"
    assert all(a < b for a, b in got)

    pdf = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    fps = {}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        norm = re.sub(r"\s+", " ", text).strip().lower()
        toks = norm.split(" ")
        grams = (
            [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
            if len(toks) >= 3
            else [norm]
        )
        keys = []
        for pos, g in enumerate(grams):
            h60 = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
            keys.append(
                ((h60 >> 20) << _WINNOW_POS_BITS) + (_WINNOW_POS_MASK - pos)
            )
        n = len(keys)
        starts = range(n - WINNOW_W + 1) if n >= WINNOW_W else [0]
        sel = {min(keys[i : i + WINNOW_W]) for i in starts}
        fps[int(doc_id)] = {k >> _WINNOW_POS_BITS for k in sel}
    df_count = {}
    for s in fps.values():
        for f in s:
            df_count[f] = df_count.get(f, 0) + 1
    rare = {f for f, c in df_count.items() if c <= 50}
    want = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        fa = fps[a] & rare
        for b in ids[i + 1 :]:
            shared = len(fa & fps[b])
            if shared >= 2:
                want[(a, b)] = shared
    assert got == want


def test_kendall_tau_matches_brute_force(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = QUERIES["lineitem_kendall_tau"](spark, sf).collect()[0]
    pdf = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .selectExpr(
            "cast(l_quantity as long) x",
            "cast(round(l_discount * 100) as long) y",
        )
        .toPandas()
    )
    x = pdf["x"].to_numpy()
    y = pdf["y"].to_numpy()
    n = len(x)
    conc = disc = 0
    step = 1000
    for i in range(0, n, step):
        xs = np.sign(x[i : i + step, None] - x[None, :]).astype(np.int8)
        ys = np.sign(y[i : i + step, None] - y[None, :]).astype(np.int8)
        prod = xs * ys
        conc += int((prod > 0).sum())
        disc += int((prod < 0).sum())
    conc //= 2
    disc //= 2
    assert (got.n_rows, got.concordant, got.discordant) == (n, conc, disc)
    _, cx = np.unique(x, return_counts=True)
    _, cy = np.unique(y, return_counts=True)
    tx = int((cx * (cx - 1) // 2).sum())
    ty = int((cy * (cy - 1) // 2).sum())
    assert (got.tie_x_pairs, got.tie_y_pairs) == (tx, ty)
    n0 = n * (n - 1) / 2
    tau = (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))
    assert got.tau_b == pytest.approx(tau, abs=2e-6)


def test_bh_fdr_step_up(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    ks = {
        r.source: r.p_asymp
        for r in QUERIES["source_quality_ks_drift"](spark, sf).collect()
    }
    got = {r.source: r for r in QUERIES["source_ks_fdr"](spark, sf).collect()}
    m = len(ks)
    order = sorted(ks, key=lambda s: (ks[s], s))
    suffmin = {}
    cur = float("inf")
    for i in range(m - 1, -1, -1):
        cur = min(cur, ks[order[i]] * m / (i + 1))
        suffmin[order[i]] = cur
    for i, src in enumerate(order):
        r = got[src]
        assert r.bh_rank == i + 1
        assert r.p_asymp == ks[src]
        want = min(1.0, suffmin[src])
        assert r.p_adj == pytest.approx(want, abs=2e-6)
        assert r.discovery_q10 == (r.p_adj <= 0.1)
        # adjusted p is monotone in the rank
        if i:
            assert r.p_adj >= got[order[i - 1]].p_adj - 1e-12


def test_ann_ndcg_bounds_and_ideal(spark, sf):
    """nDCG in [0, 1]; DCG of the exact list IS the ideal; replicate
    the fold from the two retrieval heads."""
    from datafusion_functions_extra_spark.operators import similarity as SIM
    from datafusion_functions_extra_spark.suite import QUERIES

    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    qids = list(range(8))
    exact = SIM.cosine_topk(e, qids, k=5).collect()
    ann = SIM.ann_multiprobe_topk(e, qids, k=5).collect()

    def dcg(rows, q):
        by_rank = {r.rank: r.cos for r in rows if r.q_id == q}
        return sum(
            max(by_rank.get(j, 0.0) or 0.0, 0.0) / math.log2(j + 1)
            for j in range(1, 6)
        )

    got = {r.q_id: r for r in QUERIES["embedding_ann_ndcg"](spark, sf).collect()}
    assert sorted(got) == qids
    for q in qids:
        r = got[q]
        assert r.idcg == pytest.approx(dcg(exact, q), abs=2e-6)
        assert r.dcg == pytest.approx(dcg(ann, q), abs=2e-6)
        assert r.dcg <= r.idcg + 1e-9
        if r.ndcg is not None:
            assert 0.0 <= r.ndcg <= 1.0 + 1e-9
            assert r.ndcg == pytest.approx(r.dcg / r.idcg, abs=2e-6)
