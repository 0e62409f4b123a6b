"""Round-5z: label-propagation communities + Rocchio PRF — Python
replicas on sf0.001."""

import math
from collections import Counter, defaultdict

import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def _knn3_edges_py(sf):
    import pandas as pd

    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    uv = {}
    for r in emb.itertuples(index=False):
        v = [float(x) for x in r.embedding]
        n = math.sqrt(sum(x * x for x in v))
        uv[int(r.vec_id)] = [x / n for x in v]
    ids = sorted(uv)
    edges = set()
    for a in ids:
        scored = sorted(
            (-round(sum(x * y for x, y in zip(uv[a], uv[b])), 6), b)
            for b in ids
            if b != a
        )[:3]
        for _, b in scored:
            edges.add((min(a, b), max(a, b)))
    return ids, edges


def test_label_propagation_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import _LPA_ROUNDS, QUERIES

    got = {
        r.community: (r.n_members, r.min_member, r.max_member)
        for r in QUERIES["embedding_label_propagation"](spark, sf).collect()
    }

    ids, edges = _knn3_edges_py(sf)
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    lbl = {v: v for v in ids}
    for _ in range(_LPA_ROUNDS):
        new = {}
        for v in ids:
            if not adj[v]:
                new[v] = lbl[v] if False else v  # isolated keeps own
                continue
            cnt = Counter(lbl[u] for u in adj[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lbl = new
    comm = defaultdict(list)
    for v, c in lbl.items():
        comm[c].append(v)
    want = {c: (len(vs), min(vs), max(vs)) for c, vs in comm.items()}
    assert got == want
    # communities must be coarser than singletons but finer than one blob
    assert 1 < len(want) < len(ids)


def test_rocchio_expansion_matches_python(spark, sf):
    import pandas as pd

    from datafusion_functions_extra_spark.suite import _BM25_QUERIES, QUERIES

    rows = QUERIES["text_rocchio_expansion"](spark, sf).collect()
    got = {
        (r.query_id, r.doc_id): (r.exp_terms, r.rk, r.in_base, r.score)
        for r in rows
    }

    docs = pd.read_parquet(f"{sf}/documents.parquet")
    tf = defaultdict(Counter)
    import re

    for r in docs.itertuples(index=False):
        toks = re.sub(r"\s+", " ", r.text).strip().lower().split(" ")
        tf[int(r.doc_id)].update(toks)
    dl = {d: sum(c.values()) for d, c in tf.items()}
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs

    def retrieve(query_terms, k):
        dfreq = Counter()
        for t in set(query_terms):
            dfreq[t] = sum(1 for d in tf if t in tf[d])
        scores = defaultdict(float)
        for d in tf:
            s = 0.0
            hit = False
            for t in query_terms:
                f = tf[d].get(t, 0)
                if not f:
                    continue
                hit = True
                idf = math.log(1 + (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                s += idf * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))
            if hit:
                scores[d] = round(s + 1e-9 if s >= 0 else s - 1e-9, 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(d, sc, rk + 1) for rk, (d, sc) in enumerate(ranked)]

    for qid, terms in _BM25_QUERIES:
        base = retrieve(terms, 5)
        fbdocs = [d for d, _, rk in base if rk <= 3]
        w = Counter()
        for d in fbdocs:
            for t, f in tf[d].items():
                if t not in terms:
                    w[t] += f
        exp = [
            t
            for t, _ in sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        ]
        q2 = sorted(set(terms) | set(exp))
        second = retrieve(q2, 5)
        base5 = {d for d, _, _ in base}
        for d, sc, rk in second:
            et, grk, gin, gsc = got[(qid, d)]
            assert et == ",".join(sorted(exp))
            assert grk == rk
            assert gin == (d in base5)
            assert gsc == pytest.approx(sc, abs=2e-6)
