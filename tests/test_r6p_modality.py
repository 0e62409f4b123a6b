"""Round-6p: cross-modal agreement (Jaccard vs cosine) — Python
replica on sf0.001."""

import hashlib
import math
import re

import pandas as pd
import pytest


def test_modality_agreement_matches_python(spark):
    sf = "/root/testdata/sf0.001"
    from datafusion_functions_extra_spark.suite import _MODAL_PANEL, QUERIES

    row = QUERIES["docs_modality_agreement"](spark, sf).collect()[0]

    docs = pd.read_parquet(f"{sf}/documents.parquet")
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    ids = sorted(
        (int(d) for d in docs["doc_id"]),
        key=lambda d: (h60(f"modal:{d}"), d),
    )[:_MODAL_PANEL]
    toks = {}
    for r in docs.itertuples(index=False):
        if int(r.doc_id) in ids:
            toks[int(r.doc_id)] = set(
                re.sub(r"\s+", " ", r.text).strip().lower().split(" ")
            )
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.itertuples(index=False)
        if int(r.vec_id) in ids
    }
    xs, ys = [], []
    sids = sorted(ids)
    for i, a in enumerate(sids):
        for b in sids[i + 1 :]:
            inter = len(toks[a] & toks[b])
            uni = len(toks[a] | toks[b])
            xs.append(int(round(inter * 1e6 / uni + 1e-3)))
            dot = sum(x * y for x, y in zip(vecs[a], vecs[b]))
            na = math.sqrt(sum(x * x for x in vecs[a]))
            nb = math.sqrt(sum(x * x for x in vecs[b]))
            ys.append(int(round(round(dot / (na * nb), 6) * 1e6)))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    r = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    assert row.n_pairs == n == _MODAL_PANEL * (_MODAL_PANEL - 1) // 2
    assert row.pearson_r == pytest.approx(r, abs=2e-6)
    assert -1 <= row.pearson_r <= 1
