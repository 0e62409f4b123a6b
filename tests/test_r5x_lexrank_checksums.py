"""Round-5x operators: per-document LexRank extractive summary and
mergeable per-source content checksums."""

import hashlib
import re
from collections import defaultdict

import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def _r6(x):
    return round(x + 1e-9, 6)


def _norm(text):
    return re.sub(r"\s+", " ", text).strip().lower()


def test_lexrank_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import (
        _LEX_DAMP,
        _LEX_ROUNDS,
        _LEX_SEG,
        _LEX_TOPK,
        QUERIES,
    )

    got = defaultdict(dict)
    for r in QUERIES["docs_lexrank_summary"](spark, sf).collect():
        got[r.doc_id][r.rk] = (r.sent_idx, r.score, r.sentence)

    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = _norm(text).split(" ")
        sents = [
            " ".join(toks[i : i + _LEX_SEG])
            for i in range(0, len(toks), _LEX_SEG)
        ]
        if len(sents) < 2:
            assert doc_id not in got
            continue
        st = [set(s.split(" ")) for s in sents]
        n = len(sents)
        sim = [
            [
                0.0
                if i == j
                else _r6(len(st[i] & st[j]) / len(st[i] | st[j]))
                for j in range(n)
            ]
            for i in range(n)
        ]
        wm = []
        for row in sim:
            rs = sum(row)
            wm.append(
                [_r6(x / rs) if rs > 0 else 0.0 for x in row]
            )
        pr = [_r6(1.0 / n)] * n
        for _ in range(_LEX_ROUNDS):
            pr = [
                _r6(
                    (1 - _LEX_DAMP) / n
                    + _LEX_DAMP
                    * sum(pr[i] * wm[i][j] for i in range(n))
                )
                for j in range(n)
            ]
        order = sorted(range(n), key=lambda i: (-pr[i], i))
        head = order[:_LEX_TOPK]
        assert len(got[doc_id]) == len(head)
        for rk, i in enumerate(head, 1):
            gi, gs, gtext = got[doc_id][rk]
            assert gi == i + 1, (doc_id, rk)
            assert gs == pytest.approx(_r6(pr[i]), abs=1e-9)
            assert gtext == sents[i]
    # centrality scores form (approximately) a distribution per doc
    for doc_id, rows in got.items():
        assert all(0.0 < s <= 1.0 for _i, s, _t in rows.values())


def test_content_checksums_match_python(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.source: r
        for r in QUERIES["docs_content_checksums"](spark, sf).collect()
    }

    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("source", "text")
        .toPandas()
    )
    acc = defaultdict(lambda: [0, 0, 1 << 62, -1])  # n, sum, min, max
    for source, text in zip(docs["source"], docs["text"]):
        hv = int(hashlib.md5(text.encode()).hexdigest()[:15], 16)
        a = acc[source]
        a[0] += 1
        a[1] += hv
        a[2] = min(a[2], hv)
        a[3] = max(a[3], hv)
    assert set(got) == set(acc)
    for source, (n, s, mn, mx) in acc.items():
        r = got[source]
        assert r.n_docs == n
        assert r.checksum == s % (1 << 60)
        assert r.min_hash == mn
        assert r.max_hash == mx

    # mergeability + sensitivity: flipping one doc changes the checksum
    any_source = next(iter(acc))
    one = int(
        hashlib.md5(b"mutated content").hexdigest()[:15], 16
    )
    assert (acc[any_source][1] - one) % (1 << 60) != got[
        any_source
    ].checksum or one == 0
