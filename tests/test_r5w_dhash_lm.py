"""Round-5w operators: perceptual dHash + banded image near-dup pairs,
stupid-backoff trigram LM, embedding-graph components."""

import math
import random
from collections import Counter, defaultdict

import pytest

from datafusion_functions_extra_spark.functions import multimodal as MM
from tests.test_multimodal import _encode_png


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def _r6(x):
    return round(x + 1e-9, 6)


def _dhash_py(rows, channels, n=8):
    h = len(rows)
    w = len(rows[0]) // channels
    gray = [
        [
            sum(rows[r][c * channels + k] for k in range(channels))
            / channels
            for c in range(w)
        ]
        for r in range(h)
    ]
    out = 0
    for i in range(n * n):
        r, c = i // n, i % n
        sr = r * h // n
        ca = c * w // (n + 1)
        cb = (c + 1) * w // (n + 1)
        if gray[sr][ca] > gray[sr][cb]:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out  # signed i64


def _images():
    rng = random.Random(7)
    w, h = 18, 12
    base = [
        [rng.randrange(256) for _ in range(w * 3)] for _ in range(h)
    ]
    near = [row[:] for row in base]
    near[3][9] = (near[3][9] + 8) % 256  # one perturbed channel byte
    far = [[255 - v for v in row] for row in base]
    gray_img = [
        [((r * 7 + c) * 5) % 256 for c in range(w)] for r in range(h)
    ]
    return {
        1: (base, 3),
        2: ([row[:] for row in base], 3),  # exact duplicate
        3: (near, 3),
        4: (far, 3),
        5: (gray_img, 1),
    }


def test_dhash_matches_python_replica(spark):
    imgs = _images()
    df = spark.createDataFrame(
        [(i, _encode_png(rows, channels=c)) for i, (rows, c) in imgs.items()]
        + [(99, b"\xffnot-an-image")],
        "doc_id bigint, payload binary",
    )
    got = {r.id: r.dhash for r in MM.dhash64(df, "payload", "doc_id").collect()}
    for i, (rows, c) in imgs.items():
        assert got[i] == _dhash_py(rows, c), i
    # undecodable payloads degrade to NULL, never abort
    assert got[99] is None


def test_dhash_pairs_find_image_near_dups(spark):
    imgs = _images()
    df = spark.createDataFrame(
        [(i, _encode_png(rows, channels=c)) for i, (rows, c) in imgs.items()],
        "doc_id bigint, payload binary",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in MM.dhash_pairs(df, "payload", "doc_id", max_hamming=6).collect()
    }
    # the exact duplicate pairs at hamming 0; the one-byte perturbation
    # stays within the threshold
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 6
    assert (2, 3) in pairs
    # the inverted image flips every gradient: far from all of 1..3
    assert not any(4 in p for p in pairs)


def test_trigram_backoff_ladder(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    rows = {r.doc_id: r for r in QUERIES["text_trigram_logprob"](spark, sf).collect()}
    assert len(rows) > 0
    # train-half docs never back off (their trigrams are in the model);
    # some held-out docs must exercise the ladder
    train = [r for d, r in rows.items() if d % 2 == 0]
    held = [r for d, r in rows.items() if d % 2 == 1]
    assert train and held
    assert all(r.backoff_rate == 0.0 for r in train)
    assert any(r.backoff_rate > 0.0 for r in held)
    # log-probabilities are negative, rates are rates
    for r in rows.values():
        assert r.avg_logprob < 0
        assert 0.0 <= r.backoff_rate <= 1.0
        assert r.n_trigrams >= 1


def test_embedding_components_consistent_with_pairs(spark, sf):
    from datafusion_functions_extra_spark.operators import similarity as SIM
    from datafusion_functions_extra_spark.suite import (
        _EMB_CC_THRESHOLD,
        QUERIES,
        load_table,
    )

    comp = {
        r.vec_id: r.component
        for r in QUERIES["embedding_near_dup_components"](spark, sf).collect()
    }
    e = load_table(spark, sf, "embeddings")
    pairs = [
        (r.id_a, r.id_b)
        for r in SIM.embedding_near_dup_pairs(
            e, threshold=_EMB_CC_THRESHOLD
        )
        .select("id_a", "id_b")
        .collect()
    ]
    # union-find ground truth
    parent = {v: v for v in comp}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in comp}
    # min-label propagation converges to the component MIN id
    mins = defaultdict(lambda: 1 << 62)
    for v, root in want.items():
        mins[root] = min(mins[root], v)
    assert comp == {v: mins[root] for v, root in want.items()}
    # pairs really connect things (otherwise the test is vacuous)
    assert pairs and any(comp[a] == comp[b] for a, b in pairs)
