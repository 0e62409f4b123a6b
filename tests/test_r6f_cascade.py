"""Round-6f: dedup cascade audit — the per-stage aggregation is
recomputed in pandas from the four production flag operators (each of
which has its own oracle/pytest coverage), plus structural invariants."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def test_cascade_matches_flag_recomputation(spark, sf):
    from datafusion_functions_extra_spark.operators import dedup as DD
    from datafusion_functions_extra_spark.operators import similarity as SIM
    from datafusion_functions_extra_spark.operators.clustering import semdedup
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.stage_order: (r.stage, r.n_dropped_alone, r.n_marginal, r.survivors)
        for r in QUERIES["corpus_dedup_cascade"](spark, sf).collect()
    }

    d = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    ids = [r.doc_id for r in d.select("doc_id").collect()]
    kept_ex = {r.doc_id for r in DD.exact_dedup(d, "text", "doc_id").collect()}
    keep_id = {
        r.doc_id: r.keep_id
        for r in SIM.near_dup_clusters(d, "text", "doc_id", 0.5).collect()
    }
    sh_dropped = {
        r.id_b
        for r in SIM.simhash_pairs(d, "text", "doc_id", max_hamming=3).collect()
    }
    sd_kept = {r.vec_id: r.kept for r in semdedup(emb).collect()}

    f = {
        i: (
            i not in kept_ex,
            keep_id[i] != i,
            i in sh_dropped,
            not sd_kept.get(i, True),
        )
        for i in ids
    }
    n = len(ids)
    names = ["exact", "minhash", "simhash", "semantic"]
    want = {}
    for k in range(4):
        alone = sum(1 for v in f.values() if v[k])
        marginal = sum(
            1 for v in f.values() if v[k] and not any(v[:k])
        )
        survivors = n - sum(1 for v in f.values() if any(v[: k + 1]))
        want[k + 1] = (names[k], alone, marginal, survivors)
    assert got == want

    # structural invariants: marginal <= alone, survivors monotone down,
    # and stage 1 survivors equals the exact-dedup kept count
    for k in range(1, 5):
        assert got[k][2] <= got[k][1]
    surv = [got[k][3] for k in range(1, 5)]
    assert surv == sorted(surv, reverse=True)
    assert got[1][3] == len(kept_ex)
