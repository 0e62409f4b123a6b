"""Round-6n: streaming bottom-k uniform sample — the drained emissions'
global bottom-k must equal the batch md5-priority bottom-k exactly."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from datafusion_functions_extra_spark.streaming import run_available_now
from datafusion_functions_extra_spark.streaming.ingest import (
    streaming_bottomk_sample,
)

SF_DIR = "/root/testdata/sf0.001"
K = 16


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_streaming_bottomk_matches_batch(spark):
    docs_schema = (
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    stream = (
        spark.readStream.schema(docs_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
    )
    out = run_available_now(
        streaming_bottomk_sample(stream, "doc_id", k=K),
        output_mode="append",
    )
    emitted = [(r.priority, r.id) for r in out.collect()]

    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    want = sorted(((_h60(str(i)), i) for i in ids))[:K]

    # the exact sample = global bottom-k of the emitted superset
    got = sorted(emitted)[:K]
    assert got == want
    # emissions are a bounded superset: every emitted row entered some
    # shard's running bottom-k, so per shard at most ~k*(1+ln(n/k))
    assert len(emitted) >= K
    assert len(emitted) <= 8 * K * 8  # shards * generous entry bound
    # priorities are the shared hash60, reproducible anywhere
    assert all(p == _h60(str(i)) for p, i in emitted)
