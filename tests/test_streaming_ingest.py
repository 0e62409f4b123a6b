"""Streaming ingest-time near-dup dedup: planted multi-batch scenario —
clones and near-dups of earlier batches are dropped, fresh content kept,
and the signature stage grows only by survivors."""

from __future__ import annotations

import os

import pytest

from datafusion_functions_extra_spark.streaming.ingest import (
    ingest_dedup_batch,
    streaming_ingest_dedup,
)

A = "the quick brown fox jumps over the lazy dog and runs far away today"
A_NEAR = "the quick brown fox jumps over the lazy dog and runs far away tonight"
B = "completely different content about spark aggregation engines and shuffles"
C = "fresh material concerning distributed joins sampling sketches and windows"


def _write_batch(spark, path: str, rows, mtime: float) -> None:
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(path)
    os.utime(path, (mtime, mtime))
    for e in os.listdir(path):
        os.utime(os.path.join(path, e), (mtime, mtime))


@pytest.fixture()
def paths(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "stage": str(tmp_path / "stage"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def test_batch_ingest_dedup_across_batches(spark, paths):
    b1 = spark.createDataFrame(
        [(1, A), (2, B)], "doc_id bigint, text string"
    )
    b2 = spark.createDataFrame(
        [(11, A), (12, C), (13, A_NEAR)], "doc_id bigint, text string"
    )
    for b in (b1, b2):
        ingest_dedup_batch(
            b, stage_path=paths["stage"], out_path=paths["out"]
        )
    kept = {r.doc_id for r in spark.read.parquet(paths["out"]).collect()}
    # 11 is a verbatim clone of 1; 13 near-dups 1 (and 11); 12 is fresh
    assert kept == {1, 2, 12}
    stage_ids = {
        r.doc_id for r in spark.read.parquet(paths["stage"]).collect()
    }
    assert stage_ids == kept  # stage grows only by survivors


def test_batch_ingest_intra_batch_min_id_keep(spark, paths):
    b = spark.createDataFrame(
        [(5, A), (6, A), (7, B)], "doc_id bigint, text string"
    )
    ingest_dedup_batch(b, stage_path=paths["stage"], out_path=paths["out"])
    kept = {r.doc_id for r in spark.read.parquet(paths["out"]).collect()}
    assert kept == {5, 7}  # 6 drops against its smaller-id twin


def test_streaming_ingest_matches_sequential_batches(spark, paths):
    os.makedirs(paths["src"])
    _write_batch(
        spark, os.path.join(paths["src"], "b1.parquet"), [(1, A), (2, B)], 1000.0
    )
    _write_batch(
        spark,
        os.path.join(paths["src"], "b2.parquet"),
        [(11, A), (12, C), (13, A_NEAR)],
        2000.0,
    )
    sdf = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(paths["src"])
    )
    q = streaming_ingest_dedup(
        sdf,
        stage_path=paths["stage"],
        out_path=paths["out"],
        checkpoint=paths["ckpt"],
    )
    q.awaitTermination()
    kept = {r.doc_id for r in spark.read.parquet(paths["out"]).collect()}
    # oldest-first file order: batch b1 lands first, so its ids win
    assert kept == {1, 2, 12}
    stage_ids = {
        r.doc_id for r in spark.read.parquet(paths["stage"]).collect()
    }
    assert stage_ids == kept


class TestStreamingPostings:
    """Incremental inverted index: BM25 served from the streamed postings
    stage must equal BM25 recomputed from the raw union corpus."""

    def test_staged_bm25_equals_from_raw(self, spark, paths):
        import time

        from datafusion_functions_extra_spark.functions.text import (
            bm25_topk,
            bm25_topk_from_postings,
        )
        from datafusion_functions_extra_spark.streaming.ingest import (
            streaming_postings,
        )

        batches = [
            [(1, A), (2, B)],
            [(3, C), (4, "spark joins and shuffles with spark aggregation")],
            [(5, "windows sampling sketches joins and spark engines today")],
        ]
        os.makedirs(paths["src"], exist_ok=True)
        t0 = time.time() - 100
        for i, rows in enumerate(batches):
            _write_batch(spark, f"{paths['src']}/b{i}", rows, t0 + i)

        sdf = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(paths["src"] + "/*")
        )
        q = streaming_postings(
            sdf, stage_path=paths["stage"], checkpoint=paths["ckpt"]
        )
        q.awaitTermination(120)

        corpus = spark.createDataFrame(
            [r for b in batches for r in b], "doc_id bigint, text string"
        )
        queries = [("q1", ["spark", "joins"]), ("q2", ["lazy", "dog"])]
        expected = {
            (r.query_id, r.doc_id, r.score, r.rk)
            for r in bm25_topk(corpus, "text", "doc_id", queries, k=4).collect()
        }
        qrel = spark.createDataFrame(
            [(qid, t) for qid, ts in queries for t in ts],
            "query_id string, term string",
        )
        staged = {
            (r.query_id, r.doc_id, r.score, r.rk)
            for r in bm25_topk_from_postings(
                spark.read.parquet(paths["stage"]), "doc_id", qrel, k=4
            ).collect()
        }
        assert staged == expected and len(staged) > 0
        # the stage holds exactly the union corpus postings, no dup rows
        stage = spark.read.parquet(paths["stage"])
        assert stage.count() == stage.select("doc_id", "term").distinct().count()
        assert set(r.doc_id for r in stage.select("doc_id").distinct().collect()) == {1, 2, 3, 4, 5}
