"""End-to-end curation pipeline over the real sf0.001 documents table:
funnel consistency, artifact presence, and leakage-safety of the final
split."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datafusion_functions_extra_spark.pipeline import CurationConfig, curate_corpus


def test_curate_corpus_end_to_end(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("source").isin("src0", "src1"))
    train = docs.where(~F.col("source").isin("src0", "src1"))
    out = str(tmp_path / "curated")
    report = curate_corpus(
        spark,
        train,
        bench,
        out,
        CurationConfig(languages=("en", "de", "fr", "es", "zh")),
    ).collect()
    stages = {r.stage: r for r in report}
    assert list(stages) == [
        "quality_language_filter",
        "exact_dedup",
        "near_dup_dedup",
        "decontamination",
        "split_and_write",
    ]
    # funnel is monotone: every stage's output feeds the next's input
    rows = list(report)
    for a, b in zip(rows, rows[1:]):
        assert b.n_in == a.n_out
        assert a.n_dropped == a.n_in - a.n_out >= 0
    assert stages["split_and_write"].n_out > 0

    curated = spark.read.parquet(os.path.join(out, "curated.parquet"))
    assert curated.count() == stages["split_and_write"].n_out
    assert set(curated.columns) >= {"doc_id", "text", "split"}
    assert {r.split for r in curated.select("split").distinct().collect()} <= {
        "train",
        "validation",
        "test",
    }
    # signature stage exists and matches the exact-dedup survivor count
    sigs = spark.read.parquet(os.path.join(out, "signatures.parquet"))
    assert sigs.count() == stages["exact_dedup"].n_out
    # no curated doc still exactly duplicates another (dedup held)
    dup = (
        curated.groupBy(F.md5(F.col("text").cast("binary")))
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_curate_corpus_snapshot_token_invalidates_stale_signatures(
    spark, tmp_path
):
    """Re-running curate_corpus against a DIFFERENT corpus with the same
    out_dir must rebuild the signature stage (content-derived snapshot
    token), not silently reuse the previous corpus's fingerprints."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cfg = CurationConfig(languages=("en", "de", "fr", "es", "zh"))
    out = str(tmp_path / "curated")

    corpus_a = docs.limit(200)
    curate_corpus(spark, corpus_a, None, out, cfg)
    sig_path = os.path.join(out, "signatures.parquet")
    n_a = spark.read.parquet(sig_path).count()
    markers_a = {f for f in os.listdir(sig_path) if f.startswith("_stage_token_")}

    # same corpus, same out_dir: the stage is REUSED (amortization holds)
    curate_corpus(spark, corpus_a, None, out, cfg)
    markers_a2 = {f for f in os.listdir(sig_path) if f.startswith("_stage_token_")}
    assert markers_a2 == markers_a

    # different corpus, same out_dir: the stage is REBUILT
    corpus_b = docs.limit(400)
    curate_corpus(spark, corpus_b, None, out, cfg)
    n_b = spark.read.parquet(sig_path).count()
    markers_b = {f for f in os.listdir(sig_path) if f.startswith("_stage_token_")}
    assert markers_b - markers_a  # a new snapshot token was written
    assert n_b != n_a  # signatures now fingerprint corpus B, not A
