"""Semantics tests for the round-5e batch: Poisson-bootstrap CI,
Mann-Kendall/Sen trend (brute-force cross-check), RFM segmentation,
centroid silhouette, Flesch readability (pure-Python regex replica)."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from datafusion_functions_extra_spark import suite
from datafusion_functions_extra_spark.operators.clustering import kmeans_assign

SF_DIR = "/root/testdata/sf0.001"


def test_bootstrap_ci_brackets_mean_and_weights_are_poisson(spark):
    r = suite.QUERIES["orders_bootstrap_ci"](spark, SF_DIR).collect()[0]
    assert r.n_replicas == 64
    assert r.ci_lo < r.mean_price < r.ci_hi
    assert r.ci_lo < r.ci_hi
    # weight distribution sanity straight off the suite's inverse CDF
    # (12-bit integer lanes, the lane-packed rewrite's draw)
    df = spark.range(10000).select(
        suite._boot_weight(
            F.pmod(F.hash(F.col("id").cast("string")), F.lit(4096))
        ).alias("w")
    )
    stats = df.agg(F.avg("w").alias("m"), F.max("w").alias("mx")).collect()[0]
    assert 0.9 < stats.m < 1.1  # Poisson(1) mean
    assert stats.mx <= 8


def test_mann_kendall_matches_bruteforce(spark):
    rows = {
        r.event_type: r
        for r in suite.QUERIES["events_mann_kendall_sen"](spark, SF_DIR).collect()
    }
    from datafusion_functions_extra_spark.sources.catalog import load_table

    e = load_table(spark, SF_DIR, "events")
    us = F.unix_micros("ts")
    day = ((us - F.pmod(us, F.lit(86400000000))) / F.lit(86400000000)).cast(
        "long"
    )
    daily = (
        e.select("event_type", day.alias("d"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in daily:
        by_type.setdefault(r.event_type, []).append((r.d, r.c))
    for t, pts in by_type.items():
        pts.sort()
        n = len(pts)
        s = 0
        slopes = []
        for i in range(n):
            for j in range(i + 1, n):
                (da, ca), (db, cb) = pts[i], pts[j]
                s += (cb > ca) - (cb < ca)
                slopes.append(((cb - ca) / (db - da), da, db))
        ties: dict[int, int] = {}
        for _, c in pts:
            ties[c] = ties.get(c, 0) + 1
        tie_term = sum(v * (v - 1) * (2 * v + 5) for v in ties.values())
        var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        if var <= 0 or s == 0:
            z = 0.0
        else:
            z = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var)
        slopes.sort()
        sen = slopes[(len(slopes) - 1) // 2][0]
        got = rows[t]
        assert got.n_days == n
        assert got.s_stat == s
        assert abs(got.var_s - var) < 1e-4
        assert abs(got.z_stat - z) < 1e-5
        assert got.sen_slope == sen


def test_rfm_segments_partition_purchasers(spark):
    rows = suite.QUERIES["users_rfm_segments"](spark, SF_DIR).collect()
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_purchasers = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) == n_purchasers
    for r in rows:
        assert 1 <= r.r_code <= 4 and 1 <= r.f_code <= 4 and 1 <= r.m_code <= 4


def test_silhouette_consistent_with_kmeans_assignment(spark):
    sil = {
        r.cluster: r
        for r in suite.QUERIES["embedding_kmeans_silhouette"](spark, SF_DIR).collect()
    }
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    counts = {
        r.cluster: r.n
        for r in kmeans_assign(emb)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {c: r.n_vecs for c, r in sil.items()} == counts
    assert sum(r.n_vecs for r in sil.values()) == emb.count()
    for r in sil.values():
        assert -1.0 - 1e-9 <= r.mean_silhouette <= 1.0 + 1e-9


def test_flesch_matches_python_regex_replica(spark):
    rows = sorted(
        suite.QUERIES["docs_flesch_scores"](spark, SF_DIR).collect(),
        key=lambda r: r.doc_id,
    )[:25]
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("doc_id") < 25)
        .collect()
    }
    for r in rows:
        text = docs[r.doc_id]
        norm = re.sub(r"\s+", " ", text).strip().lower()
        w = len(norm.split(" "))
        s = max(1, len(re.sub(r"[^.]", "", re.sub(r"[.!?]+", ".", text))))
        y = max(1, len(re.sub(r"[^a]", "", re.sub(r"[aeiouy]+", "a", norm))))
        assert r.n_words == w
        assert r.n_sentences == s
        assert r.n_syllables == y
        flesch = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        assert abs(r.flesch - flesch) < 1e-5
