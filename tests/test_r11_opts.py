"""Round-11 optimization pins.

Each test locks an r11 plan/algorithm change to the semantics it
replaced, so a future edit that drifts the optimized form fails loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


# uses the session-scoped ``spark`` fixture from conftest.py — a
# module-local get_spark(...).getOrCreate() would RETURN the shared
# session and its teardown stop() would kill it for every later module


def test_oph_inrow_matches_relational_form(spark):
    """The r11 in-row OPH signature (bin mins + cyclic coalesce fill +
    null-bin count in one projection) must be row-for-row identical to
    the r10 relational plan it replaced (shingle explode -> (id, bin)
    min aggregate -> doubled-grid forward-fill window -> collect)."""
    from datafusion_functions_extra_spark.operators import similarity as SIM
    from datafusion_functions_extra_spark.sources import load_table
    from datafusion_functions_extra_spark.suite import _OPH_BINS as B
    from datafusion_functions_extra_spark.suite import _OPH_SHIFT

    d = load_table(spark, "/root/testdata/sf0.001", "documents")

    # --- old relational form (verbatim r10 shape) ---
    hb = d.select(
        F.col("doc_id").alias("id"),
        F.explode(SIM._shingles_or_whole(F.col("text"))).alias("s"),
    ).select("id", (SIM.hash60(F.col("s")) % SIM.MERSENNE_P).alias("h"))
    binmin = (
        hb.select(
            "id",
            F.pmod(F.col("h"), B).alias("bin"),
            F.shiftright(F.col("h"), _OPH_SHIFT).alias("v"),
        )
        .groupBy("id", "bin")
        .agg(F.min("v").alias("v"))
    )
    pos = spark.range(2 * B).select(F.col("id").cast("int").alias("pos"))
    grid = (
        d.select(F.col("doc_id").alias("id"))
        .crossJoin(F.broadcast(pos))
        .withColumn("bin", F.pmod(F.col("pos"), B))
    )
    wfill = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    old = (
        grid.join(binmin, ["id", "bin"], "left")
        .withColumn("fv", F.last("v", ignorenulls=True).over(wfill))
        .where(F.col("pos") >= B)
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("bin").alias("b"), F.col("fv").alias("x"))
                    )
                ),
                lambda st: st.x,
            ).alias("osig"),
            F.sum(F.col("v").isNull().cast("long")).cast("long").alias("n_empty"),
        )
    )
    old_rows = {
        r["id"]: (tuple(r["osig"]), r["n_empty"]) for r in old.collect()
    }

    # --- new in-row form, through the suite query's own builder ---
    import datafusion_functions_extra_spark.suite as suite_mod

    src = None
    # reuse the exact production expression by running the query and
    # intercepting its feats relation is intrusive; instead rebuild the
    # expression the same way the query does and compare end to end
    from datafusion_functions_extra_spark.functions.text import bind_once

    def _oph_struct(text_col):
        def with_hashes(shv):
            def with_binmin(bm):
                filled = F.array(*[
                    F.coalesce(*[
                        F.element_at(bm, ((j - k) % B) + 1) for k in range(B)
                    ])
                    for j in range(B)
                ])
                n_empty = (
                    F.lit(B) - F.size(F.filter(bm, lambda v: v.isNotNull()))
                ).cast("long")
                return F.struct(filled.alias("osig"), n_empty.alias("n_empty"))

            def with_hs(hs):
                bm = F.array(*[
                    F.array_min(
                        F.transform(
                            F.filter(hs, lambda h: F.pmod(h, F.lit(B)) == b),
                            lambda h: F.shiftright(h, _OPH_SHIFT),
                        )
                    )
                    for b in range(B)
                ])
                return bind_once(bm, with_binmin)

            return bind_once(
                F.transform(shv, lambda s: SIM.hash60(s) % SIM.MERSENNE_P),
                with_hs,
            )

        sh = F.array_distinct(SIM._shingles_or_whole(text_col))
        return bind_once(sh, with_hashes)

    new = d.select(
        F.col("doc_id").alias("id"), _oph_struct(F.col("text")).alias("f")
    ).select("id", "f.osig", "f.n_empty")
    new_rows = {
        r["id"]: (tuple(r["osig"]), r["n_empty"]) for r in new.collect()
    }
    assert new_rows == old_rows
    assert len(new_rows) == d.count()


def test_components_loop_restores_session_confs(spark):
    """components_from_pairs flips AQE/shuffle-partition confs for its
    loop scope; they must be restored even on the happy path."""
    from datafusion_functions_extra_spark.operators.similarity import (
        components_from_pairs,
    )

    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    nodes = spark.range(6).select(F.col("id"))
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id_a long, id_b long"
    )
    out = {
        (r["id"], r["component"])
        for r in components_from_pairs(nodes, pairs).collect()
    }
    assert out == {(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 5)}
    assert spark.conf.get("spark.sql.adaptive.enabled") == prev_aqe
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_parts


def test_components_loop_compress_matches_plain(spark):
    """Pointer-doubling (compress) and plain min-label propagation must
    land on identical component labels — the r11 chg-column fusion has
    to preserve convergence detection in both modes."""
    from datafusion_functions_extra_spark.operators.similarity import (
        components_from_pairs,
    )

    # a 12-node path graph: worst case for plain propagation depth
    nodes = spark.range(12).select(F.col("id"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    plain = {
        (r["id"], r["component"])
        for r in components_from_pairs(nodes, pairs, max_iters=20).collect()
    }
    comp = {
        (r["id"], r["component"])
        for r in components_from_pairs(
            nodes, pairs, max_iters=20, compress=True
        ).collect()
    }
    assert plain == comp == {(i, 0) for i in range(12)}


def test_cached_parquet_schema_is_metadata_only(spark):
    """The schema memo must return the same StructType as bare inference
    and key on file identity."""
    from datafusion_functions_extra_spark.sources.catalog import (
        _SCHEMA_CACHE,
        cached_parquet_schema,
    )

    path = "/root/testdata/sf0.001/orders.parquet"
    bare = spark.read.parquet(path).schema
    memo = cached_parquet_schema(spark, path)
    assert memo == bare
    import os

    st = os.stat(path)
    assert (path, st.st_mtime_ns, st.st_size) in _SCHEMA_CACHE
    # second call hits the memo (same object)
    assert cached_parquet_schema(spark, path) is memo


def test_drain_partitions_derivation():
    """Pin the streaming drain's partition rule (VERDICT r10 item 9 /
    r11 state-heavy extension): bytes-derived with a 32x-parallelism
    cap, floored at the parallelism for Python-stateful plans and for
    declared state-heavy sketch aggregations."""
    from datafusion_functions_extra_spark.streaming.events import (
        _drain_partitions,
    )

    MB = 1024 * 1024
    # bytes rule: 8 MiB per partition, min 1
    assert _drain_partitions(2 * MB, 32, part_bytes=8 * MB) == 1
    assert _drain_partitions(64 * MB, 32, part_bytes=8 * MB) == 8
    # cap at 32x parallelism
    assert _drain_partitions(10**15, 4, part_bytes=8 * MB) == 128
    # Python-stateful and state-heavy plans floor at the parallelism
    assert _drain_partitions(2 * MB, 32, python_stateful=True, part_bytes=8 * MB) == 32
    assert _drain_partitions(2 * MB, 32, state_heavy=True, part_bytes=8 * MB) == 32
    # floors never LOWER a bytes-derived count
    assert _drain_partitions(640 * MB, 4, state_heavy=True, part_bytes=8 * MB) == 80


def test_declare_stream_input_accumulates(spark):
    """Two reader declarations before one drain must size state from the
    SUM of both sources (ADVICE r10 item 2)."""
    import os

    from datafusion_functions_extra_spark.streaming.events import (
        _STREAM_INPUT_BYTES_KEY,
        declare_stream_input,
    )

    p1 = "/root/testdata/sf0.001/events.parquet"
    p2 = "/root/testdata/sf0.001/documents.parquet"
    spark.conf.unset(_STREAM_INPUT_BYTES_KEY)
    declare_stream_input(spark, p1)
    declare_stream_input(spark, p2)
    declared = int(spark.conf.get(_STREAM_INPUT_BYTES_KEY))
    assert declared == os.path.getsize(p1) + os.path.getsize(p2)
    spark.conf.unset(_STREAM_INPUT_BYTES_KEY)


def test_cdc_and_histogram_workers_drop_null_payloads(spark):
    """NULL payloads must contribute no rows — the JVM hex(NULL)->explode
    path's semantics (ADVICE r10 item 1)."""
    from datafusion_functions_extra_spark.functions.multimodal import (
        byte_histogram_np,
        cdc_chunks_np,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"hello world payload bytes")), (2, None)],
        "doc_id long, payload binary",
    )
    chunks = cdc_chunks_np(df, "payload", "doc_id").collect()
    assert chunks and {r["id"] for r in chunks} == {1}
    hist = byte_histogram_np(df, "payload", "doc_id").collect()
    assert hist and {r["doc_id"] for r in hist} == {1}


def test_synth_wav_twin_rejects_negative_ids():
    """The NumPy synth twin only matches the JVM remainder semantics for
    non-negative doc ids; a negative id must fail loudly, not diverge
    silently (ADVICE r10 item 5)."""
    from datafusion_functions_extra_spark.functions.audio_np import (
        _synth_wav_bytes,
    )

    _synth_wav_bytes(7, 1)  # non-negative: fine
    with pytest.raises(AssertionError):
        _synth_wav_bytes(-1, 1)


def test_knn_shapley_nn_literal_matches_per_vec_count(spark):
    """embedding_knn_shapley derives nn = count(embeddings) - 1 from the
    construction of the unfiltered all-ordered-pairs relation; if that
    shared relation is ever thinned the literal goes stale (ADVICE r10
    item 4) — pin the invariant on a small sf."""
    from datafusion_functions_extra_spark.sources import load_table
    from datafusion_functions_extra_spark.suite import _knn_scored_sym

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    n = emb.count()
    scored = _knn_scored_sym(spark, sf)
    per_vec = (
        scored.groupBy("vec_id").count().select("count").distinct().collect()
    )
    assert [r["count"] for r in per_vec] == [n - 1]
