"""Round-10 optimization tests: the Arrow-batched NumPy twins of the JVM
byte pipelines (WAV round trip, CDC chunking, byte histograms) must
produce row-identical output — every quantity is integer or md5, so any
mismatch is a logic bug, not float drift.

Each test computes the SAME relation through the old JVM expression path
and the new ``mapInPandas`` path on real doc_ids and asserts set
equality of full rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_functions_extra_spark.functions import audio as AUD
from datafusion_functions_extra_spark.functions import audio_np as ANP
from datafusion_functions_extra_spark.functions import multimodal as MM
from datafusion_functions_extra_spark.functions.text import bind_once


@pytest.fixture(scope="module")
def spark():
    from datafusion_functions_extra_spark.sources import get_spark

    s = get_spark("test-r10-arrow-np", cpus=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


#: ids exercising every modulus class the waveform/payload depends on
#: (doc_id % 3 rate, % 4 container, % 7 remaster pick, % 13 slope,
#: % 200 length) plus the large-id clone offset range
_IDS = [0, 1, 2, 3, 6, 7, 13, 25, 48, 49, 50, 199, 200, 201, 777, 4999]


def _ids_df(spark):
    return spark.createDataFrame(
        [(i,) for i in _IDS], "doc_id bigint"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_wav_fingerprints_match_jvm(spark):
    d = _ids_df(spark)
    for scale in (8, 4):

        def fingerprint(h):
            meta = AUD.wav_meta(h)
            n = F.shiftrightunsigned(meta["data_bytes"], 1)
            signs = F.array_join(
                F.transform(
                    AUD.wav_samples(h, n),
                    lambda x: F.when(x >= 0, F.lit("1")).otherwise(
                        F.lit("0")
                    ),
                ),
                "",
            )
            return F.struct(
                n.alias("n_samples"),
                F.md5(
                    F.concat(
                        n.cast("string"), F.lit(":"), signs
                    ).cast("binary")
                ).alias("fp"),
            )

        jvm = d.select(
            "doc_id",
            bind_once(
                F.hex(AUD.synth_wav(F.col("doc_id"), scale=scale)),
                fingerprint,
            ).alias("m"),
        ).select("doc_id", "m.n_samples", "m.fp")
        assert _rows(jvm) == _rows(ANP.wav_fingerprints(d, "doc_id", scale))


def test_wav_stats_match_jvm(spark):
    d = _ids_df(spark)

    def stats(h):
        meta = AUD.wav_meta(h)
        n = F.shiftrightunsigned(meta["data_bytes"], 1)

        def fold(smp):
            heads = F.slice(smp, 1, (n - 1).cast("int"))
            tails = F.slice(smp, 2, (n - 1).cast("int"))
            return F.struct(
                F.array_max(F.transform(smp, F.abs)).alias("peak_abs"),
                F.aggregate(
                    smp, F.lit(0).cast("long"), lambda a, x: a + x * x
                ).alias("energy"),
                F.aggregate(
                    F.zip_with(
                        heads,
                        tails,
                        lambda a, b: F.when(
                            (a >= 0) != (b >= 0), F.lit(1)
                        ).otherwise(F.lit(0)),
                    ),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x,
                ).alias("zero_crossings"),
            )

        return F.struct(
            meta["n_channels"].alias("n_channels"),
            meta["sample_rate"].alias("sample_rate"),
            meta["bits_per_sample"].alias("bits_per_sample"),
            n.alias("n_samples"),
            meta["data_bytes"].alias("data_bytes"),
            bind_once(AUD.wav_samples(h, n), fold).alias("st"),
        )

    ref = (
        _ids_df(spark)
        .select(
            "doc_id",
            bind_once(F.hex(AUD.synth_wav(F.col("doc_id"))), stats).alias(
                "m"
            ),
        )
        .select(
            "doc_id",
            "m.n_channels",
            "m.sample_rate",
            "m.bits_per_sample",
            "m.n_samples",
            "m.data_bytes",
            "m.st.peak_abs",
            "m.st.energy",
            "m.st.zero_crossings",
        )
    )
    assert _rows(ref) == _rows(ANP.wav_stats(d, "doc_id"))


def test_silence_segments_match_jvm(spark):
    """Pin against the suite's own silence query on a tiny parquet dir —
    the simplest faithful JVM reference is the query itself."""
    from datafusion_functions_extra_spark import suite

    got = suite.QUERIES["audio_silence_segments"](
        spark, "/root/testdata/sf0.001"
    )
    quiet_abs = 2048
    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id")
    )
    ref = ANP.silence_segments(d, quiet_abs, "doc_id")
    assert _rows(got) == _rows(ref)


def test_dft_twiddle_sums_match_jvm(spark):
    from datafusion_functions_extra_spark.suite import (
        _AUDIO_DFT_WINDOW,
        _PGRAM_PERIODS,
        _twiddle,
    )

    d = _ids_df(spark)

    def clip(h):
        n = F.shiftrightunsigned(AUD.wav_meta(h)["data_bytes"], 1)
        return AUD.wav_samples(h, F.least(n, F.lit(_AUDIO_DFT_WINDOW)))

    base = d.select(
        "doc_id",
        bind_once(F.hex(AUD.synth_wav(F.col("doc_id"))), clip).alias("smp"),
    )
    ex48 = base.select("doc_id", F.posexplode("smp").alias("k0", "s"))
    aggs = []
    for pp in _PGRAM_PERIODS:
        for kind, alias in (("cos", f"sc_{pp}"), ("sin", f"ss_{pp}")):
            tab = F.array(*[F.lit(v) for v in _twiddle(pp, kind)])
            aggs.append(
                F.sum(
                    F.col("s")
                    * F.element_at(tab, (F.col("k0") % pp + 1).cast("int"))
                )
                .cast("long")
                .alias(alias)
            )
    ref = ex48.groupBy("doc_id").agg(*aggs)
    got = ANP.dft_twiddle_sums(
        d, _PGRAM_PERIODS, _twiddle, _AUDIO_DFT_WINDOW, "doc_id"
    )
    assert _rows(ref) == _rows(got)


def _payloads_df(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return d.select(
        "doc_id",
        MM.synth_payload(
            F.col("doc_id"), F.col("n_chars"), F.col("text")
        ).alias("payload"),
    ).withColumn("mime", MM.sniff_mime(F.col("payload")))


def test_cdc_chunks_np_matches_jvm(spark):
    p = _payloads_df(spark)
    jvm = MM.cdc_chunks(p, "payload", "doc_id", keep_cols=("mime",))
    got = MM.cdc_chunks_np(p, "payload", "doc_id", keep_cols=("mime",))
    assert _rows(jvm) == _rows(got)


def test_cdc_chunks_np_short_payloads(spark):
    """Payloads shorter than the window form one whole-payload chunk."""
    rows = [(1, bytearray(b"abc")), (2, bytearray(b"\x00" * 7)),
            (3, bytearray(b"x" * 8)), (4, bytearray(b"0123456789abcdef"))]
    p = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    jvm = MM.cdc_chunks(p, "payload", "doc_id")
    got = MM.cdc_chunks_np(p, "payload", "doc_id")
    assert _rows(jvm) == _rows(got)


def test_byte_histogram_np_matches_jvm(spark):
    p = _payloads_df(spark)
    hx = p.select(
        "doc_id",
        "mime",
        F.hex(F.col("payload")).alias("h"),
        MM.payload_size(F.col("payload")).cast("long").alias("n"),
    )
    jvm = (
        hx.select(
            "doc_id",
            "mime",
            "n",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n").cast("int")),
                    lambda i: F.conv(
                        F.substring(F.col("h"), i * 2 - 1, 2), 16, 10
                    ).cast("long"),
                )
            ).alias("b"),
        )
        .groupBy("doc_id", "mime", "n", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    got = MM.byte_histogram_np(p, "payload", "doc_id", keep_cols=("mime",))
    assert _rows(jvm) == _rows(got)
