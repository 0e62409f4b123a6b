"""multimodal operator tests: magic-byte sniffing, PNG header parsing,
base64 bridging, and the mapInPandas decode plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_functions_extra_spark.functions import multimodal as MM

PNG = bytes.fromhex("89504E470D0A1A0A0000000D49484452") + (320).to_bytes(
    4, "big"
) + (240).to_bytes(4, "big") + bytes.fromhex("0806000000") + b"body"
JPEG = bytes.fromhex("FFD8FFE0") + b"body"
GIF = b"GIF89a" + b"body"
WAV = b"RIFF\x00\x00\x00\x00WAVE" + b"body"
MP4 = b"\x00\x00\x00\x18ftypisom" + b"body"
RAW = b"plain bytes"


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [(1, PNG), (2, JPEG), (3, GIF), (4, WAV), (5, MP4), (6, RAW)]
    return spark.createDataFrame(rows, "doc_id bigint, payload binary")


def test_sniff_mime(payloads):
    got = {r.doc_id: r.m for r in payloads.select("doc_id", MM.sniff_mime(F.col("payload")).alias("m")).collect()}
    assert got == {
        1: "image/png",
        2: "image/jpeg",
        3: "image/gif",
        4: "audio/wav",
        5: "video/mp4",
        6: "application/octet-stream",
    }


def test_wav_requires_riff(spark):
    # 'WAVE' at offset 9 without the RIFF container is not a wav
    fake = b"XXXX\x00\x00\x00\x00WAVE"
    df = spark.createDataFrame([(1, fake)], "doc_id bigint, payload binary")
    assert df.select(MM.sniff_mime(F.col("payload"))).collect()[0][0] == "application/octet-stream"


def test_png_dims(payloads):
    r = (
        payloads.where("doc_id = 1")
        .select(MM.png_width(F.col("payload")).alias("w"), MM.png_height(F.col("payload")).alias("h"))
        .collect()[0]
    )
    assert (r.w, r.h) == (320, 240)


def test_base64_roundtrip(payloads):
    rows = payloads.select(
        "payload", MM.from_base64(MM.to_base64(F.col("payload"))).alias("back")
    ).collect()
    for r in rows:
        assert bytes(r.payload) == bytes(r.back)


def test_synth_payload_is_sniffable(spark):
    df = spark.createDataFrame(
        [(0, 100, "png doc"), (1, 50, "jpeg doc"), (2, 30, "wav doc"), (3, 10, "raw doc")],
        "doc_id bigint, n_chars bigint, text string",
    )
    p = df.select(
        "doc_id",
        MM.synth_payload(F.col("doc_id"), F.col("n_chars"), F.col("text")).alias("payload"),
    )
    got = {r.doc_id: r.m for r in p.select("doc_id", MM.sniff_mime(F.col("payload")).alias("m")).collect()}
    assert got == {0: "image/png", 1: "image/jpeg", 2: "audio/wav", 3: "application/octet-stream"}
    dims = p.where("doc_id = 0").select(
        MM.png_width(F.col("payload")).alias("w"), MM.png_height(F.col("payload")).alias("h")
    ).collect()[0]
    assert (dims.w, dims.h) == (101, 1)


def test_decode_meta_matches_jvm(payloads):
    meta = {r.doc_id: r for r in MM.decode_meta(payloads, "payload", "doc_id").collect()}
    assert meta[1].mime == "image/png" and (meta[1].width, meta[1].height) == (320, 240)
    assert meta[2].mime == "image/jpeg" and meta[2].width is None
    assert meta[6].mime == "application/octet-stream"
    assert meta[4].n_bytes == len(WAV)


def test_decode_pixels_is_explicit_stub(payloads):
    with pytest.raises(NotImplementedError, match="PIL"):
        MM.decode_pixels(payloads, "payload", "doc_id")


def test_frame_sample_offsets_and_hashes(spark):
    import hashlib

    from datafusion_functions_extra_spark.functions.multimodal import (
        FRAME_BYTES,
        FRAME_STRIDE,
        MAX_FRAMES,
        frame_sample,
    )

    payload = bytes(range(256))
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(payload[:16]))],
        "doc_id long, payload binary",
    )
    rows = sorted(
        frame_sample(df, "payload", "doc_id").collect(),
        key=lambda r: (r.doc_id, r.frame_idx),
    )
    # doc 2 (16 bytes) yields no full 32-byte frame
    assert {r.doc_id for r in rows} == {1}
    assert [r.frame_idx for r in rows] == list(range(MAX_FRAMES))
    for r in rows:
        off = r.frame_idx * FRAME_STRIDE
        assert r.byte_offset == off
        want = hashlib.md5(
            payload[off : off + FRAME_BYTES].hex().upper().encode()
        ).hexdigest()
        assert r.frame_md5 == want
