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


def test_decode_pixels_header_only_png_is_null(payloads):
    # the sniffing fixture's PNG is an IHDR header with no IDAT — a real
    # decoder must return a NULL row for it, not pixels and not an error
    out = {r.doc_id: r.pixels for r in MM.decode_pixels(payloads, "payload", "doc_id").collect()}
    assert out[1] is None and len(out) == 6


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


# ---------------------------------------------------------------------------
# real pixel decode (stdlib PNG path; Pillow path auto-covers when installed)
# ---------------------------------------------------------------------------


def _chunk(typ: bytes, data: bytes) -> bytes:
    import binascii

    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (binascii.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _encode_png(rows, channels: int, filters=None) -> bytes:
    """Minimal valid PNG encoder (stdlib only): 8-bit, non-interlaced.
    ``rows`` is a list of rows, each a flat list of channel bytes BEFORE
    filtering; ``filters`` picks the per-row filter byte (default 0) and
    applies the matching forward filter so decoders must undo it."""
    import struct
    import zlib

    h = len(rows)
    w = len(rows[0]) // channels
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    filters = filters or [0] * h
    raw = bytearray()
    prev = [0] * (w * channels)
    for r, ftype in zip(rows, filters):
        raw.append(ftype)
        if ftype == 0:
            raw += bytes(r)
        elif ftype == 2:  # Up: store diff vs previous row
            raw += bytes((r[i] - prev[i]) & 0xFF for i in range(len(r)))
        else:
            raise ValueError("test encoder supports filters 0 and 2")
        prev = r
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_decode_pixels_rgb_roundtrip(spark):
    rows = [[10, 20, 30, 40, 50, 60], [70, 80, 90, 100, 110, 120]]  # 2x2 RGB
    png = _encode_png(rows, channels=3)
    df = spark.createDataFrame([(1, png)], "doc_id bigint, payload binary")
    out = MM.decode_pixels(df, "payload", "doc_id").collect()[0]
    assert out.shape == [2, 2, 3]
    assert out.pixels == [float(v) for r in rows for v in r]


def test_decode_pixels_up_filter_and_gray(spark):
    rows = [[5, 250, 17], [6, 249, 18], [7, 248, 19]]  # 3x3 grayscale
    png = _encode_png(rows, channels=1, filters=[0, 2, 2])
    df = spark.createDataFrame([(9, png)], "doc_id bigint, payload binary")
    out = MM.decode_pixels(df, "payload", "doc_id").collect()[0]
    assert out.shape == [3, 3, 1]
    assert out.pixels == [float(v) for r in rows for v in r]


def test_decode_pixels_undecodable_is_null_row(spark):
    df = spark.createDataFrame(
        [(1, b"not an image"), (2, JPEG)], "doc_id bigint, payload binary"
    )
    got = {r.doc_id: (r.shape, r.pixels) for r in MM.decode_pixels(df, "payload", "doc_id").collect()}
    # JPEG without Pillow -> NULL; never an exception (per-row tolerance)
    assert got[1] == (None, None)
    assert len(got) == 2


def test_png_decoder_pure_python_paeth_sub_average():
    """Exercise Sub/Average/Paeth unfiltering directly: forward-filter a
    known image by hand and check the decoder inverts it."""
    import struct
    import zlib

    rows = [[3, 9, 27, 81], [5, 25, 125, 107], [2, 4, 8, 16]]  # 4x3 gray
    w, h, ch = 4, 3, 1

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = [0] * w
    for ftype, r in zip([1, 3, 4], rows):
        raw.append(ftype)
        for i in range(w):
            a = r[i - ch] if i >= ch else 0
            up = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ftype == 1:
                raw.append((r[i] - a) & 0xFF)
            elif ftype == 3:
                raw.append((r[i] - ((a + up) >> 1)) & 0xFF)
            else:
                raw.append((r[i] - paeth(a, up, c)) & 0xFF)
        prev = r
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    px, shape = MM._png_decode_py(png)
    assert shape == [h, w, ch]
    assert px == [float(v) for r in rows for v in r]
