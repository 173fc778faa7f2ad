"""Multimodal binary columns: schema plumbing, map-side stats, Arrow UDFs."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.multimodal.binary_ops import (
    attach_media,
    decode_image_batches,
    extract_features,
    media_stats,
)


def _docs(spark):
    return spark.createDataFrame(
        [(0, "hello world"), (1, "spark engine"), (2, "x" * 1000)],
        "doc_id long, text string",
    )


def test_attach_media_schema(spark):
    df = attach_media(_docs(spark))
    assert dict(df.dtypes)["content"] == "binary"
    meta = [f for f in df.schema["media_meta"].dataType.fields]
    assert [f.name for f in meta] == ["mime", "width", "height", "n_bytes"]
    row = df.where("doc_id = 0").collect()[0]
    assert row.media_meta.n_bytes == len("hello world")


def test_media_stats_sha256(spark):
    got = {r.doc_id: r for r in media_stats(attach_media(_docs(spark))).collect()}
    assert got[0].sha256 == hashlib.sha256(b"hello world").hexdigest()
    assert got[2].n_bytes == 1000


def test_decode_image_batches_deterministic_fake(spark):
    df = attach_media(_docs(spark))
    got = {r.doc_id: r for r in decode_image_batches(df, fake=True).collect()}
    assert got[0].n_pixels == got[0].width * got[0].height
    # deterministic: same input → same output
    again = {r.doc_id: r for r in decode_image_batches(df, fake=True).collect()}
    assert {k: (v.width, v.height) for k, v in got.items()} == {
        k: (v.width, v.height) for k, v in again.items()
    }


def test_resize_images_fixed_dims(spark):
    from batch_processing_pipeline_spark.multimodal.binary_ops import resize_images

    df = attach_media(_docs(spark))
    rows = resize_images(df, 8, 4, fake=True).collect()
    for r in rows:
        assert (r.width, r.height) == (8, 4)
        assert len(r.content) == 32


def test_sample_frames_fanout(spark):
    from batch_processing_pipeline_spark.multimodal.binary_ops import sample_frames

    df = attach_media(_docs(spark))
    rows = sample_frames(df, n_frames=4, fake=True).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_doc.values())
    # deterministic fake
    again = sample_frames(df, n_frames=4, fake=True).collect()
    assert sorted((r.doc_id, r.frame_idx, bytes(r.frame)) for r in rows) == sorted(
        (r.doc_id, r.frame_idx, bytes(r.frame)) for r in again
    )


def test_extract_features_shape_and_norm(spark):
    df = attach_media(_docs(spark))
    rows = extract_features(df, dim=8).collect()
    for r in rows:
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-5


# ----------------------------------------------------- real stdlib codecs
def _fwd_filter(ftype, line, prev, bpp):
    """Reference forward PNG filter (test-side) to craft non-zero-filter
    scanlines the decoder must undo byte-exactly."""
    out = bytearray()
    for i, x in enumerate(line):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out.append(x)
        elif ftype == 1:
            out.append((x - a) & 0xFF)
        elif ftype == 2:
            out.append((x - b) & 0xFF)
        elif ftype == 3:
            out.append((x - (a + b) // 2) & 0xFF)
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((x - pred) & 0xFF)
    return bytes(out)


def test_png_roundtrip_byte_exact():
    from batch_processing_pipeline_spark.multimodal.codecs import (
        decode_png,
        encode_png,
    )

    w, h = 5, 3
    pixels = bytes(range(w * h * 3))  # RGB
    data = encode_png(w, h, pixels, color_type=2)
    gw, gh, ch, got = decode_png(data)
    assert (gw, gh, ch) == (5, 3, 3)
    assert got == pixels


def test_png_decode_all_filter_types():
    import struct
    import zlib

    from batch_processing_pipeline_spark.multimodal.codecs import decode_png

    w, h, ch = 4, 5, 3
    stride = w * ch
    pixels = bytes((i * 37 + 11) % 256 for i in range(w * h * ch))
    rows = [pixels[y * stride : (y + 1) * stride] for y in range(h)]
    raw = bytearray()
    prev = bytes(stride)
    for y, row in enumerate(rows):
        ftype = y % 5  # exercise None, Sub, Up, Average, Paeth
        raw.append(ftype)
        raw.extend(_fwd_filter(ftype, row, prev, ch))
        prev = row
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    gw, gh, gch, got = decode_png(data)
    assert (gw, gh, gch) == (w, h, ch)
    assert got == pixels


def test_png_corrupt_crc_rejected():
    import pytest

    from batch_processing_pipeline_spark.multimodal.codecs import (
        MediaFormatError,
        decode_png,
        encode_png,
    )

    data = bytearray(encode_png(2, 2, bytes(12), color_type=2))
    data[20] ^= 0xFF  # flip a byte inside IHDR payload
    with pytest.raises(MediaFormatError):
        decode_png(bytes(data))


def test_wav_roundtrip_byte_exact():
    from batch_processing_pipeline_spark.multimodal.codecs import (
        decode_wav,
        encode_wav,
    )

    pcm = bytes(range(64)) * 2  # 64 int16 samples (little-endian pairs)
    data = encode_wav(pcm, sample_rate=8000, channels=1, bits=16)
    rate, channels, bits, got = decode_wav(data)
    assert (rate, channels, bits) == (8000, 1, 16)
    assert got == pcm


def test_decode_image_batches_real_png(spark):
    from batch_processing_pipeline_spark.multimodal.binary_ops import (
        decode_image_batches,
        synthesize_png,
    )

    d = _docs(spark)
    got = {r.doc_id: r for r in decode_image_batches(synthesize_png(d), fake=False).collect()}
    # "hello world" has 11 chars -> width 11%13+1=12, height 11%7+1=5
    assert (got[0].width, got[0].height, got[0].n_pixels) == (12, 5, 60)
    # 1000 chars -> width 1000%13+1=13, height 1000%7+1=7
    assert (got[2].width, got[2].height, got[2].n_pixels) == (13, 7, 91)


def test_resize_images_real_nearest_neighbor(spark):
    from batch_processing_pipeline_spark.multimodal.codecs import (
        decode_png,
        encode_png,
    )
    from batch_processing_pipeline_spark.multimodal.binary_ops import resize_images

    # 4x4 grayscale with distinct values; 2x2 nearest-neighbor takes the
    # top-left pixel of each 2x2 block: values 0, 2, 8, 10
    px = bytes(range(16))
    payload = encode_png(4, 4, px, color_type=0)
    df = spark.createDataFrame([(1, payload)], "doc_id long, content binary")
    row = resize_images(df, 2, 2, fake=False).collect()[0]
    gw, gh, ch, got = decode_png(bytes(row.content))
    assert (gw, gh, ch) == (2, 2, 1)
    assert got == bytes([0, 2, 8, 10])


def test_sample_frames_real_wav(spark):
    from batch_processing_pipeline_spark.multimodal.codecs import encode_wav
    from batch_processing_pipeline_spark.multimodal.binary_ops import sample_frames

    # 8 int16 mono samples -> 2 frames of 4 whole samples each
    pcm = bytes(range(16))
    df = spark.createDataFrame(
        [(1, encode_wav(pcm, 8000, 1, 16))], "doc_id long, content binary"
    )
    rows = sorted(sample_frames(df, n_frames=2, fake=False).collect(), key=lambda r: r.frame_idx)
    assert bytes(rows[0].frame) == pcm[:8]
    assert bytes(rows[1].frame) == pcm[8:]


def test_extract_features_real_decodes_pixels(spark):
    from batch_processing_pipeline_spark.multimodal.codecs import encode_png
    from batch_processing_pipeline_spark.multimodal.binary_ops import extract_features

    # all-zero pixels: decoded histogram must put ALL mass in bucket 0,
    # while the raw container bytes (header, zlib) would not
    payload = encode_png(4, 4, bytes(16), color_type=0)
    df = spark.createDataFrame([(1, payload)], "doc_id long, content binary")
    feat = extract_features(df, dim=4, fake=False).collect()[0].feature
    assert feat[0] == 1.0 and sum(feat[1:]) == 0.0


def test_png_roundtrip_property():
    """Property: encode→decode is identity for any dims/color type."""
    from hypothesis import given, settings, strategies as st

    from batch_processing_pipeline_spark.multimodal.codecs import (
        _CHANNELS,
        decode_png,
        encode_png,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=12),
        h=st.integers(min_value=1, max_value=12),
        ct=st.sampled_from([0, 2, 4, 6]),
        data=st.data(),
    )
    def check(w, h, ct, data):
        n = w * h * _CHANNELS[ct]
        px = bytes(
            data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
        )
        gw, gh, gch, got = decode_png(encode_png(w, h, px, ct))
        assert (gw, gh, gch) == (w, h, _CHANNELS[ct])
        assert got == px

    check()
