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


# ------------------------------------------------------------------- GIF


def _lzw_compress(min_code_size: int, pixels: bytes) -> bytes:
    """REAL GIF LZW compressor (test-only): exercises the decoder's table
    growth, code-width bumps, and KwKwK path — none of which the library's
    uncompressed-construction encoder emits."""
    from batch_processing_pipeline_spark.multimodal.codecs import _BitWriter

    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    bw = _BitWriter()
    bw.write(clear, width)
    w = b""
    for px in pixels:
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        bw.write(table[w], width)
        table[wk] = next_code
        # encoder widens when the NEXT emitted code could be `next_code`
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            bw.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([px])
    if w:
        bw.write(table[w], width)
    bw.write(eoi, width)
    return bw.finish()


def test_gif_roundtrip_property():
    """Property: encode→decode is identity for any dims / frame count."""
    from hypothesis import given, settings, strategies as st

    from batch_processing_pipeline_spark.multimodal.codecs import (
        decode_gif,
        encode_gif,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=20),
        h=st.integers(min_value=1, max_value=12),
        nf=st.integers(min_value=1, max_value=4),
        data=st.data(),
    )
    def check(w, h, nf, data):
        n = w * h
        frames = [
            bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
            for _ in range(nf)
        ]
        gw, gh, got = decode_gif(encode_gif(w, h, frames))
        assert (gw, gh) == (w, h)
        assert got == frames

    check()


def test_gif_decoder_reads_real_lzw_compression():
    """The decoder must read PROPERLY compressed streams (variable code
    width, KwKwK sequences), not just the library encoder's literal-only
    construction — built with a real LZW compressor, including highly
    repetitive input that triggers the KwKwK case and deep table growth."""
    import struct

    from batch_processing_pipeline_spark.multimodal.codecs import (
        _gif_subblocks,
        decode_gif,
    )

    w, h = 100, 60
    # aaaa… runs force KwKwK immediately; the mixed tail grows the table
    pixels = bytes([0] * 3000 + [i % 7 for i in range(1500)] + [255] * 1500)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += bytes(v for g in range(256) for v in (g, g, g))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(8)
    out += _gif_subblocks(_lzw_compress(8, pixels))
    out += b"\x3b"
    gw, gh, frames = decode_gif(bytes(out))
    assert (gw, gh) == (w, h)
    assert frames == [pixels]


def test_gif_subrect_frames_composite_onto_canvas():
    """Frame 2 covers only a sub-rectangle: the decoded second canvas is
    frame 1 with the rect patched (GIF frame composition)."""
    import struct

    from batch_processing_pipeline_spark.multimodal.codecs import (
        _BitWriter,
        _gif_subblocks,
        decode_gif,
        encode_gif,
    )

    base = bytes(range(16))  # 4×4, values 0..15
    g = bytearray(encode_gif(4, 4, [base]))
    assert g[-1] == 0x3B
    del g[-1]
    # append a 2×2 patch of value 99 at (left=1, top=1)
    patch = bytes([99, 99, 99, 99])
    g += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)
    g.append(8)
    bw = _BitWriter()
    bw.write(256, 9)
    for px in patch:
        bw.write(px, 9)
    bw.write(257, 9)
    g += _gif_subblocks(bw.finish())
    g += b"\x3b"
    _, _, frames = decode_gif(bytes(g))
    assert frames[0] == base
    expect = bytearray(base)
    for (r, c) in [(1, 1), (1, 2), (2, 1), (2, 2)]:
        expect[r * 4 + c] = 99
    assert frames[1] == bytes(expect)


def test_sample_frames_decodes_gif_for_real(spark):
    from batch_processing_pipeline_spark.multimodal.codecs import encode_gif
    from batch_processing_pipeline_spark.multimodal.binary_ops import sample_frames

    # 3 distinguishable frames; sampling 6 evenly spaced → indices 0,0,1,1,2,2
    frames = [bytes([v]) * 6 for v in (10, 20, 30)]
    payload = encode_gif(3, 2, frames)
    df = spark.createDataFrame([(7, payload)], "doc_id long, content binary")
    got = sorted(
        (r.frame_idx, bytes(r.frame)) for r in sample_frames(df, n_frames=6).collect()
    )
    assert [b for _, b in got] == [frames[i] for i in (0, 0, 1, 1, 2, 2)]


def test_sample_frames_custom_decoder_hook(spark):
    """A picklable decoder callable extends frame sampling to containers
    the stdlib codecs don't know — the av/ffmpeg slot, exercised
    end-to-end through mapInPandas with a dependency-free fake codec."""
    from batch_processing_pipeline_spark.multimodal.binary_ops import sample_frames

    # fake "video container": magic + \x1f-separated frames
    frames = [b"frame-a", b"frame-bb", b"frame-ccc"]
    payload = b"FAKEVID\x00" + b"\x1f".join(frames)
    df = spark.createDataFrame([(1, payload)], "doc_id long, content binary")

    def fake_video_decoder(data: bytes) -> list[bytes]:
        assert data.startswith(b"FAKEVID\x00")
        return data[8:].split(b"\x1f")

    got = sorted(
        (r.frame_idx, bytes(r.frame))
        for r in sample_frames(df, n_frames=3, decoder=fake_video_decoder).collect()
    )
    assert [b for _, b in got] == frames


def test_sample_frames_unknown_container_still_loud(spark):
    """Without a decoder, an unrecognized container must raise — silent
    empty output would read as 'decoded fine, zero frames'."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from batch_processing_pipeline_spark.multimodal.binary_ops import sample_frames

    df = spark.createDataFrame([(1, b"\x00\x00mp4junk")], "doc_id long, content binary")
    with pytest.raises(PythonException, match="NotImplementedError"):
        sample_frames(df, n_frames=2).collect()


def test_avi_codec_roundtrip_and_rejections(spark):
    """Uncompressed-DIB AVI: encode→decode is identity (incl. row padding
    at widths not divisible by 4 and bottom-up BGR storage), and
    compressed/malformed containers raise loudly."""
    import struct

    import pytest

    from batch_processing_pipeline_spark.multimodal import codecs

    frames = [bytes((i * 17 + p) % 256 for p in range(5 * 3 * 3)) for i in range(6)]
    avi = codecs.encode_avi(5, 3, frames, fps=4)
    assert codecs.is_avi(avi) and not codecs.is_wav(avi)
    w, h, got = codecs.decode_avi(avi)
    assert (w, h) == (5, 3) and got == frames

    # flip the strf compression field to MJPEG → loud, hook-pointing error
    mjpg = bytearray(avi)
    off = avi.find(b"strf") + 8 + 16
    struct.pack_into("<I", mjpg, off, 0x47504A4D)  # 'MJPG'
    with pytest.raises(codecs.MediaFormatError, match="decoder="):
        codecs.decode_avi(bytes(mjpg))
    with pytest.raises(codecs.MediaFormatError, match="not an AVI"):
        codecs.decode_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_sample_frames_real_avi_container(spark):
    """The video-container path runs FOR REAL: an AVI built by the stdlib
    encoder is split by the distributed frame sampler into evenly spaced
    decoded RGB frames — no PyAV, no fake slicing."""
    from batch_processing_pipeline_spark.multimodal import codecs
    from batch_processing_pipeline_spark.multimodal.binary_ops import sample_frames

    frames = [bytes([i * 30] * (4 * 4 * 3)) for i in range(8)]
    avi = codecs.encode_avi(4, 4, frames, fps=4)
    df = spark.createDataFrame([(7, avi)], "doc_id long, content binary")
    rows = sorted(
        (r.frame_idx, bytes(r.frame))
        for r in sample_frames(df, n_frames=4).collect()
    )
    # frame j = i*8//4 → decoded frames 0, 2, 4, 6
    assert [b for _, b in rows] == [frames[0], frames[2], frames[4], frames[6]]


def test_sample_frames_with_av_real_video(spark):
    """Real-container path: runs only where PyAV is installed (not in this
    sandbox); proves the documented decoder wiring verbatim."""
    import pytest

    av = pytest.importorskip("av")
    import io

    import numpy as np

    from batch_processing_pipeline_spark.multimodal.binary_ops import sample_frames

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as c:
        stream = c.add_stream("h264", rate=4)
        stream.width, stream.height, stream.pix_fmt = 64, 64, "yuv420p"
        for i in range(8):
            img = np.full((64, 64, 3), i * 30, dtype=np.uint8)
            for packet in stream.encode(av.VideoFrame.from_ndarray(img, format="rgb24")):
                c.mux(packet)
        for packet in stream.encode():
            c.mux(packet)

    def av_decoder(data: bytes) -> list[bytes]:
        import io as _io

        import av as _av

        with _av.open(_io.BytesIO(data)) as container:
            return [
                f.to_ndarray(format="rgb24").tobytes()
                for f in container.decode(video=0)
            ]

    df = spark.createDataFrame([(1, buf.getvalue())], "doc_id long, content binary")
    rows = sample_frames(df, n_frames=4, decoder=av_decoder).collect()
    assert len(rows) == 4 and all(len(r.frame) == 64 * 64 * 3 for r in rows)


def test_bmp_codec_roundtrip_and_distributed_decode(spark):
    """24-bit BMP: encode→decode is identity (incl. row padding at widths
    not divisible by 4), and the mapInPandas decode path dispatches BMP
    payloads by magic bytes alongside PNG."""
    import random

    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.multimodal import codecs
    from batch_processing_pipeline_spark.multimodal.binary_ops import (
        decode_image_batches,
    )

    random.seed(11)
    rows = []
    for doc_id, (w, h) in enumerate([(1, 1), (3, 2), (5, 4), (7, 3)]):
        px = bytes(random.randrange(256) for _ in range(w * h * 3))
        enc = codecs.encode_bmp(w, h, px)
        got = codecs.decode_bmp(enc)
        assert got == (w, h, 3, px)
        rows.append((doc_id, enc, w, h))
    df = spark.createDataFrame(
        [(i, bytearray(e)) for i, e, _, _ in rows], "doc_id long, content binary"
    )
    out = {r.doc_id: (r.width, r.height) for r in decode_image_batches(df).collect()}
    assert out == {i: (w, h) for i, _, w, h in rows}


def test_bmp_rejects_unsupported_variants(spark):
    import struct

    import pytest

    from batch_processing_pipeline_spark.multimodal import codecs

    good = codecs.encode_bmp(2, 2, bytes(12))
    # flip bpp to 8 → loud failure, not silent garbage
    bad = bytearray(good)
    struct.pack_into("<H", bad, 28, 8)
    with pytest.raises(codecs.MediaFormatError, match="bpp=8"):
        codecs.decode_bmp(bytes(bad))
    with pytest.raises(codecs.MediaFormatError, match="not a BMP"):
        codecs.decode_bmp(b"\x89PNG")


def test_bmp_rejects_hostile_headers(spark):
    """Untrusted-header hardening: dimensions are validated against the
    actual payload size BEFORE the pixel-buffer allocation, so a tiny
    crafted BMP claiming 100000x100000 (a ~30 GB buffer) raises
    MediaFormatError instead of attempting the allocation, and negative
    width raises MediaFormatError (not ValueError)."""
    import struct

    import pytest

    from batch_processing_pipeline_spark.multimodal import codecs

    good = codecs.encode_bmp(2, 2, bytes(12))

    huge = bytearray(good)
    struct.pack_into("<ii", huge, 18, 100_000, 100_000)
    with pytest.raises(codecs.MediaFormatError, match="claims 100000x100000"):
        codecs.decode_bmp(bytes(huge))

    neg = bytearray(good)
    struct.pack_into("<i", neg, 18, -2)
    with pytest.raises(codecs.MediaFormatError, match="invalid BMP dimensions"):
        codecs.decode_bmp(bytes(neg))

    # pixel_off pointing past the payload
    off = bytearray(good)
    struct.pack_into("<I", off, 10, len(good))
    with pytest.raises(codecs.MediaFormatError, match="payload is"):
        codecs.decode_bmp(bytes(off))
