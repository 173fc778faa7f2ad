"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The Spark-side plumbing (schema, partition sizing, Arrow-batched UDF
signatures) is real and tested. Decode is REAL for the three formats with
stdlib representations — PNG (images, incl. resize/re-encode), animated
GIF (multi-frame LZW — the video-shaped path: decode + frame sampling),
and WAV PCM (audio frame sampling / features) via
``multimodal/codecs.py``; each kernel also keeps a deterministic
``fake=True`` mode so the distributed path is testable with arbitrary
payloads. Modern video containers (mp4/webm) still need ffmpeg/av — a
one-function swap into the same kernels; the distributed shape does not
move.

Scale notes: media payloads dominate row size, so operations keep the binary
column OUT of shuffles (stats/decodes are map-side ``mapInPandas``; joins
carry only ids + metadata). ``spark.sql.files.maxPartitionBytes`` should be
tuned down (e.g. 64 MB) when payload rows are MBs each.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from batch_processing_pipeline_spark.multimodal import codecs

#: Canonical media column pair: payload + typed metadata struct.
MEDIA_SCHEMA = StructType(
    [
        StructField("content", BinaryType()),
        StructField(
            "media_meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_bytes", LongType()),
                ]
            ),
        ),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text", mime: str = "application/octet-stream") -> DataFrame:
    """Test/demo helper: wrap a text column as an opaque binary payload with
    metadata — exercises the exact schema a real image/audio column uses."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("content", content).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(content).cast("long").alias("n_bytes"),
        ),
    )


def media_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Byte length + sha256 digest per payload — pure column expressions."""
    return df.select(
        F.col(id_col),
        F.length(F.col("content")).cast("long").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("sha256"),
    )


_DECODE_SCHEMA = "doc_id long, width int, height int, n_pixels long"


def decode_image_batches(df: DataFrame, id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """Decode image payloads → (id, width, height, n_pixels) via mapInPandas.

    ``fake=False`` (default) REALLY decodes: PNG header + pixel data via
    the stdlib codec (codecs.decode_png) — dimensions come from IHDR, and
    the whole pixel buffer is unfiltered so a corrupt payload fails loudly.
    ``fake=True`` derives deterministic dimensions from the byte length so
    the distributed path is testable with non-image payloads.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                n = pdf["content"].map(len)
                width = (n % 640 + 1).astype("int32")
                height = (n % 480 + 1).astype("int32")
                yield pd.DataFrame(
                    {
                        "doc_id": pdf[id_col],
                        "width": width,
                        "height": height,
                        "n_pixels": (width * height).astype("int64"),
                    }
                )
                continue
            ws, hs = [], []
            for payload in pdf["content"]:
                raw = bytes(payload)
                if codecs.is_bmp(raw):
                    w, h, _ch, _px = codecs.decode_bmp(raw)
                else:
                    w, h, _ch, _px = codecs.decode_png(raw)
                ws.append(w)
                hs.append(h)
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                }
            )
            out["n_pixels"] = (out["width"].astype("int64")) * out["height"]
            yield out

    return df.select(id_col, "content").mapInPandas(run, _DECODE_SCHEMA)


_RESIZE_SCHEMA = "doc_id long, width int, height int, content binary"


def resize_images(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id", fake: bool = False
) -> DataFrame:
    """Resize payloads to (width, height) via mapInPandas.

    ``fake=False`` (default) REALLY resamples: decode PNG → nearest-
    neighbor resample of the pixel buffer → re-encode PNG with the same
    color type (codecs.resize_nearest). ``fake=True`` truncates/pads the
    raw byte stream — a codec-free stand-in for arbitrary payloads; either
    way the distributed shape (binary in, binary out, no shuffle) is the
    contract.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            if fake:
                out = [
                    (bytes(payload) + b"\x00" * n)[:n] for payload in pdf["content"]
                ]
            else:
                _REV_CH = {1: 0, 3: 2, 2: 4, 4: 6}  # channels → PNG color type
                out = []
                for payload in pdf["content"]:
                    w, h, ch, px = codecs.decode_png(bytes(payload))
                    resized = codecs.resize_nearest(px, w, h, ch, width, height)
                    out.append(
                        codecs.encode_png(width, height, resized, _REV_CH[ch])
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "content": out,
                }
            )

    return df.select(id_col, "content").mapInPandas(run, _RESIZE_SCHEMA)


_FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    fake: bool = False,
    decoder: object | None = None,
) -> DataFrame:
    """Sample ``n_frames`` evenly spaced frames per media payload.

    One input row fans out to ``n_frames`` rows (id, frame_idx, frame) —
    the shape a frame-level feature extractor consumes.

    ``fake=False`` (default) REALLY decodes: animated GIFs are LZW-decoded
    (codecs.decode_gif) and ``n_frames`` evenly spaced decoded frames are
    emitted as full-canvas pixel buffers (``frame j = i·nf // n_frames``,
    repeating frames when the animation is shorter than the sample); AVI
    containers with uncompressed 24-bit DIB streams split into RGB frame
    buffers the same way (codecs.decode_avi — a true RIFF container walk,
    so the video-container path executes for real without native deps);
    WAV payloads yield evenly spaced windows of whole PCM sample blocks,
    so frame boundaries never split a sample.
    ``fake=True`` slices the raw bytes — codec-free stand-in for arbitrary
    payloads.

    ``decoder`` extends the kernel to containers the stdlib codecs don't
    cover (mp4/webm/...): a picklable callable ``bytes -> list[bytes]``
    returning the payload's decoded frames; it is tried for any payload
    the built-in codecs don't recognize, and evenly spaced frames are
    sampled from its output exactly like the GIF path. Production passes
    an av/ffmpeg-backed callable, e.g.::

        def av_decoder(data: bytes) -> list[bytes]:
            import av, io
            with av.open(io.BytesIO(data)) as c:
                return [f.to_ndarray().tobytes()
                        for f in c.decode(video=0)]

        sample_frames(df, decoder=av_decoder)

    Payloads no decoder covers raise NotImplementedError with the exact
    wiring instructions — loudly, not as silently empty output.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["content"]):
                data = bytes(payload)
                if fake:
                    step = max(1, len(data) // n_frames)
                    cuts = [data[i * step : (i + 1) * step] or b"\x00" for i in range(n_frames)]
                elif codecs.is_gif(data):
                    _w, _h, decoded = codecs.decode_gif(data)
                    nf = len(decoded)
                    cuts = [decoded[i * nf // n_frames] for i in range(n_frames)]
                elif codecs.is_avi(data):
                    _w, _h, decoded = codecs.decode_avi(data)
                    nf = len(decoded)
                    cuts = [decoded[i * nf // n_frames] for i in range(n_frames)]
                elif codecs.is_wav(data):
                    _rate, channels, bits, pcm = codecs.decode_wav(data)
                    block = max(1, channels * bits // 8)
                    n_blocks = len(pcm) // block
                    step = max(1, n_blocks // n_frames)
                    cuts = [
                        pcm[i * step * block : (i + 1) * step * block] or b"\x00"
                        for i in range(n_frames)
                    ]
                elif decoder is not None:
                    decoded = decoder(data)
                    if not decoded:
                        raise ValueError(
                            f"custom decoder returned no frames for doc {doc_id}"
                        )
                    nf = len(decoded)
                    cuts = [
                        bytes(decoded[i * nf // n_frames]) for i in range(n_frames)
                    ]
                else:
                    raise NotImplementedError(
                        "built-in frame sampling covers GIF animations and "
                        "WAV PCM; for mp4/webm/other containers pass "
                        "decoder=<callable bytes -> list[bytes]> backed by "
                        "av/ffmpeg (see docstring)"
                    )
                for i, cut in enumerate(cuts):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(cut)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, "content").mapInPandas(run, _FRAME_SCHEMA)


_SYNTH_SCHEMA = "doc_id long, content binary"


def synthesize_png(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic grayscale PNG payload per document (payload generator
    for tests/oracles): dimensions derive from the text's CHARACTER length
    (``width = len % 13 + 1``, ``height = len % 7 + 1`` — reproducible in
    ANSI SQL), pixels from its UTF-8 bytes tiled to fill. Runs the real
    encoder distributed, so decode queries exercise a true encode→decode
    round trip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                s = "" if text is None else str(text)
                w = len(s) % 13 + 1
                h = len(s) % 7 + 1
                need = w * h
                b = s.encode("utf-8")
                px = (b * (need // len(b) + 1))[:need] if b else b"\x00" * need
                ids.append(doc_id)
                outs.append(codecs.encode_png(w, h, px, color_type=0))
            yield pd.DataFrame({"doc_id": ids, "content": outs})

    return df.select(id_col, text_col).mapInPandas(run, _SYNTH_SCHEMA)


def synthesize_avi(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic uncompressed-DIB AVI payload per document (payload
    generator for tests/oracles): ``width = len % 6 + 1``, ``height =
    len % 4 + 1``, ``n_frames = len % 3 + 2``, frame ``i`` filled with the
    constant byte ``(len*7 + i*13) % 251`` — every term reproducible in
    ANSI SQL, so a differential oracle can pin the decoded frame stats.
    Runs the real container encoder distributed; downstream decode
    exercises a true RIFF walk + DIB frame decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                s = "" if text is None else str(text)
                L = len(s)
                w = L % 6 + 1
                h = L % 4 + 1
                nf = L % 3 + 2
                frames = [
                    bytes([(L * 7 + i * 13) % 251]) * (w * h * 3)
                    for i in range(nf)
                ]
                ids.append(doc_id)
                outs.append(codecs.encode_avi(w, h, frames, fps=4))
            yield pd.DataFrame({"doc_id": ids, "content": outs})

    return df.select(id_col, text_col).mapInPandas(run, _SYNTH_SCHEMA)


_FEATURE_SCHEMA = "doc_id long, feature array<float>"


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    dim: int = 8,
    fake: bool = True,
    decoder: object | None = None,
) -> DataFrame:
    """Feature-extract payloads → fixed-dim float vector via mapInPandas.

    ``fake=True`` (default): ``dim`` byte-histogram buckets over the RAW
    payload, normalized — deterministic for any payload. ``fake=False``
    histograms DECODED content (PNG pixel buffer / WAV PCM stream via the
    stdlib codecs), so the features reflect media content, not container
    bytes; a learned extractor slots into the same signature.

    ``decoder`` (picklable ``bytes -> bytes``) decodes containers the
    stdlib codecs don't recognize (mp4/webm/... via av/ffmpeg), same
    contract as ``sample_frames``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf["content"]:
                data = bytes(payload)
                if not fake:
                    if codecs.is_png(data):
                        _w, _h, _ch, data = codecs.decode_png(data)
                    elif codecs.is_bmp(data):
                        _w, _h, _ch, data = codecs.decode_bmp(data)
                    elif codecs.is_wav(data):
                        _r, _c, _b, data = codecs.decode_wav(data)
                    elif decoder is not None:
                        data = bytes(decoder(data))
                    else:
                        raise NotImplementedError(
                            "built-in real feature extraction covers PNG/BMP/WAV; "
                            "for other containers pass decoder=<callable "
                            "bytes -> bytes> backed by av/ffmpeg"
                        )
                arr = np.frombuffer(data, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                total = hist.sum() or 1.0
                feats.append((hist / total).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col], "feature": feats})

    return df.select(id_col, "content").mapInPandas(run, _FEATURE_SCHEMA)


def synthesize_gif(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic animated-GIF payload per document (the video-shaped
    twin of ``synthesize_png``): ``width = len % 11 + 1``, ``height =
    len % 5 + 1``, ``n_frames = len % 3 + 2`` — all reproducible in ANSI
    SQL — and frame ``f`` is a constant fill of ``(len + 7·f) % 251`` so
    an oracle can recompute per-frame pixel sums arithmetically. Runs the
    real encoder distributed: downstream decodes exercise a true
    multi-frame LZW round trip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                s = "" if text is None else str(text)
                n = len(s)
                w = n % 11 + 1
                h = n % 5 + 1
                frames = [
                    bytes([(n + 7 * f) % 251]) * (w * h) for f in range(n % 3 + 2)
                ]
                ids.append(doc_id)
                outs.append(codecs.encode_gif(w, h, frames))
            yield pd.DataFrame({"doc_id": ids, "content": outs})

    return df.select(id_col, text_col).mapInPandas(run, _SYNTH_SCHEMA)


_FRAME_STATS_SCHEMA = "doc_id long, frame_idx int, frame_len long, pixel_sum long"


def frame_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-frame stats over a (id, frame_idx, frame) relation — the
    feature-extraction stage a frame sampler feeds. Map-side only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [bytes(x) for x in pdf["frame"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "frame_idx": pdf["frame_idx"],
                    "frame_len": [len(x) for x in frames],
                    "pixel_sum": [sum(x) for x in frames],
                }
            )

    return df.mapInPandas(run, _FRAME_STATS_SCHEMA)


def synthesize_wav(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic 8-bit mono PCM WAV payload per document (payload
    generator for tests/oracles): ``n_samples = len % 50 + 20`` values of
    the sawtooth ``s_i = (i * (len % 7 + 2)) % 256`` — every term
    reproducible in ANSI SQL, so a differential oracle can pin the decoded
    frame features. Runs the real RIFF/WAVE encoder distributed; downstream
    analysis exercises a true chunk walk + PCM decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                s = "" if text is None else str(text)
                L = len(s)
                n = L % 50 + 20
                step = L % 7 + 2
                pcm = bytes((i * step) % 256 for i in range(n))
                ids.append(doc_id)
                outs.append(
                    codecs.encode_wav(pcm, sample_rate=8000, channels=1, bits=8)
                )
            yield pd.DataFrame({"doc_id": ids, "content": outs})

    return df.select(id_col, text_col).mapInPandas(run, _SYNTH_SCHEMA)


_AUDIO_SCHEMA = (
    "doc_id long, frame_idx int, n_samples long, sum_amp long, "
    "energy long, rms double, zero_cross long"
)


def audio_frame_features(
    df: DataFrame, id_col: str = "doc_id", frame_len: int = 16
) -> DataFrame:
    """REAL audio feature extraction: decode the WAV container (chunk walk
    + PCM), split into fixed-length analysis frames (tail samples beyond
    the last whole frame drop, the standard hop = frame_len framing), and
    emit per-frame features: ``energy`` (EXACT int64 sum of squared
    centered amplitudes — the gate field: downstream threshold gates must
    compare this integer, never the sqrt'd float, so a clip sitting on
    the threshold can't flip by 1 ulp), ``rms`` (float convenience view,
    sqrt(energy/n)), and ``zero_cross`` — RMS + zero-crossing being the
    two classic VAD/segmentation features.

    Arrow-batched ``mapInPandas`` with vectorized numpy per payload; the
    per-frame math is exact-integer sums in float64, so a SQL oracle that
    regenerates the synthetic sawtooth arithmetically reproduces the RMS
    bit-for-bit."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "n_samples": [],
                "sum_amp": [], "energy": [], "rms": [], "zero_cross": [],
            }
            for doc_id, data in zip(pdf[id_col], pdf["content"]):
                _rate, _ch, _bits, pcm = codecs.decode_wav(bytes(data))
                s = np.frombuffer(pcm, dtype=np.uint8).astype(np.float64)
                nf = len(s) // frame_len
                for f in range(nf):
                    fr = s[f * frame_len : (f + 1) * frame_len]
                    centered = fr - 128.0
                    # exact int64 energy: |centered| <= 128 so the sum of
                    # squares is exact — downstream threshold gates compare
                    # this integer, never a sqrt'd float (1-ulp safe)
                    energy = int(np.sum(centered * centered))
                    below = fr < 128
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(f)
                    out["n_samples"].append(frame_len)
                    out["sum_amp"].append(int(fr.sum()))
                    out["energy"].append(energy)
                    out["rms"].append(float(np.sqrt(energy / frame_len)))
                    out["zero_cross"].append(int(np.sum(below[:-1] != below[1:])))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, _AUDIO_SCHEMA)


_PHASH_SCHEMA = "doc_id long, dhash string"


def dhash_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded images: PNG
    decode (zlib inflate + filter reversal), grayscale, nearest-neighbor
    resample to the canonical 9x8 grid, then 64 bits of row-wise
    left>right comparisons — the standard cheap near-dup image
    fingerprint (resampling absorbs rescales/re-encodes; the bit plane
    absorbs brightness shifts).

    Arrow-batched mapInPandas; emits the hash as fixed-width hex so the
    downstream dup-grouping is a plain string groupBy (the exact-dedup
    shuffle shape: 16 bytes per image, never pixels)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, data in zip(pdf[id_col], pdf["content"]):
                w, h, channels, px = codecs.decode_png(bytes(data))
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w * channels)
                if channels > 1:
                    arr = arr.reshape(h, w, channels).mean(axis=2)
                # nearest-neighbor resample to 9x8 (deterministic)
                rows = (np.arange(8) * h) // 8
                cols = (np.arange(9) * w) // 9
                grid = arr[np.ix_(rows, cols)].astype(np.int64)
                bits = (grid[:, :-1] > grid[:, 1:]).flatten()
                val = 0
                for bit in bits:
                    val = (val << 1) | int(bit)
                ids.append(doc_id)
                hashes.append(format(val, "016x"))
            yield pd.DataFrame({"doc_id": ids, "dhash": hashes})

    return df.mapInPandas(run, _PHASH_SCHEMA)
