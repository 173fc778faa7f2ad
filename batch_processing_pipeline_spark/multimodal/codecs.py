"""Dependency-free media codecs: PNG (encode/decode) and WAV PCM.

The container has no PIL/ffmpeg, but "the decode step is stubbed" is a
weaker contract than the pipeline needs — so the two formats with pure
stdlib representations get REAL codecs:

* PNG: full spec subset — 8-bit depth, color types 0 (gray), 2 (RGB),
  4 (gray+alpha), 6 (RGBA), all five scanline filters (None/Sub/Up/
  Average/Paeth), zlib IDAT, CRC-validated chunks. Enough to decode any
  non-interlaced 8-bit PNG a crawler would store, and to re-encode after a
  resize.
* WAV: RIFF/PCM header parse + 16-bit PCM write — the shape an audio
  feature extractor consumes.

Everything here is per-row CPU work invoked from Arrow-batched
``mapInPandas`` kernels (multimodal/binary_ops.py) — the distributed plan
never sees these internals. Video remains stubbed (no stdlib container
format exists); its kernel raises with a clear message.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class MediaFormatError(ValueError):
    """Payload is not a (supported) media container."""


def is_png(data: bytes) -> bool:
    return data[:8] == _PNG_SIG


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


# ----------------------------------------------------------------- PNG encode
def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 2) -> bytes:
    """Minimal non-interlaced 8-bit PNG writer (filter 0 on every row).

    ``pixels``: row-major packed samples, ``width*height*channels`` bytes.
    """
    ch = _CHANNELS[color_type]
    if len(pixels) != width * height * ch:
        raise MediaFormatError(
            f"pixel buffer is {len(pixels)} bytes, expected {width * height * ch}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * ch
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


# ----------------------------------------------------------------- PNG decode
def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Undo per-scanline filtering → packed pixel bytes."""
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        base = y * stride
        prev = out[base - stride : base] if y else bytes(stride)
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise MediaFormatError(f"unknown PNG filter type {ftype}")
        out[base : base + stride] = line
    return out


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, packed pixel bytes).

    Supports non-interlaced 8-bit PNGs of color type 0/2/4/6; validates
    chunk CRCs; raises MediaFormatError otherwise.
    """
    if not is_png(data):
        raise MediaFormatError("not a PNG payload")
    pos = 8
    width = height = color_type = -1
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise MediaFormatError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise MediaFormatError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise MediaFormatError(f"unsupported color type {color_type}")
            if interlace:
                raise MediaFormatError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width < 0 or not idat:
        raise MediaFormatError("missing IHDR/IDAT")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise MediaFormatError("IDAT length does not match dimensions")
    return width, height, ch, bytes(_unfilter(raw, height, stride, ch))


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample of packed pixel bytes."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = y * height // new_h
        src_row = sy * width * channels
        dst_row = y * new_w * channels
        for x in range(new_w):
            sx = x * width // new_w
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)


# ------------------------------------------------------------------- WAV PCM
def encode_wav(
    samples: bytes, sample_rate: int = 16000, channels: int = 1, bits: int = 16
) -> bytes:
    """RIFF/WAVE PCM writer; ``samples`` is the packed little-endian data."""
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(samples))
        + samples
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (sample_rate, channels, bits, packed PCM bytes). PCM only."""
    if not is_wav(data):
        raise MediaFormatError("not a WAV payload")
    pos = 12
    rate = channels = bits = -1
    pcm = b""
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_format, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", payload
            )
            if audio_format != 1:
                raise MediaFormatError(f"non-PCM WAV (format {audio_format})")
        elif tag == b"data":
            pcm = payload
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate < 0 or not pcm:
        raise MediaFormatError("missing fmt/data chunk")
    return rate, channels, bits, pcm
