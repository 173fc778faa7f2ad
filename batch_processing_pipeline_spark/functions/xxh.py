"""Bit-exact NumPy replication of Spark's ``xxhash64`` for shingle batches.

Spark's ``F.xxhash64(col, F.lit(k))`` is NOT "hash col with seed k": the
expression folds every child into one running hash — ``h = XXH64(utf8
bytes of col, seed=42)`` then ``h = XXH64_int(k, seed=h)`` (the literal is
an INT, hashed through XXH64's 4-byte tail path). Both steps follow the
published xxHash64 spec (Cyan4973/xxHash; Spark's
``org.apache.spark.sql.catalyst.expressions.XXH64`` is a straight port),
so a NumPy kernel can reproduce the exact signed-long values Spark emits —
which is what lets ``shingle_hash_sets`` hand whole Arrow batches to
vectorized native code (guide §4.2) without moving a single declared
output: bit-identity is pinned by tests/test_dedup.py against the original
column expression.

Scope: inputs shorter than 32 bytes (a character ``n``-gram is ≤ 4·n UTF-8
bytes; every caller uses n ≤ 8). The ≥32-byte stripe loop is deliberately
not implemented — ``xxh64_fixed`` asserts, and ``shingle_hashes_batch``
never produces such a slice for supported ``n``.

All uint64 arithmetic relies on NumPy's wraparound (mod 2^64) semantics.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_SPARK_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _avalanche(acc: np.ndarray) -> np.ndarray:
    acc = acc ^ (acc >> np.uint64(33))
    acc = acc * _P2
    acc = acc ^ (acc >> np.uint64(29))
    acc = acc * _P3
    acc = acc ^ (acc >> np.uint64(32))
    return acc


def xxh64_fixed(mat: np.ndarray, seed) -> np.ndarray:
    """XXH64 of every row of a ``(m, L)`` uint8 matrix, ``L`` < 32.

    ``seed``: scalar or length-m uint64 array (the multi-column folding
    needs per-row seeds). Returns uint64[m]."""
    m, L = mat.shape
    if L >= 32:  # pragma: no cover - guarded by callers
        raise ValueError(f"xxh64_fixed handles <32-byte inputs, got {L}")
    with np.errstate(over="ignore"):  # uint64 wraparound IS the algorithm
        acc = np.full(m, _P5 + np.uint64(L), dtype=np.uint64) + np.asarray(
            seed, dtype=np.uint64
        )
        i = 0
        while i + 8 <= L:
            lane = (
                np.ascontiguousarray(mat[:, i : i + 8])
                .view(np.dtype("<u8"))
                .ravel()
            )
            acc ^= _rotl(lane * _P2, 31) * _P1
            acc = _rotl(acc, 27) * _P1 + _P4
            i += 8
        if i + 4 <= L:
            k = (
                np.ascontiguousarray(mat[:, i : i + 4])
                .view(np.dtype("<u4"))
                .ravel()
                .astype(np.uint64)
            )
            acc ^= k * _P1
            acc = _rotl(acc, 23) * _P2 + _P3
            i += 4
        while i < L:
            acc ^= mat[:, i].astype(np.uint64) * _P5
            acc = _rotl(acc, 11) * _P1
            i += 1
        return _avalanche(acc)


def _fold_int(k: int, seeds: np.ndarray) -> np.ndarray:
    """XXH64 of a 4-byte int ``k`` with per-row ``seeds`` — Spark's
    ``hashInt`` leg, i.e. the second child of ``xxhash64(col, lit(k))``."""
    with np.errstate(over="ignore"):
        acc = seeds + _P5 + np.uint64(4)
        acc ^= np.uint64(np.uint32(k)) * _P1
        acc = _rotl(acc, 23) * _P2 + _P3
        return _avalanche(acc)


def spark_xxhash64_str_intlit(
    mat: np.ndarray, int_lit: int, base_seed: int = 42
) -> np.ndarray:
    """Exact value of Spark's ``xxhash64(str_col, lit(int_lit))`` for every
    row of a (m, L) uint8 matrix of UTF-8 bytes. Returns int64[m] (Spark's
    LongType is signed)."""
    h = xxh64_fixed(mat, np.uint64(base_seed))
    return _fold_int(int_lit, h).view(np.int64)


def shingle_hashes_batch(
    texts, shingle_n: int, int_lit: int
) -> list[np.ndarray]:
    """Per text: the int64 hash array Spark's
    ``transform(sequence(1, len-n+1), i -> xxhash64(substr(t, i, n),
    lit(int_lit)))`` produces — character n-grams (UTF-8 aware), one
    multiset array per document, order = position order.

    Batch formulation: concatenate every text's bytes once, compute every
    shingle's (byte-start, byte-length) via vectorized UTF-8 char-start
    detection, group shingles by byte length, and hash each group as one
    fixed-width matrix. Texts shorter than ``shingle_n`` characters (and
    None) yield empty arrays — callers filter those rows out beforehand,
    exactly like the column expression's length guard."""
    bufs: list[bytes] = []
    starts_l: list[np.ndarray] = []
    ends_l: list[np.ndarray] = []
    counts = np.empty(len(texts), dtype=np.int64)
    off = 0
    for r, s in enumerate(texts):
        if s is None:
            counts[r] = 0
            continue
        b = s.encode("utf-8")
        nb = len(b)
        if len(s) < shingle_n:
            counts[r] = 0
            bufs.append(b)
            off += nb
            continue
        bufs.append(b)
        if nb == len(s):  # pure ASCII: char index == byte index
            m = nb - shingle_n + 1
            st = np.arange(m, dtype=np.int64)
            en = st + shingle_n
        else:
            arr = np.frombuffer(b, dtype=np.uint8)
            cs = np.flatnonzero((arr & 0xC0) != 0x80).astype(np.int64)
            m = len(cs) - shingle_n + 1
            ext = np.append(cs, nb)
            st = cs[:m]
            en = ext[shingle_n:][:m]
        counts[r] = m
        starts_l.append(st + off)
        ends_l.append(en + off)
        off += nb
    total = int(counts.sum())
    out = np.empty(total, dtype=np.int64)
    if total:
        big = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        starts = np.concatenate(starts_l)
        ends = np.concatenate(ends_l)
        lengths = ends - starts
        for L in np.unique(lengths):
            idx = np.flatnonzero(lengths == L)
            gather = big[starts[idx][:, None] + np.arange(int(L), dtype=np.int64)]
            out[idx] = spark_xxhash64_str_intlit(gather, int_lit)
    res: list[np.ndarray] = []
    pos = 0
    for m in counts:
        res.append(out[pos : pos + m])
        pos += m
    return res
