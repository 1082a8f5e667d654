"""Vectorized xxHash64 (numpy) bit-identical to Spark's ``xxhash64``.

Why this exists (r6 optimization round): the LSH signature used to be
computed as 16 interpreted ``array_min(transform(_sh, s -> xxhash64(s, j)))``
higher-order expressions — measured 18.4 s over 600k docs at local[32],
~30× the raw hash cost, all HOF interpretation overhead (guide §4.2: hand
whole batches to vectorized native code instead).  Spark composes
``xxhash64(s, lit(j))`` as ``xxh64_int(j, seed=xxh64_bytes(utf8(s), 42))``,
so the expensive variable-length string hash is computed ONCE per shingle
here and the ``n_hashes`` seed variants are each a handful of constant-folded
vector ops.

The byte-string kernel follows the public xxHash64 specification
(32-byte stripes, then 8/4/1-byte phases) exactly as
``oracle_recompute.xxh64_bytes`` does sequentially; equality with both the
oracle and Spark's ``F.xxhash64`` is pinned by tests/test_xxh_vec.py.
Vectorization uses the length-sorted-prefix technique (rows sorted by
length descending, so byte position k touches a contiguous prefix), the
same shape as ``dedup._fnv1a``.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_P1 = _U64(0x9E3779B185EBCA87)
_P2 = _U64(0xC2B2AE3D27D4EB4F)
_P3 = _U64(0x165667B19E3779F9)
_P4 = _U64(0x85EBCA77C2B2AE63)
_P5 = _U64(0x27D4EB2F165667C5)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U64(33))
    h = h * _P2
    h = h ^ (h >> _U64(29))
    h = h * _P3
    return h ^ (h >> _U64(32))


def _load8(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Little-endian uint64 loads at arbitrary (unaligned) byte offsets."""
    w = data[pos].astype(_U64)
    for b in range(1, 8):
        w |= data[pos + b].astype(_U64) << _U64(8 * b)
    return w


def _load4(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    w = data[pos].astype(_U64)
    for b in range(1, 4):
        w |= data[pos + b].astype(_U64) << _U64(8 * b)
    return w


def _round(acc: np.ndarray, k: np.ndarray) -> np.ndarray:
    return _rotl(acc + k * _P2, 31) * _P1


def xxh64_bytes_vec(
    data: np.ndarray, starts: np.ndarray, lens: np.ndarray, seed: int
) -> np.ndarray:
    """xxHash64 of ``n`` byte strings living at ``data[starts[i] :
    starts[i]+lens[i]]`` — returns uint64[n].  One shared ``data`` buffer,
    arbitrary positions (callers hash *slices* of a larger stream without
    materializing per-string copies)."""
    n = len(lens)
    out = np.empty(n, dtype=_U64)
    if n == 0:
        return out
    with np.errstate(over="ignore"):
        seed_u = _U64(seed & 0xFFFFFFFFFFFFFFFF)
        order = np.argsort(-lens, kind="stable")
        sl = lens[order].astype(np.int64)
        ss = starts[order].astype(np.int64)
        nstripes = sl >> 5  # len // 32
        max_st = int(nstripes[0])
        # active[t] = rows with nstripes > t (sorted desc → contiguous prefix)
        h = np.full(n, seed_u + _P5)
        if max_st > 0:
            m = int(np.searchsorted(-nstripes, 0))  # rows with >=1 stripe
            v1 = np.full(m, seed_u + _P1 + _P2)
            v2 = np.full(m, seed_u + _P2)
            v3 = np.full(m, seed_u)
            v4 = np.full(m, seed_u - _P1)
            remaining = m - np.cumsum(
                np.bincount(np.minimum(nstripes[:m], max_st), minlength=max_st + 1)
            )
            for t in range(max_st):
                p = int(remaining[t]) if t < len(remaining) else 0
                if p <= 0:
                    break
                base = ss[:p] + 32 * t
                v1[:p] = _round(v1[:p], _load8(data, base))
                v2[:p] = _round(v2[:p], _load8(data, base + 8))
                v3[:p] = _round(v3[:p], _load8(data, base + 16))
                v4[:p] = _round(v4[:p], _load8(data, base + 24))
            hm = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
            for v in (v1, v2, v3, v4):
                hm = (hm ^ (_rotl(v * _P2, 31) * _P1)) * _P1 + _P4
            h[:m] = hm
        h = h + sl.astype(_U64)
        # 8-byte rounds: (len - 32*stripes)//8 ∈ {0,1,2,3}
        i0 = ss + (nstripes << 5)
        r8 = (sl - (nstripes << 5)) >> 3
        for k in range(3):
            mask = r8 > k
            if not mask.any():
                break
            pos = i0[mask] + 8 * k
            kk = _rotl(_load8(data, pos) * _P2, 31) * _P1
            hm = h[mask] ^ kk
            h[mask] = _rotl(hm, 27) * _P1 + _P4
        # 4-byte round: (len % 8) >= 4
        i4 = i0 + (r8 << 3)
        rem = sl - (i4 - ss)
        mask = rem >= 4
        if mask.any():
            kk = _load4(data, i4[mask]) * _P1
            h[mask] = _rotl(h[mask] ^ kk, 23) * _P2 + _P3
        i1 = i4 + np.where(mask, 4, 0)
        rem = sl - (i1 - ss)
        # 1-byte tail: up to 3 bytes
        for k in range(3):
            mask = rem > k
            if not mask.any():
                break
            bb = data[i1[mask] + k].astype(_U64) * _P5
            h[mask] = _rotl(h[mask] ^ bb, 11) * _P1
        out[order] = _fmix(h)
    return out


def xxh64_int_const_vec(v: int, seeds: np.ndarray) -> np.ndarray:
    """Spark ``hashInt`` path: xxHash64 of one 4-byte int ``v`` under a
    VECTOR of seeds (the running hash per shingle) — how ``xxhash64(s,
    lit(j))`` folds its IntegerType literal."""
    with np.errstate(over="ignore"):
        h = seeds + (_P5 + _U64(4))
        h = h ^ (_U64(v & 0xFFFFFFFF) * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        return _fmix(h)


def xxh64_long_vec(v: np.ndarray, seeds) -> np.ndarray:
    """Spark ``hashLong`` path under vector seeds: how ``xxhash64(c1..ck)``
    folds LongType columns left-to-right from seed 42."""
    with np.errstate(over="ignore"):
        h = seeds + (_P5 + _U64(8))
        k = _rotl(v * _P2, 31) * _P1
        h = h ^ k
        h = _rotl(h, 27) * _P1 + _P4
        return _fmix(h)
