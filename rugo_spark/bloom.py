"""Per-block Bloom filters for point-lookup block skipping.

The reference *declares* ``TestBloomFilter`` but never implements it
(rugo ``metadata.hpp:79-80``, no definition in ``metadata.cpp``, test
underscore-disabled — SURVEY.md §2.1 #29).  We implement the capability it
promised: every block's key column gets a fixed-size Bloom filter in the
manifest sidecar; ``decode_table(filters=[(key, '=', v)])`` skips blocks
whose filter excludes ``v``.

Fixed geometry (m = 2^17 bits = 16 KiB, k = 7) so stripe filters OR
together in the precombine path.  Hashing is a vectorized FNV-1a over the
value's string form (first 24 bytes + length) with double hashing
``h1 + i·h2`` — write side (numpy, whole-column) and query side (single
value) share the same code.
"""

from __future__ import annotations

import base64

import numpy as np
import pyarrow as pa

M_BITS = 1 << 17
K = 7
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_CAP = 24


def _hash_pair(lens: np.ndarray, starts: np.ndarray, data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (h1, h2) per variable-length byte string."""
    n = len(lens)
    h1 = np.full(n, _FNV_OFFSET)
    h2 = np.full(n, _FNV_OFFSET ^ np.uint64(0x9E3779B97F4A7C15))
    with np.errstate(over="ignore"):  # uint64 wrap is the hash mixing
        for k in range(_CAP):
            m = lens > k
            if not m.any():
                break
            byte = data[starts[m] + k].astype(np.uint64)
            # update only rows still in range — the hash of a short key must
            # not depend on the longest key in the batch
            h1[m] = (h1[m] ^ byte) * _FNV_PRIME
            h2[m] = (h2[m] + byte + np.uint64(k + 1)) * _FNV_PRIME
        ln = lens.astype(np.uint64)
        return h1 ^ (ln * _FNV_PRIME), h2 ^ ln


def _canonical_strings(arr: pa.Array) -> pa.Array:
    """Canonical string rendering shared by write and probe sides.

    Timestamps go through epoch-micros int64 first: Spark ships them to Arrow
    as timestamp[us, tz=UTC] while a probe's datetime infers naive
    timestamp[us] — their direct string renderings differ ('...Z' suffix, tz
    shift) but the stored int64 agrees whenever the probe is tz-aware or the
    session tz is UTC."""
    import pyarrow.compute as pc

    if pa.types.is_timestamp(arr.type):
        arr = pc.cast(arr, pa.int64())
    was_decimal = pa.types.is_decimal(arr.type)
    if pa.types.is_fixed_size_binary(arr.type):
        arr = pc.cast(arr, pa.binary())
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        # keep raw bytes: binary→string casting VALIDATES utf8 and threw on
        # arbitrary byte keys (review r4).  Binary arrays carry the same
        # (offsets, data) buffer layout as strings, so the hash side
        # consumes them directly.
        return arr
    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        arr = pc.cast(arr, pa.string())
    if was_decimal:
        # decimal rendering is scale-sensitive ('1.50' at storage scale vs a
        # probe Decimal's '1.5') — a bloom must hash ONE canonical form.
        # Strip trailing fractional zeros, then a bare trailing point; both
        # sides (build + probe) pass through here.
        arr = pc.replace_substring_regex(arr, pattern=r"(\.\d*?)0+$", replacement=r"\1")
        arr = pc.replace_substring_regex(arr, pattern=r"\.$", replacement="")
    return arr


def _string_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = _canonical_strings(arr)
    arr = pc.drop_null(arr)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    large = pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
    width = 8 if large else 4
    dt = np.int64 if width == 8 else np.int32
    offsets = np.frombuffer(bufs[1], dtype=dt, count=len(arr) + 1, offset=arr.offset * width).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    lens = np.diff(offsets)
    starts = offsets[:-1]
    return lens, starts, data


def build(arr: pa.Array) -> dict:
    """Bloom dict for a key column: {'m', 'k', 'bits_b64'[, 'ts_tz']}
    (sidecar-ready).  ``ts_tz`` records a tz-aware timestamp column so the
    probe side knows a naive-datetime probe cannot be rendered compatibly."""
    t = arr.type
    ts_tz = str(t.tz) if pa.types.is_timestamp(t) and t.tz is not None else None
    lens, starts, data = _string_bytes(arr)
    bits = np.zeros(M_BITS // 8, dtype=np.uint8)
    if len(lens):
        h1, h2 = _hash_pair(lens, starts, data)
        for i in range(K):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(M_BITS)
            np.bitwise_or.at(bits, (idx // 8).astype(np.int64), (1 << (idx % 8)).astype(np.uint8))
    import zlib

    out = {"m": M_BITS, "k": K, "bits_b64": base64.b64encode(zlib.compress(bits.tobytes())).decode()}
    if ts_tz is not None:
        out["ts_tz"] = ts_tz
    return out


def union(blooms: list[dict]) -> dict:
    """OR stripe filters together (same fixed geometry)."""
    import zlib

    acc = np.zeros(M_BITS // 8, dtype=np.uint8)
    ts_tz = None
    for b in blooms:
        acc |= np.frombuffer(zlib.decompress(base64.b64decode(b["bits_b64"])), dtype=np.uint8)
        ts_tz = ts_tz or b.get("ts_tz")
    out = {"m": M_BITS, "k": K, "bits_b64": base64.b64encode(zlib.compress(acc.tobytes())).decode()}
    if ts_tz:
        out["ts_tz"] = ts_tz
    return out


def _probe_renderings(value) -> list[bytes]:
    """All plausible write-side renderings of a probe value.

    The sidecar does not record whether the indexed column was float or
    decimal, and their Arrow string renderings diverge (float64 1e20 →
    '1e+20', decimal 1E+20 → '100000000000000000000').  A probe therefore
    hashes EVERY rendering the build side could have produced and the
    membership test ORs them — false positives cost one extra block scan,
    false negatives silently drop matching rows (ADVICE r4, medium).

    ``str(value)`` alone diverges from Arrow's rendering for timestamps
    ('2020-01-01 00:00:00' vs '2020-01-01 00:00:00.000000Z'), which made
    every match a false negative; all candidates go through the same
    ``_canonical_strings`` path as the write side.  Bytes probes stay raw
    (binary keys are hashed as bytes)."""
    if isinstance(value, (bytes, bytearray, memoryview)):
        return [bytes(value)]
    import decimal

    arrs = []
    if isinstance(value, (decimal.Decimal, float)):
        # decimal-column rendering: scale-free canonical decimal string.
        # pa.array raises ArrowInvalid for |v| ≥ 1e39 (decimal128 precision)
        # and TypeError for inf/nan — those magnitudes can still live in a
        # float64 column, so render what we can and let might_contain fall
        # back to a conservative scan if nothing renders (review r5).
        try:
            arrs.append(pa.array([decimal.Decimal(str(value))]))
        except (decimal.InvalidOperation, pa.ArrowInvalid, TypeError, ValueError):
            pass
        # float-column rendering: Arrow's shortest-repr float64 string
        try:
            arrs.append(pa.array([float(value)], type=pa.float64()))
        except (OverflowError, ValueError, TypeError, pa.ArrowInvalid):
            pass
    else:
        arrs.append(pa.array([value]))
    out: list[bytes] = []
    for arr in arrs:
        r = _canonical_strings(arr)[0].as_py()
        b = r.encode() if isinstance(r, str) else bytes(r)
        if b not in out:
            out.append(b)
    return out


def might_contain(bloom: dict, value) -> bool:
    """Query-side membership test (single value, driver)."""
    import datetime
    import zlib

    if value is None:
        # nulls are never indexed (drop_null on build); '= NULL' matches
        # nothing in SQL, but planning must not crash — conservatively scan
        # and let the exact residual filter return the (empty) answer
        return True
    if (
        isinstance(value, datetime.datetime)
        and value.tzinfo is None
        and bloom.get("ts_tz")
    ):
        # tz-aware indexed column stores epoch micros; a NAIVE probe renders
        # wall-clock-as-UTC micros — off by the session tz offset unless the
        # session is UTC.  A skip-test must never false-negative, so a naive
        # probe against a tz-aware column is conservatively a match.
        return True
    renderings = _probe_renderings(value)
    if not renderings:
        # value not renderable in any indexed form (e.g. float('inf')) — a
        # skip test must never false-negative, so scan conservatively
        return True
    bits = np.frombuffer(zlib.decompress(base64.b64decode(bloom["bits_b64"])), dtype=np.uint8)
    for raw in renderings:
        data = np.frombuffer(raw, dtype=np.uint8)
        h1, h2 = _hash_pair(
            np.array([len(raw)], dtype=np.int64), np.array([0], dtype=np.int64), data
        )
        with np.errstate(over="ignore"):
            idx_list = [int((h1[0] + np.uint64(i) * h2[0]) % np.uint64(bloom["m"])) for i in range(bloom["k"])]
        if all((bits[idx // 8] >> (idx % 8)) & 1 for idx in idx_list):
            return True
    return False
