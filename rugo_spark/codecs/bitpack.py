"""Bit-packing kernel: pack/unpack unsigned integers at an arbitrary bit width.

Vectorized analog of Parquet's BIT_PACKED / RLE-hybrid index packing
(reference vocabulary: rugo ``metadata.cpp:89-112`` enum BIT_PACKED=3).
All operations are whole-array numpy — no per-element Python.

Layout: values are written MSB-first, ``width`` bits each, bit-contiguous,
padded with zero bits to a byte boundary (``np.packbits`` big-bitorder).
"""

from __future__ import annotations

import numpy as np

__all__ = ["bit_width", "pack", "unpack"]


def bit_width(max_value: int) -> int:
    """Bits needed to represent ``max_value`` (0 → 0 bits)."""
    if max_value < 0:
        raise ValueError("bit_width requires a non-negative value")
    return int(max_value).bit_length()


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack unsigned ``values`` (each < 2**width) into a MSB-first bitstream."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    # bit matrix (n, width): column j holds bit (width-1-j) of each value
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def unpack(buf: bytes | memoryview, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack` → uint64 array of length ``n``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    bits = np.unpackbits(raw, count=n * width).reshape(n, width)
    out = np.zeros(n, dtype=np.uint64)
    # width (≤64) vectorized OR-shift passes — no per-value Python
    for j in range(width):
        out |= bits[:, j].astype(np.uint64) << np.uint64(width - 1 - j)
    return out
