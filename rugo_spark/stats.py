"""Sampled column statistics — the codec selector's input.

Computes on a bounded sample exactly the statistics vocabulary the reference
surfaces per column chunk (rugo ``metadata.cpp:430-463``: min/max,
null_count, distinct_count) plus the run/width measures our selector needs
(run count, frame-of-reference width, zigzag-delta width).  All vectorized.
"""

from __future__ import annotations

import numpy as np

from rugo_spark.codecs import bitpack, foref

SAMPLE_LIMIT = 65536


def sample_values(v: np.ndarray, limit: int = SAMPLE_LIMIT) -> np.ndarray:
    """Deterministic stride sample (no RNG — resume-stable)."""
    if len(v) <= limit:
        return v
    # ceil, not floor: len 100k / limit 64k floored to stride 1, making the
    # "stride sample" a PREFIX that never sees the array's tail (review r4)
    stride = -(-len(v) // limit)
    return v[::stride][:limit]


def int_stats(v: np.ndarray) -> dict:
    """Statistics over a dense (null-free) int64 array sample."""
    n = len(v)
    if n == 0:
        return {"n": 0, "min": None, "max": None, "card": 0, "n_runs": 0,
                "for_width": 0, "delta_width": 0}
    lo, hi = int(v.min()), int(v.max())
    rng = hi - lo
    for_width = rng.bit_length() if rng.bit_length() <= 63 else 64
    card = int(len(np.unique(v)))
    n_runs = int(np.count_nonzero(v[1:] != v[:-1])) + 1
    if n > 1 and for_width < 64:
        delta_width = bitpack.bit_width(int(foref.zigzag(np.diff(v)).max()))
    else:
        delta_width = 64 if n > 1 else 0
    return {"n": n, "min": lo, "max": hi, "card": card, "n_runs": n_runs,
            "for_width": for_width, "delta_width": delta_width}
