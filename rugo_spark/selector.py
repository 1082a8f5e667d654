"""Codec auto-selector: statistics-driven decision per column per partition.

Analytic size estimates from sampled statistics (cardinality, value range,
run count, delta width — the vocabulary rugo surfaces per column chunk,
``metadata.cpp:430-463``), minimum predicted size wins.  For strings the
candidates are *actually encoded on the sample* (FSST-style vs raw, both
behind an auto outer zstd) because string compressibility is not analytic.
"""

from __future__ import annotations

import numpy as np

from rugo_spark.codecs import bitpack, fsst, general
from rugo_spark.stats import int_stats, sample_values


def select_int_codec(v: np.ndarray) -> tuple[str, dict]:
    """Pick an integer codec from sampled stats; returns (name, stats)."""
    s = int_stats(sample_values(v))
    n = s["n"]
    if n == 0:
        return "plain", s
    est = {}
    if s["for_width"] < 64:
        est["for"] = n * s["for_width"] / 8 + 18
    if s["delta_width"] < 64:
        est["delta"] = n * s["delta_width"] / 8 + 18
    idx_w = bitpack.bit_width(max(s["card"] - 1, 0))
    # dict values are sorted → delta-coded; assume ~delta_width bits each (bounded by for_width)
    est["dict"] = s["card"] * min(s["for_width"], 32) / 8 + n * idx_w / 8 + 42
    run_w = s["for_width"]
    len_w = bitpack.bit_width(max(n // max(s["n_runs"], 1) * 8, 1))
    est["rle"] = s["n_runs"] * (run_w + len_w) / 8 + 43
    plain_bytes = 8
    for size in (1, 2, 4, 8):
        info = np.iinfo({1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}[size])
        if s["min"] >= info.min and s["max"] <= info.max:
            plain_bytes = size
            break
    est["plain"] = n * plain_bytes + 9
    return min(est, key=est.__getitem__), s


def select_bytes_codec(data: bytes, sample_limit: int = 1 << 18) -> str:
    """Pick 'fsst' or 'raw' (outer zstd is auto either way) by sampled trial."""
    if len(data) < 256:
        return "raw"
    sample = data[:sample_limit]
    fsst_size = len(general.wrap(fsst.encode(sample), general.ZSTD))
    raw_size = len(general.wrap(sample, general.ZSTD))
    return "fsst" if fsst_size < raw_size * 0.95 else "raw"
