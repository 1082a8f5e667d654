"""Codec auto-selector: statistics + sampled trial encoding per column.

The reference's per-column statistics vocabulary (cardinality, value range,
null/run structure — rugo ``metadata.cpp:430-463``) prunes the candidate
list; the survivors are then *actually encoded on a bounded sample* behind
the outer zstd layer, because post-compression size is not analytic.  Among
candidates within ``SLACK`` of the smallest, the fastest kernel wins
(bss/plain are ~memcpy; dict/rle cost a sort or scatter).
"""

from __future__ import annotations

import numpy as np

from rugo_spark.codecs import INT_CODECS, fsst, general
from rugo_spark.stats import int_stats, sample_values

SLACK = 1.08
# fastest → slowest kernel, used as tie-break preference
_SPEED_ORDER = ["plain", "bss", "for", "delta", "rle", "dict"]


def _candidates(s: dict) -> list[str]:
    if s["n"] == 0:
        return ["plain"]
    cands = ["plain", "bss"]
    if s["for_width"] < 64:
        cands.append("for")
    if s["delta_width"] < 64:
        cands.append("delta")
    if s["n_runs"] <= s["n"] // 4:
        cands.append("rle")
    if s["card"] <= max(s["n"] // 8, 1) or s["card"] <= 4096:
        cands.append("dict")
    return cands


def select_int_codec(v: np.ndarray) -> tuple[str, dict]:
    """Pick an integer codec by trial-encoding a sample; returns (name, stats)."""
    sample = sample_values(v)
    s = int_stats(sample)
    sizes: dict[str, int] = {}
    for name in _candidates(s):
        try:
            sizes[name] = len(general.wrap(INT_CODECS[name][0](sample)))
        except OverflowError:
            continue
    if not sizes:
        return "plain", s
    best = min(sizes.values())
    for name in _SPEED_ORDER:
        if name in sizes and sizes[name] <= best * SLACK:
            return name, s
    return min(sizes, key=sizes.__getitem__), s


def select_bytes_codec(data: bytes, sample_limit: int = 1 << 16) -> str:
    """Pick 'fsst' or 'raw' (outer zstd is auto either way) by sampled trial.

    Cost guard: the FSST trial (BPE training) costs a few ms on the 64 KiB
    sample (bincount-trained, LUT rounds), so it runs unless plain zstd
    already crushes the sample (> 6×) — measured: fsst+zstd still wins ~18%
    on document text that zstd compresses 4.4×."""
    if len(data) < 256:
        return "raw"
    sample = data[:sample_limit]
    raw_size = len(general.wrap(sample, general.ZSTD))
    if raw_size * 6 < len(sample):
        return "raw"
    fsst_size = len(general.wrap(fsst.encode(sample), general.ZSTD))
    return "fsst" if fsst_size < raw_size * 0.95 else "raw"
