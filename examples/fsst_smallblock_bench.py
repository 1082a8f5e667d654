#!/usr/bin/env python
"""FSST small-stripe throughput: per-stripe training vs a job-pinned table.

VERDICT r4 item 5: at small (~1.5 MB) stripes, per-stripe training
(~20 ms/stripe) dominates whole-encode throughput.  A job-level pinned
table (trained ONCE from a corpus sample, shared immutably by every
stripe — ``codecs/fsst.py:386``) removes that cost; the degradation guard
still falls back to fresh local training on any stripe that drifts.

Prints one JSON line with whole-encode MB/s for both modes and the
compressed-size ratio between them (pinned must stay within ~2% of
per-stripe training on in-distribution text).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rugo_spark.codecs import fsst
from rugo_spark.docgen import doc_batch

STRIPE = 3 * (1 << 19)  # 1.5 MiB
N_STRIPES = 32


def main() -> None:
    # realistic crawl-ish text from the deterministic corpus generator
    texts = []
    total = 0
    start = 0
    while total < STRIPE * N_STRIPES:
        t = doc_batch(20_000, start=start)
        blob = ("\n".join(t.column("text").to_pylist())).encode()
        texts.append(blob)
        total += len(blob)
        start += 20_000
    data = b"".join(texts)[: STRIPE * N_STRIPES]
    stripes = [data[i : i + STRIPE] for i in range(0, len(data), STRIPE)]

    out: dict = {"stripe_mb": round(STRIPE / 2**20, 2), "n_stripes": len(stripes)}

    best_per_stripe = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        enc_ps = [fsst.encode(s) for s in stripes]
        best_per_stripe = min(best_per_stripe, time.perf_counter() - t0)
    out["per_stripe_mb_s"] = round(len(data) / 2**20 / best_per_stripe, 1)
    out["per_stripe_bytes"] = sum(len(e) for e in enc_ps)

    # job-level sample: 16 KiB from every 4th stripe (a real job samples
    # across input splits, not the first file only)
    sample = b"".join(s[: 1 << 14] for s in stripes[::4])
    table = fsst.train(sample)
    expected = len(fsst.compress(sample, table)) / max(len(sample), 1)
    best_pinned = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        enc_pin = [fsst.encode(s, table=table, expected_ratio=expected) for s in stripes]
        best_pinned = min(best_pinned, time.perf_counter() - t0)
    out["pinned_mb_s"] = round(len(data) / 2**20 / best_pinned, 1)
    out["pinned_bytes"] = sum(len(e) for e in enc_pin)
    out["pinned_size_ratio_vs_per_stripe"] = round(
        out["pinned_bytes"] / out["per_stripe_bytes"], 4
    )

    # both decode bit-identically
    assert b"".join(fsst.decode(e) for e in enc_ps) == data
    assert b"".join(fsst.decode(e) for e in enc_pin) == data
    out["decode_verified"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
