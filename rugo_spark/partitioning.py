"""Explicit size-balanced partitioning: quantile buckets → cumulative-mass map.

The north rule requires skew handling to be explicit: long-sequence skew in
``n_tok`` means hash-partitioning by doc count alone yields partitions whose
*token mass* (the real encode cost) varies wildly.  Plan:

1. ``approxQuantile`` over the size column → B range buckets.
2. One small aggregation computes each bucket's total token mass.
3. Every doc maps to a position in [0,1) cumulative-mass space:
   ``pos = cum_frac(bucket) + frac(bucket) * uniform_hash(key)`` and
   ``partition_id = floor(num_partitions * pos)``.  Light buckets *merge*
   into shared partitions, heavy buckets *split* across many — each final
   partition carries ≈ total_mass / num_partitions tokens (salting by the
   key hash defuses intra-bucket skew).
4. Fully deterministic in the key → stable across re-runs → resumable.

This happens *before* the shuffle, so the single ``groupBy(partition_id)``
shuffle feeding ``applyInArrow`` is the only data movement in the encode job.
AQE cannot rebalance a Python grouped-map stage, hence explicit.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_HASH_RES = 1 << 20


def with_partition_id(
    df: DataFrame,
    num_partitions: int,
    size_col: str | None = None,
    key_col: str | None = None,
    n_buckets: int = 32,
) -> DataFrame:
    """Add a deterministic ``partition_id`` column, size-balanced by ``size_col``."""
    key_expr = F.xxhash64(F.col(key_col)) if key_col else F.xxhash64(*df.columns)
    if size_col is None or num_partitions <= 1:
        return df.withColumn("partition_id", F.pmod(key_expr, F.lit(num_partitions)).cast("int"))

    qs = df.stat.approxQuantile(size_col, [i / n_buckets for i in range(1, n_buckets)], 0.001)
    edges = sorted(set(qs))  # dedupe: heavy ties collapse buckets
    bucket = reduce(
        lambda acc, ie: acc.when(F.col(size_col) <= F.lit(ie[1]), F.lit(ie[0])),
        enumerate(edges),
        F.when(F.lit(False), F.lit(0)),
    ).otherwise(F.lit(len(edges)))
    tagged = df.withColumn("_bucket", bucket.cast("int"))

    # one small agg: token mass per bucket → cumulative-mass intervals
    mass = {
        r["_bucket"]: r["m"]
        for r in tagged.groupBy("_bucket").agg(F.sum(size_col).alias("m")).collect()
    }
    n_b = len(edges) + 1
    total = float(sum(mass.values())) or 1.0
    cum, frac, acc = {}, {}, 0.0
    for b in range(n_b):
        cum[b] = acc
        frac[b] = mass.get(b, 0) / total
        acc += frac[b]

    u = F.pmod(key_expr, F.lit(_HASH_RES)).cast("double") / F.lit(float(_HASH_RES))
    pos = reduce(
        lambda e, b: e.when(F.col("_bucket") == b, F.lit(cum[b]) + F.lit(frac[b]) * u),
        range(n_b),
        F.when(F.lit(False), F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    pid = F.least(F.lit(num_partitions - 1), F.floor(F.lit(float(num_partitions)) * pos)).cast("int")
    return tagged.withColumn("partition_id", pid).drop("_bucket")
