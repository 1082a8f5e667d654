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

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_HASH_RES = 1 << 20


_SIZE_CLIP = 1 << 20  # histogram key cap (sequence lengths are far below this)


def with_partition_id(
    df: DataFrame,
    num_partitions: int | None = None,
    size_col: str | None = None,
    key_col: str | None = None,
    target_mass: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Add a deterministic ``partition_id`` column, size-balanced by ``size_col``.

    ONE scan builds an exact histogram of the (clipped) size column; the
    cumulative-mass mapping is broadcast-joined back — no extra quantile
    pass, no shuffle before the grouped encode.  If ``num_partitions`` is
    None it is derived from total mass / ``target_mass``.
    Returns (planned df, num_partitions, total_mass) — total_mass is 0 when
    no size column is given.
    """
    key_expr = F.xxhash64(F.col(key_col)) if key_col else F.xxhash64(*df.columns)
    if size_col is None:
        if num_partitions is None:
            # avoid 1-row blocks on tiny tables: cap by a row-count target
            n_rows = df.count()
            per_part = max(1, (target_mass or 1_000_000) // 256)  # ≈ rows/partition
            num_partitions = max(
                1,
                min(
                    df.sparkSession.sparkContext.defaultParallelism,
                    (n_rows + per_part - 1) // per_part,
                ),
            )
        pid = F.pmod(key_expr, F.lit(num_partitions)).cast("int")
        return df.withColumn("__rugo_pid", pid), num_partitions, 0

    # one scan: exact histogram of size values (bounded key space);
    # null sizes count as 0 so the broadcast join never drops rows.
    # The cumulative-mass map is computed DISTRIBUTED (running integer sum
    # over the histogram via a window) and checkpointed — histogram-sized,
    # so the checkpoint is tiny, the lineage is cut (the planned DataFrame
    # can stay lazy indefinitely without re-scanning the input), and the
    # driver only ever sees the single-row total.
    from pyspark.sql.window import Window

    size_key = F.least(F.coalesce(F.col(size_col).cast("long"), F.lit(0)), F.lit(_SIZE_CLIP))
    hist_df = df.groupBy(size_key.alias("__rugo_sz")).agg(
        F.sum(F.coalesce(F.col(size_col).cast("long"), F.lit(0))).alias("__rugo_mass")
    )
    # exclusive running sum in exact int64, one division at the end — the
    # single-task window is over ≤2^20 histogram rows, executor-side
    w = Window.orderBy("__rugo_sz").rowsBetween(Window.unboundedPreceding, -1)
    base = hist_df.select(
        "__rugo_sz",
        "__rugo_mass",
        F.coalesce(F.sum("__rugo_mass").over(w), F.lit(0)).alias("__rugo_cum_int"),
    ).localCheckpoint(eager=True)
    total = float(base.agg(F.sum("__rugo_mass")).first()[0] or 0) or 1.0
    if num_partitions is None:
        num_partitions = max(1, int(-(-total // (target_mass or total))))
    map_df = base.select(
        "__rugo_sz",
        (F.col("__rugo_cum_int") / F.lit(total)).alias("__rugo_cum"),
        (F.col("__rugo_mass") / F.lit(total)).alias("__rugo_frac"),
    )

    u = F.pmod(key_expr, F.lit(_HASH_RES)).cast("double") / F.lit(float(_HASH_RES))
    pos = F.col("__rugo_cum") + F.col("__rugo_frac") * u
    pid = F.least(F.lit(num_partitions - 1), F.floor(F.lit(float(num_partitions)) * pos)).cast("int")
    planned = (
        df.withColumn("__rugo_sz", size_key)
        .join(F.broadcast(map_df), "__rugo_sz")
        .withColumn("__rugo_pid", pid)
        .drop("__rugo_sz", "__rugo_cum", "__rugo_frac")
    )
    return planned, num_partitions, int(total)


def release_after_plan(planned) -> None:
    """Kept for call-site compatibility: the cumulative map is now a tiny
    localCheckpoint with no persist lifecycle to release."""
    hist = getattr(planned, "_rugo_cached_hist", None)
    if hist is not None:  # pragma: no cover - legacy handle
        hist.unpersist()
