"""Structured Streaming surface: micro-batch encode sink + monitoring aggs.

The reference is batch-only (rugo ``README.md:328``), so this is additive:
a ``foreachBatch`` sink that runs the full encode pipeline per micro-batch
(each batch gets its own block/manifest namespace → the same
checkpoint-restart semantics, now at two levels: Spark's streaming
checkpoint for source offsets, our manifest for intra-batch resume), plus a
watermarked windowed token-rate monitor as the streaming-agg example.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

EPOCH_MARKER = "_epoch_complete"


def encode_stream(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "doc_id",
    size_col: str = "n_tok",
    target_tokens: int = 4_000_000,
):
    """Build the encode sink for a streaming query (returns the
    ``DataStreamWriter`` — the caller picks a trigger and ``.start()``\\s it,
    e.g. ``encode_stream(...).trigger(availableNow=True).start()``).

    Batch ``n`` lands in ``out_dir/batch=<n>/`` — deterministic per epoch, so
    a restarted query that replays an epoch overwrites it idempotently (the
    manifest anti-join skips already-encoded partitions within the epoch).
    An ``_epoch_complete`` marker is written LAST: a crash mid-epoch leaves
    the partial batch dir invisible to ``decode_batches`` until the replay
    finishes it.
    """
    from rugo_spark.engine import encode_table

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        epoch_dir = os.path.join(out_dir, f"batch={epoch_id}")
        encode_table(
            batch_df,
            epoch_dir,
            key_col=key_col,
            size_col=size_col if size_col in batch_df.columns else None,
            target_tokens=target_tokens,
        )
        tmp = os.path.join(epoch_dir, "_epoch_complete.tmp")
        with open(tmp, "w") as f:
            f.write(str(epoch_id))
        os.replace(tmp, os.path.join(epoch_dir, EPOCH_MARKER))

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def decode_batches(
    spark: SparkSession, out_dir: str, include_incomplete: bool = False
) -> DataFrame:
    """Union-decode every COMPLETED micro-batch directory.

    Completed = carries the ``_epoch_complete`` marker the sink writes after
    its last partition — reading during (or after) a mid-epoch crash must
    not silently return a subset of that epoch's rows as if it were whole.
    ``include_incomplete=True`` opts into reading partial epochs (e.g. for
    forensics).  Driver-visible paths only (``os.listdir``), like the rest
    of the manifest layer — on a cluster the dataset root must be a shared
    filesystem."""
    from functools import reduce

    from rugo_spark.engine import decode_table

    dirs = sorted(
        os.path.join(out_dir, d)
        for d in os.listdir(out_dir)
        if d.startswith("batch=") and os.path.isdir(os.path.join(out_dir, d))
    )
    if not include_incomplete:
        complete = [d for d in dirs if os.path.exists(os.path.join(d, EPOCH_MARKER))]
        if dirs and not complete:
            raise ValueError(
                f"{out_dir} has {len(dirs)} batch dirs but none carries "
                f"{EPOCH_MARKER} — either every epoch crashed mid-write or "
                "the dataset predates completeness markers; pass "
                "include_incomplete=True to read it anyway"
            )
        dirs = complete
    parts = [decode_table(spark, d) for d in dirs]
    if not parts:
        raise ValueError(f"no completed batches under {out_dir}")
    return reduce(lambda a, b: a.unionAll(b), parts)


def token_rate_monitor(
    stream_df: DataFrame,
    ts_col: str = "ts",
    size_col: str = "n_tok",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked windowed aggregation: tokens/docs per event-time window
    (late rows beyond the watermark are dropped by Spark's state store)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(size_col).alias("tokens"),
        )
        .select(F.col("w.start").alias("window_start"), "docs", "tokens")
    )
