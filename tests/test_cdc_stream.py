"""Streaming CDC source (`format('rugo_cdc')` — the Delta Change Data Feed
as a first-class Structured Streaming source): offsets are snapshot ids,
each micro-batch is the net row change between two committed snapshots
(`engine.cdc_window`, the same planner the batch `read_changes` uses).

Covers: drain-from-earliest equals the batch CDC read, checkpointed
restarts resume from the committed offset (only NEW changes surface),
startingSnapshot=latest skips history, and a rollback inside the window
fails the query loudly instead of silently skipping.
"""
from __future__ import annotations

import pandas as pd
import numpy as np
import pytest

from rugo_spark import manifest as mf
from rugo_spark.datasource import register
from rugo_spark.engine import (
    append_table,
    decode_table,
    delete_where,
    encode_table,
    read_changes,
)

N = 600


def _df(spark, n=N, start=0):
    return spark.createDataFrame(pd.DataFrame({
        "k": np.arange(start, start + n, dtype="int64"),
        "v": (np.arange(start, start + n, dtype="int64") % 7).astype("int64"),
    }))


def _drain(spark, ds, checkpoint, outdir, start=None):
    """availableNow drain into a parquet sink (checkpoint-recoverable);
    returns the ACCUMULATED rows — tests diff runs by count/content."""
    import glob
    import os

    reader = spark.readStream.format("rugo_cdc")
    if start is not None:
        reader = reader.option("startingSnapshot", start)
    q = (reader.load(ds)
         .writeStream.format("parquet")
         .option("path", outdir)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    if not glob.glob(os.path.join(outdir, "*.parquet")):
        import pandas as pd

        return pd.DataFrame(columns=["k", "v", "_change_type"])
    return spark.read.parquet(outdir).toPandas()


@pytest.fixture()
def ds(spark, tmp_path):
    out = str(tmp_path / "ds")
    encode_table(_df(spark), out, key_col="k", num_partitions=3)   # snap 1
    return out


def test_stream_matches_batch_cdc_and_resumes(spark, ds, tmp_path):
    register(spark)
    append_table(_df(spark, n=200, start=N), ds)                   # snap 2
    delete_where(spark, ds, [("k", "<", 50)])                      # snap 3
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")

    got = _drain(spark, ds, ckpt, sink, start="earliest")
    assert sorted(got.columns) == ["_change_type", "k", "v"]
    ins = got[got["_change_type"] == "insert"]
    dels = got[got["_change_type"] == "delete"]
    assert sorted(ins["k"]) == list(range(N, N + 200))
    assert sorted(dels["k"]) == list(range(50))
    # bit-parity with the batch incremental read over the same window
    batch = read_changes(spark, ds, 1).toPandas()
    key = lambda d: sorted(map(tuple, d[["k", "v", "_change_type"]].values))
    assert key(got) == key(batch)

    # new commits after the drain; SAME checkpoint → only the delta lands
    delete_where(spark, ds, [("k", ">=", 770)])                    # snap 4
    got2 = _drain(spark, ds, ckpt, sink)
    assert len(got2) == len(got) + 30
    delta = got2[~got2["k"].isin(ins["k"]) | (got2["_change_type"] == "delete")]
    new_dels = got2[(got2["_change_type"] == "delete") & (got2["k"] >= 770)]
    assert sorted(new_dels["k"]) == list(range(770, 800))
    # fully drained: a third run adds nothing
    assert len(_drain(spark, ds, ckpt, sink)) == len(got2)


def test_stream_latest_skips_history(spark, ds, tmp_path):
    register(spark)
    delete_where(spark, ds, [("k", "<", 10)])                      # snap 2
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    assert len(_drain(spark, ds, ckpt, sink)) == 0                 # latest: no history
    append_table(_df(spark, n=40, start=N), ds)                    # snap 3
    got = _drain(spark, ds, ckpt, sink)
    assert sorted(got["k"]) == list(range(N, N + 40))
    assert (got["_change_type"] == "insert").all()


def test_stream_fails_loudly_across_rollback(spark, ds, tmp_path):
    register(spark)
    append_table(_df(spark, n=100, start=N), ds)                   # snap 2
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    _drain(spark, ds, ckpt, sink, start="latest")                  # offset = 2
    # rollback past the CHECKPOINTED offset, then rebuild history: snapshot
    # ids get REUSED with different content — the checkpointed id 2 now
    # names a different state, and emitting a diff against it would be
    # silently-wrong deltas.  The offset carries the entry's fingerprint,
    # so the next drain must FAIL, not skip or emit.
    mf.rollback_to_snapshot(ds, 1)
    append_table(_df(spark, n=100, start=N + 200), ds)             # snap 2'
    append_table(_df(spark, n=100, start=N + 300), ds)             # snap 3'
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="rewrote history"):
        q = (spark.readStream.format("rugo_cdc").load(ds)
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
    assert decode_table(spark, ds).count() == N + 200  # dataset intact
