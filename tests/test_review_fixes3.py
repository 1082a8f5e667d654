"""Regression pins for the core-module review findings (engine/bloom/partitioning)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from rugo_spark import manifest as mf
from rugo_spark.engine import decode_table, encode_table


def _pdf(n=1500):
    return pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [f"t {i:04d}" for i in range(n)],
            "n_chars": [(5 + 11 * i) % 307 for i in range(n)],
        }
    )


def test_filter_on_unprojected_column(spark, tmp_out):
    df = spark.createDataFrame(_pdf())
    encode_table(df, tmp_out, key_col="doc_id", size_col="n_chars", num_partitions=4)
    out = decode_table(
        spark, tmp_out, columns=["doc_id"], filters=[("n_chars", ">", 150)]
    )
    assert out.columns == ["doc_id"]
    want = int((_pdf()["n_chars"] > 150).sum())
    assert out.count() == want


def test_hash_plan_persisted_and_resume_heals_with_same_layout(spark, tmp_out):
    df = spark.createDataFrame(_pdf())
    encode_table(df, tmp_out, key_col="doc_id")  # no size_col → hash plan
    plan = mf.read_plan(tmp_out)
    assert plan is not None and plan.get("mode") == "hash"
    n_before = len(os.listdir(os.path.join(tmp_out, "blocks")))
    # simulate a crash: lose one partition, then resume
    victim = mf.completed_partitions(tmp_out)[0]
    os.remove(mf.sidecar_path(tmp_out, victim["partition_id"]))
    os.remove(victim["block_path"])
    encode_table(df, tmp_out, key_col="doc_id")
    assert len(os.listdir(os.path.join(tmp_out, "blocks"))) == n_before
    assert decode_table(spark, tmp_out).count() == 1500
    assert decode_table(spark, tmp_out).select("doc_id").distinct().count() == 1500


def test_corrupt_plan_beside_sidecars_raises(spark, tmp_out):
    df = spark.createDataFrame(_pdf())
    encode_table(df, tmp_out, key_col="doc_id", size_col="n_chars", num_partitions=4)
    with open(os.path.join(tmp_out, mf.PLAN_FILE), "w") as f:
        f.write("{not json")
    with pytest.raises(ValueError, match="corrupt"):
        encode_table(df, tmp_out, key_col="doc_id", size_col="n_chars")


def test_resume_without_size_col_on_mass_planned_dataset_raises(spark, tmp_out):
    df = spark.createDataFrame(_pdf())
    encode_table(df, tmp_out, key_col="doc_id", size_col="n_chars", num_partitions=4)
    victim = mf.completed_partitions(tmp_out)[0]
    os.remove(mf.sidecar_path(tmp_out, victim["partition_id"]))
    with pytest.raises(ValueError, match="size column"):
        encode_table(df, tmp_out, key_col="doc_id")  # size_col omitted on resume


def test_naive_datetime_probe_vs_tz_aware_bloom_is_conservative():
    import datetime

    import pyarrow as pa

    from rugo_spark import bloom as bl

    aware = pa.array(
        [datetime.datetime(2020, 1, 1)], type=pa.timestamp("us", tz="UTC")
    )
    b = bl.build(aware)
    assert b.get("ts_tz") == "UTC"
    # naive probe could be off by the session tz offset → never prune
    assert bl.might_contain(b, datetime.datetime(1999, 12, 31))
    # tz-aware probe renders compatibly → exact probing still works
    utc = datetime.timezone.utc
    assert bl.might_contain(b, datetime.datetime(2020, 1, 1, tzinfo=utc))
    assert not bl.might_contain(b, datetime.datetime(1999, 12, 31, tzinfo=utc))


def test_verify_checksums_decode_matches(spark, tmp_out):
    df = spark.createDataFrame(_pdf())
    encode_table(df, tmp_out, key_col="doc_id", size_col="n_chars", num_partitions=3)
    a = decode_table(spark, tmp_out, verify_checksums=True).orderBy("doc_id").toPandas()
    b = decode_table(spark, tmp_out).orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(a, b)
