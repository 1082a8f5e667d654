"""Incremental / CDC reads (`engine.read_changes` — the Iceberg
incremental-scan / Delta Change Data Feed analog): net row changes
between two snapshots as dataset columns + `_change_type`, derived
entirely from snapshot entries (cumulative pid ranges + delete-file
lists) — diff cost tracks the CHANGE, not the table."""
from __future__ import annotations

import pytest

from rugo_spark import manifest as mf
from rugo_spark.engine import (
    append_table,
    delete_where,
    encode_table,
    merge_table,
    read_changes,
    update_where,
)
from rugo_spark.tokengen import token_batch

N_DOCS = 600


@pytest.fixture(scope="module")
def token_df(spark):
    return spark.createDataFrame(token_batch(N_DOCS).to_pandas()).cache()


@pytest.fixture()
def encoded(spark, token_df, tmp_out):
    import pyspark.sql.functions as F

    encode_table(token_df.filter(F.abs(F.hash("doc_id")) % 2 == 0), tmp_out,
                 key_col="doc_id", size_col="n_tok", num_partitions=4)
    return tmp_out


def test_changes_append_then_delete(spark, token_df, encoded):
    import pyspark.sql.functions as F

    even = token_df.filter(F.abs(F.hash("doc_id")) % 2 == 0)
    odd = token_df.filter(F.abs(F.hash("doc_id")) % 2 == 1)
    append_table(odd, encoded)                                     # snap 2
    med = int(token_df.approxQuantile("n_tok", [0.5], 0.0)[0])
    delete_where(spark, encoded, [("n_tok", "<", med)])            # snap 3
    ch = read_changes(spark, encoded, 1)  # 1 -> latest
    ins = ch.filter("_change_type = 'insert'")
    dele = ch.filter("_change_type = 'delete'")
    # inserts = odd rows still alive at the endpoint (append-then-delete
    # inside the window is NOT a change); deletes = even rows masked
    assert ins.count() == odd.filter(F.col("n_tok") >= med).count()
    assert dele.count() == even.filter(F.col("n_tok") < med).count()
    assert set(r["doc_id"] for r in dele.select("doc_id").collect()) == set(
        r["doc_id"] for r in even.filter(F.col("n_tok") < med).select("doc_id").collect()
    )
    # narrower window: 2 -> 3 sees ONLY the delete (both halves' masked rows)
    ch23 = read_changes(spark, encoded, 2, 3)
    assert ch23.filter("_change_type = 'insert'").count() == 0
    assert ch23.filter("_change_type = 'delete'").count() == (
        token_df.filter(F.col("n_tok") < med).count()
    )
    assert read_changes(spark, encoded, 3, 3).count() == 0


def test_changes_of_a_merge_window(spark, token_df, encoded):
    """An upsert's net CDC: replaced originals as deletes, the whole source
    as inserts — published by the same snapshot."""
    import pyspark.sql.functions as F

    even = token_df.filter(F.abs(F.hash("doc_id")) % 2 == 0)
    src = even.limit(40).withColumn("source", F.lit("upserted"))
    merge_table(src, encoded, key_col="doc_id")
    ch = read_changes(spark, encoded, 1)
    assert ch.filter("_change_type = 'insert'").count() == 40
    assert ch.filter("_change_type = 'delete'").count() == 40
    assert (
        ch.filter("_change_type = 'insert'").filter("source = 'upserted'").count()
        == 40
    )


def test_changes_of_an_update_window(spark, token_df, encoded):
    import pyspark.sql.functions as F

    even = token_df.filter(F.abs(F.hash("doc_id")) % 2 == 0)
    med = int(even.approxQuantile("n_tok", [0.5], 0.0)[0])
    update_where(spark, encoded, [("n_tok", "<", med)], {"source": "'v2'"})
    ch = read_changes(spark, encoded, 1)
    n = even.filter(F.col("n_tok") < med).count()
    assert ch.filter("_change_type = 'delete'").count() == n
    ins = ch.filter("_change_type = 'insert'")
    assert ins.count() == n
    assert ins.filter("source = 'v2'").count() == n


def test_changes_across_rollback_raises(spark, token_df, encoded):
    """A window in which pid ranges or mask positions SHRANK means the log
    was rewritten under the reader (rollback reuses snapshot ids) — the
    diff is undefined and must fail loudly, never silently invert."""
    import pyspark.sql.functions as F

    med = int(token_df.approxQuantile("n_tok", [0.5], 0.0)[0])
    delete_where(spark, encoded, [("n_tok", "<", med)])  # snap 2: masks
    log = mf.snapshot_log(encoded)
    # doctored 'to' entries simulating a post-rollback id reuse:
    tip = dict(log[-1])
    mask_shrunk = dict(tip, id=len(log) + 1, delete_files=[])
    range_shrunk = dict(tip, id=len(log) + 2, ranges=[])
    mf._write_snapshot_log(encoded, log + [mask_shrunk, range_shrunk])
    with pytest.raises(ValueError, match="un-deletes"):
        read_changes(spark, encoded, int(tip["id"]), int(mask_shrunk["id"]))
    with pytest.raises(ValueError, match="loses pid"):
        read_changes(spark, encoded, int(tip["id"]), int(range_shrunk["id"]))


def test_changes_validation(spark, token_df, encoded):
    with pytest.raises(ValueError, match="unknown snapshot_id"):
        read_changes(spark, encoded, 99)
    import pyspark.sql.functions as F

    append_table(token_df.filter(F.abs(F.hash("doc_id")) % 2 == 1), encoded)
    with pytest.raises(ValueError, match="newer than"):
        read_changes(spark, encoded, 2, 1)
