"""Delete-file consolidation + snapshot retention (the Iceberg
rewrite-position-deletes / expireSnapshots analogs — the maintenance half
of the DML lifecycle: every DELETE/MERGE/UPDATE commit adds a position-
delete file readers must union forever; consolidation folds them to one,
expiry drops the history entries keeping the inputs alive, and the orphan
GC reclaims the bytes).

Covers: fold-to-one with exact mask/total preservation, marker-published
(merge) files folding + marker stripping, idempotent re-run, time travel
before/after expiry, physical GC only after expiry, rollback across a
consolidation restoring the pre-fold state, and the unstripped-marker
crash window converging on the next consolidation.
"""
from __future__ import annotations

import os

import numpy as np
import pytest

from rugo_spark import deletes as dl
from rugo_spark import manifest as mf
from rugo_spark.engine import (
    decode_table,
    delete_where,
    encode_table,
    merge_table,
    metadata_agg,
)
from rugo_spark.tokengen import token_batch

N_DOCS = 1200


@pytest.fixture(scope="module")
def token_df(spark):
    return spark.createDataFrame(token_batch(N_DOCS).to_pandas()).cache()


@pytest.fixture()
def encoded(spark, token_df, tmp_out):
    encode_table(token_df, tmp_out, key_col="doc_id", size_col="n_tok",
                 num_partitions=6)
    return tmp_out


def _delete_files_on_disk(out_dir):
    d = os.path.join(out_dir, dl.DELETES_DIR)
    if not os.path.isdir(d):
        return []
    return sorted(n for n in os.listdir(d) if not n.endswith(".tmp"))


def test_consolidate_folds_to_one_file(spark, token_df, encoded):
    delete_where(spark, encoded, [("doc_id", "<", "doc-000000000100")])
    delete_where(spark, encoded, [("doc_id", ">=", "doc-000000001100")])
    delete_where(spark, encoded, [("doc_id", ">=", "doc-000000000500"),
                                  ("doc_id", "<", "doc-000000000550")])
    before_files = dl.visible_delete_files(encoded)
    assert len(before_files) == 3
    want = decode_table(spark, encoded).toPandas().sort_values("doc_id")
    before_agg = metadata_agg(spark, encoded).first()

    res = dl.consolidate_delete_files(encoded)
    assert res["files_before"] == 3 and res["files_after"] == 1
    vis = dl.visible_delete_files(encoded)
    assert len(vis) == 1 and vis[0].startswith("delete-consolidated-")
    got = decode_table(spark, encoded).toPandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    after_agg = metadata_agg(spark, encoded).first()
    assert after_agg["n_rows"] == before_agg["n_rows"]
    assert after_agg["n_tokens"] == before_agg["n_tokens"]
    # exact mask equality, not just counts
    assert {
        p: m.tolist() for p, m in dl.load_masks(encoded, before_files).items()
    } == {p: m.tolist() for p, m in dl.load_masks(encoded, vis).items()}
    # inputs stay on disk for time travel until expiry
    assert set(before_files) <= set(_delete_files_on_disk(encoded))
    # re-run is a no-op
    res2 = dl.consolidate_delete_files(encoded)
    assert res2["files_before"] == 1 and res2["snapshot_id"] is None


def test_consolidate_folds_marker_published_files(spark, token_df, encoded):
    import pyspark.sql.functions as F

    delete_where(spark, encoded, [("doc_id", "<", "doc-000000000050")])
    src = token_df.filter((F.abs(F.hash("doc_id")) % 97 == 0)
                      & (F.col("doc_id") >= "doc-000000000050"))
    merge_table(src, encoded, key_col="doc_id")
    assert len(dl.visible_delete_files(encoded)) == 2
    want = decode_table(spark, encoded).count()

    dl.consolidate_delete_files(encoded)
    assert len(dl.visible_delete_files(encoded)) == 1
    assert decode_table(spark, encoded).count() == want
    # the merge marker no longer references its folded file
    for m in mf.append_reservations(encoded):
        if m.get("complete"):
            assert not (m.get("delete_files") or []), (
                "completed marker still references a folded delete file"
            )


def test_unstripped_marker_window_is_safe_and_converges(
    spark, token_df, encoded
):
    """Crash between the consolidation commit and marker strip: the folded
    file stays visible via the marker — masks union idempotently (reads
    stay correct) and the next consolidation strips it."""
    import json as _json

    import pyspark.sql.functions as F

    src = token_df.filter(F.abs(F.hash("doc_id")) % 101 == 0)
    merge_table(src, encoded, key_col="doc_id")
    delete_where(spark, encoded, [("doc_id", "<", "doc-000000000030")])
    want = decode_table(spark, encoded).count()
    folded = dl.visible_delete_files(encoded)
    dl.consolidate_delete_files(encoded)

    # simulate the crash window: restore the marker's reference
    marker = next(m for m in mf.append_reservations(encoded) if m["complete"])
    path = marker.pop("_path")
    marker["delete_files"] = [n for n in folded if n.startswith("delete-") and
                              "consolidated" not in n][:1]
    with open(path, "w") as f:
        _json.dump(marker, f)
    assert decode_table(spark, encoded).count() == want  # idempotent union
    # a later consolidation needs >=2 visible files; add one more delete
    delete_where(spark, encoded, [("doc_id", ">=", "doc-000000001190")])
    dl.consolidate_delete_files(encoded)
    m2 = next(m for m in mf.append_reservations(encoded) if m["complete"])
    assert not (m2.get("delete_files") or [])


def test_expire_snapshots_gc_and_time_travel(spark, token_df, encoded):
    delete_where(spark, encoded, [("doc_id", "<", "doc-000000000100")])
    delete_where(spark, encoded, [("doc_id", ">=", "doc-000000001000")])
    pre_ids = [int(e["id"]) for e in mf.snapshot_log(encoded)]
    mid_count = decode_table(spark, encoded, snapshot_id=pre_ids[-2]).count()
    assert mid_count == N_DOCS - 100
    old_files = dl.visible_delete_files(encoded)
    dl.consolidate_delete_files(encoded)

    # history intact: time travel still reads the pre-fold state
    assert decode_table(spark, encoded, snapshot_id=pre_ids[-2]).count() == mid_count
    assert set(old_files) <= set(_delete_files_on_disk(encoded))

    res = mf.expire_snapshots(encoded, keep_last=1)
    assert res["expired"] >= 2 and len(res["kept"]) == 1
    # superseded inputs are now physically gone; the consolidated file stays
    on_disk = _delete_files_on_disk(encoded)
    assert not (set(old_files) & set(on_disk))
    assert any(n.startswith("delete-consolidated-") for n in on_disk)
    assert res["delete_files_removed"] == len(old_files)
    # current reads unaffected; expired ids raise with the survivors
    assert decode_table(spark, encoded).count() == N_DOCS - 100 - 200
    with pytest.raises(ValueError, match="unknown snapshot_id"):
        decode_table(spark, encoded, snapshot_id=pre_ids[-2]).count()


def test_expire_older_than_keeps_recent(spark, token_df, encoded):
    import time

    delete_where(spark, encoded, [("doc_id", "<", "doc-000000000010")])
    delete_where(spark, encoded, [("doc_id", ">=", "doc-000000001190")])
    log = mf.snapshot_log(encoded)
    assert all(int(e.get("ts") or 0) > 0 for e in log), "entries carry ts"
    # age the first entry artificially
    log[0]["ts"] = int(time.time()) - 10_000
    mf._write_snapshot_log(encoded, log)
    res = mf.expire_snapshots(encoded, keep_last=1, older_than_s=3600)
    assert res["expired"] == 1
    kept = [int(e["id"]) for e in mf.snapshot_log(encoded)]
    assert kept == [int(e["id"]) for e in log[1:]]
    # entries WITHOUT ts count as infinitely old, but keep_last still holds
    log2 = mf.snapshot_log(encoded)
    for e in log2:
        e.pop("ts", None)
    mf._write_snapshot_log(encoded, log2)
    res2 = mf.expire_snapshots(encoded, keep_last=1, older_than_s=3600)
    assert len(mf.snapshot_log(encoded)) == 1


def test_rollback_across_consolidation_restores_inputs(
    spark, token_df, encoded
):
    delete_where(spark, encoded, [("doc_id", "<", "doc-000000000100")])
    snap_before = int(mf.snapshot_log(encoded)[-1]["id"])
    count_before = decode_table(spark, encoded).count()
    delete_where(spark, encoded, [("doc_id", ">=", "doc-000000001100")])
    dl.consolidate_delete_files(encoded)
    assert decode_table(spark, encoded).count() == count_before - 100

    mf.rollback_to_snapshot(encoded, snap_before)
    assert decode_table(spark, encoded).count() == count_before
    vis = dl.visible_delete_files(encoded)
    assert len(vis) == 1 and "consolidated" not in vis[0]
    # the consolidated file lost its only reference and is GC'd
    assert all("consolidated" not in n for n in _delete_files_on_disk(encoded))


def test_expire_refuses_midrollback_and_bad_args(spark, token_df, encoded):
    import json as _json

    with pytest.raises(ValueError, match="keep_last"):
        mf.expire_snapshots(encoded, keep_last=0)
    marker = os.path.join(encoded, mf.ROLLBACK_MARKER)
    with open(marker, "w") as f:
        _json.dump({"ranges": [[0, 1]]}, f)
    try:
        with pytest.raises(ValueError, match="in-progress rollback"):
            mf.expire_snapshots(encoded, keep_last=1)
    finally:
        os.remove(marker)


def test_tags_resolve_and_protect_from_expiry(spark, token_df, encoded):
    delete_where(spark, encoded, [("doc_id", "<", "doc-000000000100")])
    mid = int(mf.snapshot_log(encoded)[-1]["id"])
    mf.set_tag(encoded, "after-takedown")          # defaults to newest
    delete_where(spark, encoded, [("doc_id", ">=", "doc-000000001100")])
    # read by tag = read by id
    assert decode_table(spark, encoded, snapshot_id="after-takedown").count() \
        == decode_table(spark, encoded, snapshot_id=mid).count() == N_DOCS - 100
    # expiry keeps the tagged entry (plus the newest), drops the rest
    res = mf.expire_snapshots(encoded, keep_last=1)
    kept = [int(e["id"]) for e in mf.snapshot_log(encoded)]
    assert mid in kept and len(kept) == 2
    assert decode_table(spark, encoded, snapshot_id="after-takedown").count() \
        == N_DOCS - 100
    # metadata stats by tag
    assert metadata_agg(
        spark, encoded, snapshot_id="after-takedown"
    ).first()["n_rows"] == N_DOCS - 100
    # rollback by tag
    mf.rollback_to_snapshot(encoded, "after-takedown")
    assert decode_table(spark, encoded).count() == N_DOCS - 100
    # drop the tag -> next expiry removes the entry; reads by tag raise
    mf.drop_tag(encoded, "after-takedown")
    with pytest.raises(ValueError, match="no tag"):
        decode_table(spark, encoded, snapshot_id="after-takedown").count()
    with pytest.raises(ValueError, match="no tag"):
        mf.drop_tag(encoded, "after-takedown")


def test_tag_validation(spark, token_df, encoded):
    with pytest.raises(ValueError, match="unknown snapshot_id"):
        mf.set_tag(encoded, "ghost", snapshot_id=999)
    with pytest.raises(ValueError, match="bad tag name"):
        mf.set_tag(encoded, "a/b")
    mf.set_tag(encoded, "v1")
    assert mf.tags(encoded) == {"v1": int(mf.snapshot_log(encoded)[-1]["id"])}


def test_cdc_window_across_consolidation_is_empty(spark, token_df, encoded):
    """Consolidation rewrites the delete-file SET, not the deleted row set —
    an incremental read across it must surface zero changes."""
    from rugo_spark.engine import read_changes

    delete_where(spark, encoded, [("doc_id", "<", "doc-000000000100")])
    delete_where(spark, encoded, [("doc_id", ">=", "doc-000000001150")])
    pre = int(mf.snapshot_log(encoded)[-1]["id"])
    dl.consolidate_delete_files(encoded)
    post = int(mf.snapshot_log(encoded)[-1]["id"])
    assert post > pre
    assert read_changes(spark, encoded, pre, post).count() == 0
    # and a window STARTING before the deletes still reports them exactly
    ch = read_changes(spark, encoded, pre - 2, post)
    assert ch.filter("_change_type = 'delete'").count() == 150
