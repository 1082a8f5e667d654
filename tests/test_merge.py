"""MERGE INTO / upsert (`engine.merge_table` — the Delta MERGE / Iceberg
MERGE INTO analog in delete-then-insert form; beyond-reference lifecycle
surface like append/snapshots/deletes, the reference engine being
read-only ``rugo/parquet``).

Covers: upsert parity vs an anti-join + union oracle, idempotent re-run
(the own-band exclusion — a resumed merge must NOT re-mask its own
replacement rows under the same deterministic file name), pure insert,
replace-all, duplicate target keys, atomicity (a crash before the
marker flip leaves NOTHING visible and `reclaim_append` restores the
exact pre-merge state), snapshot time travel / rollback un-merge,
metadata accounting, physical purge, and interplay with prior
`delete_where` masks."""
from __future__ import annotations

import os

import numpy as np
import pytest

from rugo_spark import deletes as dl
from rugo_spark import manifest as mf
from rugo_spark.engine import (
    compact_dataset,
    decode_table,
    delete_where,
    encode_table,
    merge_table,
    metadata_agg,
    reclaim_append,
)
from rugo_spark.tokengen import token_batch

N_DOCS = 900


@pytest.fixture(scope="module")
def token_df(spark):
    return spark.createDataFrame(token_batch(N_DOCS).to_pandas()).cache()


@pytest.fixture()
def encoded(spark, token_df, tmp_out):
    encode_table(token_df, tmp_out, key_col="doc_id", size_col="n_tok",
                 num_partitions=5)
    return tmp_out


def _source(spark, token_df, frac_mod=7, n_new=60):
    """Upsert source: every doc_id hashing to % frac_mod == 0 gets its
    source column rewritten, plus n_new brand-new keys."""
    import pyspark.sql.functions as F

    mod = (
        token_df.filter(F.abs(F.hash("doc_id")) % frac_mod == 0)
        .withColumn("source", F.lit("upserted"))
    )
    new = spark.createDataFrame(token_batch(n_new, seed=13).to_pandas())
    new = new.withColumn("doc_id", F.concat(F.lit("new-"), F.col("doc_id")))
    return mod.unionByName(new), mod, new


def _sorted_pdf(df):
    return df.toPandas().sort_values("doc_id").reset_index(drop=True)


def _assert_matches(got_df, want_df):
    got, want = _sorted_pdf(got_df), _sorted_pdf(want_df)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["source"].tolist() == want["source"].tolist()
    assert got["n_tok"].tolist() == want["n_tok"].tolist()
    for g, w in zip(got["tokens"].values, want["tokens"].values):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def _expected(token_df, src):
    """Anti-join the upserted keys out of the target, union the source."""
    keys = src.select("doc_id").distinct()
    return token_df.join(keys, "doc_id", "left_anti").unionByName(src)


def test_merge_upsert_roundtrip(spark, token_df, encoded):
    src, mod, new = _source(spark, token_df)
    res = merge_table(src, encoded, key_col="doc_id")
    assert res["n_replaced"] == mod.count() > 0
    assert res["n_appended"] == src.count()
    assert res["delete_file"] and res["delete_file"].startswith("delete-merge-")
    _assert_matches(decode_table(spark, encoded), _expected(token_df, src))
    # exact accounting: rows and token mass net of the replaced rows
    import pyspark.sql.functions as F

    agg = metadata_agg(spark, encoded).first()
    want = _expected(token_df, src).agg(F.count("*"), F.sum("n_tok")).first()
    assert agg["n_rows"] == want[0]
    assert agg["n_tokens"] == want[1]
    snap = mf.snapshot_log(encoded)[-1]
    assert snap["op"] == "merge"
    assert snap["delete_files"] == [res["delete_file"]]
    assert snap["n_rows"] == want[0]


def test_merge_rerun_is_noop(spark, token_df, encoded):
    """The own-band exclusion: a re-run must not re-mask its own appended
    rows (which would overwrite the deterministic delete file and
    resurface the replaced originals)."""
    src, mod, _ = _source(spark, token_df)
    r1 = merge_table(src, encoded, key_col="doc_id")
    want = _expected(token_df, src)
    r2 = merge_table(src, encoded, key_col="doc_id")
    assert r2["n_replaced"] == 0 and r2["delete_file"] is None
    # the original delete file stays referenced through the marker union
    assert dl.visible_delete_files(encoded) == [r1["delete_file"]]
    _assert_matches(decode_table(spark, encoded), want)


def test_merge_pure_insert(spark, token_df, encoded):
    _, _, new = _source(spark, token_df)
    res = merge_table(new, encoded, key_col="doc_id")
    assert res["n_replaced"] == 0 and res["delete_file"] is None
    assert decode_table(spark, encoded).count() == N_DOCS + new.count()
    assert dl.visible_delete_files(encoded) == []


def test_merge_replace_all(spark, token_df, encoded):
    import pyspark.sql.functions as F

    src = token_df.withColumn("source", F.lit("v2"))
    res = merge_table(src, encoded, key_col="doc_id")
    assert res["n_replaced"] == N_DOCS
    got = decode_table(spark, encoded)
    assert got.count() == N_DOCS
    assert got.filter(F.col("source") == "v2").count() == N_DOCS


def test_merge_deletes_duplicate_target_keys(spark, token_df, tmp_out):
    """A key appearing in MULTIPLE target rows: all of them are replaced."""
    import pyspark.sql.functions as F

    doubled = token_df.unionByName(
        token_df.withColumn("source", F.lit("dup"))
    )
    encode_table(doubled, tmp_out, key_col="doc_id", size_col="n_tok",
                 num_partitions=5)
    one = token_df.limit(20).withColumn("source", F.lit("upserted"))
    res = merge_table(one, tmp_out, key_col="doc_id")
    assert res["n_replaced"] == 40  # both copies of each of the 20 keys
    got = decode_table(spark, tmp_out)
    assert got.count() == 2 * N_DOCS - 40 + 20
    assert got.filter(F.col("source") == "upserted").count() == 20


def test_merge_crash_before_flip_invisible_then_reclaim(
    spark, token_df, encoded, monkeypatch
):
    """Crash window: delete file written, band written, marker NOT flipped
    → nothing visible; reclaim restores the exact pre-merge state; a fresh
    merge then commits cleanly."""
    from rugo_spark import engine as eng

    src, mod, _ = _source(spark, token_df)
    real = eng._atomic_write

    def dying(path, payload):
        import json as _json

        if path.endswith(".json") and b'"complete": true' in payload.replace(
            b'"complete":true', b'"complete": true'
        ):
            raise RuntimeError("simulated crash before completion flip")
        return real(path, payload)

    monkeypatch.setattr(eng, "_atomic_write", dying)
    with pytest.raises(RuntimeError, match="simulated crash"):
        merge_table(src, encoded, key_col="doc_id")
    monkeypatch.setattr(eng, "_atomic_write", real)
    # nothing committed: no visible masks, no visible band, original rows
    assert dl.visible_delete_files(encoded) == []
    assert decode_table(spark, encoded).count() == N_DOCS
    assert metadata_agg(spark, encoded).first()["n_rows"] == N_DOCS
    # reclaim drops the band AND its riding delete file
    out = reclaim_append(encoded)
    assert len(out["reclaimed"]) == 1
    assert not os.path.isdir(os.path.join(encoded, dl.DELETES_DIR)) or not [
        n for n in os.listdir(os.path.join(encoded, dl.DELETES_DIR))
        if not n.endswith(".tmp")
    ]
    _assert_matches(decode_table(spark, encoded), token_df)
    # and a fresh merge completes
    res = merge_table(src, encoded, key_col="doc_id")
    assert res["n_replaced"] == mod.count()
    _assert_matches(decode_table(spark, encoded), _expected(token_df, src))


def test_merge_time_travel_and_rollback(spark, token_df, encoded):
    pre = mf.snapshot_log(encoded)[-1]["id"]
    src, _, _ = _source(spark, token_df)
    res = merge_table(src, encoded, key_col="doc_id")
    want_n = _expected(token_df, src).count()
    assert decode_table(spark, encoded, snapshot_id=pre).count() == N_DOCS
    assert decode_table(spark, encoded, snapshot_id=res["snapshot"]).count() == want_n
    out = mf.rollback_to_snapshot(encoded, pre)
    assert out["delete_files_removed"] == 1
    _assert_matches(decode_table(spark, encoded), token_df)


def test_merge_compact_purges(spark, token_df, encoded, tmp_path):
    src, _, _ = _source(spark, token_df)
    merge_table(src, encoded, key_col="doc_id")
    want = _expected(token_df, src)
    dst = str(tmp_path / "compacted")
    compact_dataset(spark, encoded, dst, target_bytes=1 << 20)
    assert not os.path.isdir(os.path.join(dst, dl.DELETES_DIR))
    _assert_matches(decode_table(spark, dst), want)


def test_merge_after_delete_where(spark, token_df, encoded):
    """Keys already row-deleted are NOT double-counted by a merge."""
    import pyspark.sql.functions as F

    med = token_df.approxQuantile("n_tok", [0.5], 0.0)[0]
    d = delete_where(spark, encoded, [("n_tok", "<", int(med))])
    survivors = token_df.filter(~(F.col("n_tok") < int(med)))
    src = token_df.limit(50).withColumn("source", F.lit("upserted"))
    res = merge_table(src, encoded, key_col="doc_id")
    # replaced = the subset of the 50 keys still live after the delete
    still_live = src.join(survivors.select("doc_id"), "doc_id", "left_semi")
    assert res["n_replaced"] == still_live.count()
    want = survivors.join(
        src.select("doc_id"), "doc_id", "left_anti"
    ).unionByName(src)
    _assert_matches(decode_table(spark, encoded), want)
    rows, _ = dl.deleted_totals(encoded, dl.visible_delete_files(encoded))
    assert rows == d["n_deleted"] + res["n_replaced"]


def test_merge_validation(spark, token_df, encoded):
    with pytest.raises(ValueError, match="unknown merge key"):
        merge_table(token_df, encoded, key_col="nope")
    with pytest.raises(ValueError, match="atomic"):
        merge_table(token_df, encoded, key_col="tokens")
