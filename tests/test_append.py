"""append_table: the Iceberg-append / lakehouse-ingest lifecycle op."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from rugo_spark import manifest as mf
from rugo_spark.engine import (
    APPEND_BAND,
    append_table,
    compact_dataset,
    decode_table,
    encode_table,
)
from rugo_spark.tokengen import spark_token_df


@pytest.fixture()
def base_ds(spark, tmp_path):
    out = str(tmp_path / "ds")
    d1 = spark_token_df(spark, 1500, n_partitions=3)
    encode_table(d1, out, key_col="doc_id", size_col="n_tok", num_partitions=4)
    return out


def _second(spark, n=700):
    return spark_token_df(spark, n, n_partitions=2).withColumn(
        "doc_id", F.concat_ws("-", F.lit("new"), F.col("doc_id"))
    )


def test_append_roundtrip_fresh_band(spark, base_ds):
    man = append_table(_second(spark), base_ds, sort_key="doc_id", size_col="n_tok")
    pids = [r["partition_id"] for r in man.collect()]
    assert pids and all(APPEND_BAND <= p < 2 * APPEND_BAND for p in pids)
    dec = decode_table(spark, base_ds)
    assert dec.count() == 2200
    assert dec.select("doc_id").distinct().count() == 2200
    # existing blocks untouched: base sidecars keep ids < APPEND_BAND
    base_pids = [int(r["partition_id"]) for r in mf.completed_partitions(base_ds)]
    assert sorted(p for p in base_pids if p < APPEND_BAND) == [0, 1, 2, 3]


def test_append_resume_same_band_bit_identical(spark, base_ds):
    d2 = _second(spark)
    rows1 = {r["partition_id"]: r for r in append_table(d2, base_ds, size_col="n_tok").collect()}
    victim = min(rows1)
    os.remove(mf.sidecar_path(base_ds, victim))
    os.remove(rows1[victim]["block_path"])
    survivors = {
        p: os.path.getmtime(mf.sidecar_path(base_ds, p)) for p in rows1 if p != victim
    }
    rows2 = {r["partition_id"]: r for r in append_table(d2, base_ds, size_col="n_tok").collect()}
    assert set(rows2) == set(rows1)  # same band reserved via the marker
    for p, t in survivors.items():
        assert os.path.getmtime(mf.sidecar_path(base_ds, p)) == t
    assert rows2[victim]["checksum"] == rows1[victim]["checksum"]
    assert decode_table(spark, base_ds).count() == 2200


def test_two_appends_get_disjoint_bands(spark, base_ds):
    p1 = {r["partition_id"] for r in append_table(_second(spark, 400), base_ds).collect()}
    third = spark_token_df(spark, 300, n_partitions=2).withColumn(
        "doc_id", F.concat_ws("-", F.lit("n3"), F.col("doc_id"))
    )
    p2 = {r["partition_id"] for r in append_table(third, base_ds).collect()}
    assert p1 and p2 and not (p1 & p2)
    assert min(p2) >= 2 * APPEND_BAND
    assert decode_table(spark, base_ds).count() == 2200


def test_append_schema_type_mismatch_raises(spark, base_ds):
    bad = _second(spark).withColumn("n_tok", F.col("n_tok").cast("long"))
    with pytest.raises(ValueError, match="schema mismatch"):
        append_table(bad, base_ds)


def test_append_nullability_one_way():
    from rugo_spark.engine import _append_schema_ok

    def sch(nullable, contains=True):
        return {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "string", "nullable": nullable, "metadata": {}},
                {
                    "name": "toks", "nullable": nullable, "metadata": {},
                    "type": {"type": "array", "elementType": "integer",
                             "containsNull": contains},
                },
            ],
        }

    assert _append_schema_ok(sch(True), sch(True))
    assert _append_schema_ok(sch(True), sch(False))  # stricter append: ok
    assert not _append_schema_ok(sch(False), sch(True))  # looser append: no
    assert _append_schema_ok(sch(True, True), sch(True, False))  # nested stricter
    assert not _append_schema_ok(sch(False, False), sch(False, True))  # nested looser
    # type drift is rejected regardless of nullability
    other = sch(True)
    other["fields"][0]["type"] = "bigint"
    assert not _append_schema_ok(sch(True), other)


def test_append_to_missing_dataset_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="not an existing encoded dataset"):
        append_table(_second(spark), str(tmp_path / "nope"))


def test_compact_after_append_restores_layout(spark, base_ds, tmp_path):
    append_table(_second(spark), base_ds, size_col="n_tok")
    dst = str(tmp_path / "compacted")
    compact_dataset(spark, base_ds, dst, target_bytes=64 << 20, sort_key="doc_id")
    a = decode_table(spark, dst).orderBy("doc_id").select("doc_id").toPandas()
    b = decode_table(spark, base_ds).orderBy("doc_id").select("doc_id").toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()


def test_torn_append_band_invisible_until_complete(spark, base_ds):
    """Atomic visibility: readers see NOTHING of an append band until its
    completion marker flips — old rows only, then old plus all new."""
    import json

    d2 = _second(spark)
    append_table(d2, base_ds, size_col="n_tok")
    res = mf.append_reservations(base_ds)
    assert len(res) == 1 and res[0]["complete"]
    # un-flip the marker: the on-disk state of a crash mid-append
    m = res[0]
    with open(m["_path"], "w") as f:
        json.dump({"base": m["base"], "fingerprint": m["fingerprint"]}, f)
    assert decode_table(spark, base_ds).count() == 1500  # base rows only
    from rugo_spark.engine import metadata_agg, stats_df

    assert metadata_agg(spark, base_ds).first()["n_rows"] == 1500
    assert all(int(r["partition_id"]) < APPEND_BAND for r in stats_df(spark, base_ds).collect())
    # resume with the same input completes the band and re-flips the marker
    append_table(d2, base_ds, size_col="n_tok")
    assert mf.append_reservations(base_ds)[0]["complete"]
    assert decode_table(spark, base_ds).count() == 2200


def test_append_refuses_while_another_session_incomplete(spark, base_ds):
    """Single-writer gate: a foreign incomplete reservation (crashed or
    running session) blocks new appends loudly instead of stranding or
    sharing its band."""
    import json

    d2 = _second(spark)
    append_table(d2, base_ds, size_col="n_tok")
    m = mf.append_reservations(base_ds)[0]
    with open(m["_path"], "w") as f:
        json.dump({"base": m["base"], "fingerprint": m["fingerprint"]}, f)
    third = spark_token_df(spark, 100, n_partitions=1).withColumn(
        "doc_id", F.concat_ws("-", F.lit("n3"), F.col("doc_id"))
    )
    with pytest.raises(ValueError, match="incomplete append session"):
        append_table(third, base_ds)


def test_fingerprint_sees_in_place_overwrite(spark, tmp_path):
    """Same path, different bytes → different fingerprint: re-appending an
    overwritten staging file must not silently no-op (review r4)."""
    import pyarrow.parquet as pq

    from rugo_spark.engine import _input_fingerprint
    from rugo_spark.tokengen import token_batch

    p = str(tmp_path / "feed.parquet")
    pq.write_table(token_batch(100, seed=1), p)
    fp1 = _input_fingerprint(spark.read.parquet(p))
    os.utime(p, ns=(1, 1))  # distinct mtime even on coarse filesystems
    pq.write_table(token_batch(100, seed=2), p)
    fp2 = _input_fingerprint(spark.read.parquet(p))
    assert fp1 != fp2


def test_append_schema_ignores_field_metadata():
    from rugo_spark.engine import _append_schema_ok

    a = {"type": "struct", "fields": [
        {"name": "id", "type": "string", "nullable": True, "metadata": {}}]}
    b = {"type": "struct", "fields": [
        {"name": "id", "type": "string", "nullable": True,
         "metadata": {"comment": "from iceberg"}}]}
    assert _append_schema_ok(a, b)


def test_v2_append_writer_allocates_above_reserved_bands(spark, base_ds):
    """format('rugo') mode('append') must not land pids inside a reserved
    append band — a crashed append_table resume would skip those splits."""
    import json

    append_table(_second(spark), base_ds, size_col="n_tok")
    m = mf.append_reservations(base_ds)[0]
    with open(m["_path"], "w") as f:  # make the band look in-flight
        json.dump({"base": m["base"], "fingerprint": m["fingerprint"]}, f)
    from rugo_spark.datasource import register

    register(spark)
    third = spark_token_df(spark, 80, n_partitions=1).withColumn(
        "doc_id", F.concat_ws("-", F.lit("v2"), F.col("doc_id"))
    )
    third.write.format("rugo").mode("append").save(base_ds)
    pids = [int(r["partition_id"]) for r in mf.completed_partitions(base_ds)]
    band_end = int(m["base"]) + APPEND_BAND
    new = [p for p in pids if p >= band_end]
    assert new, f"V2 append landed inside the reserved band: {sorted(pids)[-4:]}"


# ------------------------------------------------------- reclaim (VERDICT r4 #6)

def _fake_crashed_append(out_dir: str, base: int, fp: str, n_parts: int = 2) -> None:
    """On-disk state of an append that died mid-band: incomplete marker plus
    some band sidecars/blocks."""
    import json

    adir = os.path.join(out_dir, mf.APPENDS_DIR)
    os.makedirs(adir, exist_ok=True)
    with open(os.path.join(adir, f"append-{fp[:16]}.json"), "w") as f:
        json.dump({"base": base, "fingerprint": fp}, f)
    bdir = os.path.join(out_dir, mf.BLOCKS_DIR)
    os.makedirs(bdir, exist_ok=True)
    for i in range(n_parts):
        pid = base + i
        bp = os.path.join(bdir, f"part-{pid:06d}.rgb")
        with open(bp, "wb") as f:
            f.write(b"partial")
        mf.write_sidecar(out_dir, {
            "partition_id": pid, "n_rows": 5, "n_tokens": 5, "input_bytes": 5,
            "output_bytes": 7, "block_path": bp, "checksum": 0, "codecs": "{}",
        })


def test_reclaim_stale_append_rolls_back_and_unblocks(spark, base_ds):
    from rugo_spark.engine import reclaim_append

    _fake_crashed_append(base_ds, APPEND_BAND, "deadbeefcafe")
    d2 = _second(spark)
    with pytest.raises(ValueError, match="incomplete append session"):
        append_table(d2, base_ds, size_col="n_tok")
    # readers never saw the torn band
    assert decode_table(spark, base_ds).count() == 1500

    man = append_table(d2, base_ds, size_col="n_tok", reclaim_stale=True)
    pids = [r["partition_id"] for r in man.collect()]
    # the reclaimed band's ids were reusable — no permanent band leak
    assert all(APPEND_BAND <= p < 2 * APPEND_BAND for p in pids)
    dec = decode_table(spark, base_ds)
    assert dec.count() == 2200
    assert dec.select("doc_id").distinct().count() == 2200
    # zero leftovers from the crashed session
    stale_markers = [m for m in mf.append_reservations(base_ds) if not m["complete"]]
    assert not stale_markers
    assert reclaim_append.__doc__  # public API


def test_reclaim_append_fingerprint_prefix_and_no_match(spark, base_ds):
    from rugo_spark.engine import reclaim_append

    _fake_crashed_append(base_ds, APPEND_BAND, "aaaa1111bbbb2222")
    _fake_crashed_append(base_ds, 2 * APPEND_BAND, "cccc3333dddd4444")
    res = reclaim_append(base_ds, "aaaa")
    assert [r["base"] for r in res["reclaimed"]] == [APPEND_BAND]
    assert res["sidecars_deleted"] == 2 and res["blocks_deleted"] == 2
    left = [m for m in mf.append_reservations(base_ds) if not m["complete"]]
    assert len(left) == 1 and left[0]["fingerprint"].startswith("cccc")
    with pytest.raises(ValueError, match="matches"):
        reclaim_append(base_ds, "zzzz")
    res2 = reclaim_append(base_ds)  # no selector = all
    assert [r["base"] for r in res2["reclaimed"]] == [2 * APPEND_BAND]


def test_reclaim_corrupt_marker_refuses(spark, base_ds):
    from rugo_spark.engine import reclaim_append

    adir = os.path.join(base_ds, mf.APPENDS_DIR)
    os.makedirs(adir, exist_ok=True)
    with open(os.path.join(adir, "append-torn.json"), "w") as f:
        f.write("{torn")
    with pytest.raises(ValueError, match="unreadable band metadata"):
        reclaim_append(base_ds)


@pytest.mark.slow
def test_sigkill_mid_append_then_reclaim_from_second_session(spark, tmp_path):
    """The r4 verdict's done-criterion: crash an append (true SIGKILL),
    reclaim from a second session, then a FRESH append of different input —
    decode must be exactly base ∪ new rows, nothing lost or duplicated."""
    import signal
    import subprocess
    import sys
    import time

    from rugo_spark.engine import reclaim_append
    from rugo_spark.tokengen import write_token_table

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "ds")
    base_df = spark_token_df(spark, 1000, n_partitions=2)
    encode_table(base_df, out, key_col="doc_id", size_col="n_tok", num_partitions=4)
    base_ids = {r[0] for r in decode_table(spark, out).select("doc_id").collect()}

    crash_src = str(tmp_path / "crash_in.parquet")
    write_token_table(crash_src, 4000)
    job = f"""
import sys
sys.path.insert(0, {REPO!r})
import pyspark.sql.functions as F
from rugo_spark.session import get_spark
from rugo_spark.engine import append_table

spark = get_spark(master="local[2]", app_name="append_victim", shuffle_partitions=4)
df = spark.read.parquet({crash_src!r}).repartition(12).withColumn(
    "doc_id", F.concat_ws("-", F.lit("crash"), F.col("doc_id")))
append_table(df, {out!r}, sort_key="doc_id", size_col="n_tok")
spark.stop()
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", job],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    deadline = time.time() + 180
    try:
        while time.time() < deadline:
            n_band = len([
                r for r in mf.completed_partitions(out)
                if int(r["partition_id"]) >= APPEND_BAND
            ])
            if n_band >= 2:
                break
            if proc.poll() is not None:
                break
            time.sleep(0.05)
        else:
            pytest.fail("victim append produced no band sidecars within 180s")
        os.killpg(proc.pid, signal.SIGKILL)
    finally:
        proc.wait(timeout=60)

    stale = [m for m in mf.append_reservations(out) if not m["complete"]]
    if not stale:
        pytest.skip("victim finished before the kill landed — nothing to reclaim")
    # torn band invisible
    assert decode_table(spark, out).count() == 1000

    res = reclaim_append(out)
    assert res["reclaimed"]
    man = append_table(_second(spark, 600), out, sort_key="doc_id", size_col="n_tok")
    assert man.count() > 0
    dec = decode_table(spark, out)
    got_ids = {r[0] for r in dec.select("doc_id").collect()}
    want_ids = base_ids | {f"new-{r[0]}" for r in spark_token_df(spark, 600, n_partitions=2).select("doc_id").collect()}
    assert dec.count() == len(got_ids) == 1600
    assert got_ids == want_ids
