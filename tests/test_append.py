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
