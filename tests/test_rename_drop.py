"""Column rename / drop schema evolution (`rugo_spark/evolution.py` — the
Iceberg RENAME/DROP COLUMN analog, metadata-only).

Blocks are positional and every stats surface (sidecar codecs, stripe
directories, blooms, codec plans) is keyed by write-time physical names;
the dataset keeps that physical namespace forever and layers a logical
view over it.  These tests pin: reads under the new names (decode,
metadata_agg, format('rugo'), CDC, time travel), PRUNING still biting
through the translation, appends translating logical→physical with null
placeholders at dropped positions, DML on renamed columns, the
name-uniqueness and reference guards, and the view surviving compaction.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from rugo_spark import deletes as dl
from rugo_spark import evolution as evo
from rugo_spark import manifest as mf
from rugo_spark.engine import (
    append_table,
    compact_dataset,
    decode_table,
    delete_where,
    encode_table,
    merge_table,
    metadata_agg,
    set_constraint,
    update_where,
)

N = 1000


def _df(spark, n=N, start=0):
    return spark.createDataFrame(pd.DataFrame({
        "k": np.arange(start, start + n, dtype="int64"),
        "v": (np.arange(start, start + n, dtype="int64") * 3) % 97,
        "s": [f"s-{i:06d}" for i in range(start, start + n)],
    }))


@pytest.fixture()
def ds(spark, tmp_path):
    out = str(tmp_path / "ds")
    encode_table(_df(spark), out, key_col="k", num_partitions=4)
    return out


def test_rename_decode_filters_and_stats(spark, ds):
    evo.rename_column(ds, "v", "value")
    got = decode_table(spark, ds)
    assert got.columns == ["k", "value", "s"]
    assert got.count() == N
    # filters under the NEW name work and still plan against physical stats
    assert decode_table(spark, ds, filters=[("value", "=", 0)]).count() == \
        int((np.arange(N) * 3 % 97 == 0).sum())
    # projection under the new name
    assert decode_table(spark, ds, columns=["value"]).columns == ["value"]
    # the old name is gone
    with pytest.raises(ValueError, match="unknown column 'v'"):
        decode_table(spark, ds, filters=[("v", "=", 0)]).count()
    # metadata stats surface under the new name
    agg = metadata_agg(spark, ds, columns=["value"]).first()
    assert agg["min_value"] == 0 and agg["max_value"] == 96
    # pruning on the SORT key still bites end-to-end after renaming it
    evo.rename_column(ds, "k", "key_id")
    lookup = decode_table(spark, ds, filters=[("key_id", "=", 17)])
    assert [r["key_id"] for r in lookup.collect()] == [17]


def test_rename_append_and_dml(spark, ds):
    evo.rename_column(ds, "v", "value")
    # append speaks the logical schema
    append_table(_df(spark, n=200, start=N).withColumnRenamed("v", "value"), ds)
    assert decode_table(spark, ds).count() == N + 200
    # appending under the OLD name fails loudly
    with pytest.raises(ValueError, match="lacks dataset column 'value'"):
        append_table(_df(spark, n=10, start=9000), ds)
    # DELETE on the renamed column
    res = delete_where(spark, ds, [("value", "=", 0)])
    assert res["n_deleted"] > 0
    assert decode_table(spark, ds, filters=[("value", "=", 0)]).count() == 0
    # UPDATE filtering and assigning through the new name
    upd = update_where(spark, ds, [("value", "=", 1)], {"value": "value + 1000"})
    assert upd["n_updated"] > 0
    got = decode_table(spark, ds).toPandas()
    assert (got["value"] != 1).all() and (got["value"] == 1001).any()
    # MERGE on a renamed key
    import pyspark.sql.functions as F

    evo.rename_column(ds, "k", "key_id")
    src = decode_table(spark, ds).filter("key_id < 5") \
        .withColumn("s", F.lit("upserted"))
    m = merge_table(src, ds, key_col="key_id")
    assert m["n_replaced"] == src.count()
    assert decode_table(spark, ds).filter("s = 'upserted'").count() == src.count()


def test_drop_hides_and_appends_placeholder(spark, ds):
    evo.drop_column(ds, "s")
    got = decode_table(spark, ds)
    assert got.columns == ["k", "v"]
    # appends no longer carry the dropped column
    append_table(_df(spark, n=100, start=N).drop("s"), ds)
    assert decode_table(spark, ds).count() == N + 100
    # re-adding the same LOGICAL name makes a FRESH column; the dropped
    # data never resurfaces (physical names are permanent → fresh physical
    # would collide, so the logical name needs a fresh spelling)
    with pytest.raises(ValueError, match="collides with a historical"):
        append_table(_df(spark, n=50, start=N + 100), ds,
                     allow_new_columns=True)
    # metadata_agg excludes the dropped column by default
    row = metadata_agg(spark, ds).first().asDict()
    assert not any(c.endswith("_s") for c in row)


def test_rename_then_drop_then_evolve(spark, ds):
    evo.rename_column(ds, "s", "text")
    evo.drop_column(ds, "text")
    import pyspark.sql.functions as F

    append_table(
        _df(spark, n=100, start=N).drop("s")
        .withColumn("extra", (F.col("v") / F.lit(2.0))),  # nullable double
        ds, allow_new_columns=True,
    )
    got = decode_table(spark, ds)
    assert got.columns == ["k", "v", "extra"]
    assert got.filter("extra IS NULL").count() == N  # pre-evolution rows
    # the view covers the widened tail; rename the fresh column too
    evo.rename_column(ds, "extra", "quality")
    assert decode_table(spark, ds).columns == ["k", "v", "quality"]


def test_guards(spark, ds):
    with pytest.raises(ValueError, match="already used"):
        evo.rename_column(ds, "v", "k")
    evo.rename_column(ds, "v", "value")
    with pytest.raises(ValueError, match="already used"):
        evo.rename_column(ds, "s", "v")  # historical physical name
    with pytest.raises(ValueError, match="unknown column"):
        evo.rename_column(ds, "v", "w")  # old name no longer resolves
    evo.rename_column(ds, "value", "v")  # rename BACK to physical is fine
    assert decode_table(spark, ds).columns == ["k", "v", "s"]
    set_constraint(ds, "v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        evo.rename_column(ds, "v", "vv")
    with pytest.raises(ValueError, match="CHECK constraint"):
        evo.drop_column(ds, "v")
    evo.rename_column(ds, "s", "text")
    with pytest.raises(ValueError, match="renamed column"):
        set_constraint(ds, "text_nonempty", "length(text) > 0")
    evo.drop_column(ds, "k")
    evo.drop_column(ds, "text")
    with pytest.raises(ValueError, match="last remaining"):
        evo.drop_column(ds, "v")


def test_size_col_drop_refused(spark, tmp_path):
    from rugo_spark.tokengen import token_batch

    out = str(tmp_path / "tok")
    encode_table(spark.createDataFrame(token_batch(200).to_pandas()), out,
                 key_col="doc_id", size_col="n_tok", num_partitions=2)
    with pytest.raises(ValueError, match="size column"):
        evo.drop_column(out, "n_tok")
    # renaming the size column is fine: readers speak logical, the payload
    # keeps the physical pointer, token accounting stays exact
    evo.rename_column(out, "n_tok", "token_count")
    res = delete_where(spark, out, [("token_count", ">", 0)])
    assert res["n_deleted"] == 200
    assert metadata_agg(spark, out).first()["n_tokens"] == 0


def test_format_rugo_reads_logical_and_refuses_append(spark, ds):
    from rugo_spark.datasource import register

    register(spark)
    evo.rename_column(ds, "v", "value")
    evo.drop_column(ds, "s")
    df = spark.read.format("rugo").load(ds)
    assert df.columns == ["k", "value"]
    assert df.count() == N
    assert df.filter("value = 0").count() == int((np.arange(N) * 3 % 97 == 0).sum())
    with pytest.raises(Exception, match="renamed/dropped"):
        decode_table(spark, ds).limit(5).write.format("rugo").mode("append").save(ds)


def test_view_survives_compaction_and_time_travel(spark, ds, tmp_path):
    evo.rename_column(ds, "v", "value")
    append_table(_df(spark, n=100, start=N).withColumnRenamed("v", "value"), ds)
    # time travel reads history under the CURRENT logical view
    tt = decode_table(spark, ds, snapshot_id=1)
    assert tt.columns == ["k", "value", "s"] and tt.count() == N
    dst = str(tmp_path / "compacted")
    compact_dataset(spark, ds, dst, target_bytes=1 << 20)
    got = decode_table(spark, dst)
    assert got.columns == ["k", "value", "s"]
    assert got.count() == N + 100
    # CDC surfaces logical names too
    from rugo_spark.engine import read_changes

    ch = read_changes(spark, ds, 1)
    assert ch.columns == ["k", "value", "s", "_change_type"]
    assert ch.filter("_change_type = 'insert'").count() == 100


def test_resume_preserves_payload_state(spark, tmp_path):
    """Re-running the same encode (resume no-op) must not blow away
    constraints / the column view a user added after the first run."""
    src = str(tmp_path / "src.parquet")
    _df(spark).write.parquet(src)
    out = str(tmp_path / "ds")
    encode_table(spark.read.parquet(src), out, key_col="k", num_partitions=4)
    set_constraint(out, "v_nonneg", "v >= 0")
    evo.rename_column(out, "s", "text")
    encode_table(spark.read.parquet(src), out, key_col="k", num_partitions=4)
    payload = mf.read_schema_payload(out)
    assert payload.get("constraints") == {"v_nonneg": "v >= 0"}
    assert decode_table(spark, out).columns == ["k", "v", "text"]


def test_evolution_refuses_inflight_append(spark, ds):
    """An EVOLVING append widens the schema payload outside evolution's
    lock; a rename landing in that window would be silently lost — so
    evolution refuses while any append reservation is incomplete."""
    import json as _json
    import os

    adir = os.path.join(ds, mf.APPENDS_DIR)
    os.makedirs(adir, exist_ok=True)
    marker = os.path.join(adir, "append-deadbeef00000000.json")
    with open(marker, "w") as f:
        _json.dump({"base": 1_000_000, "fingerprint": "deadbeef"}, f)
    try:
        with pytest.raises(ValueError, match="in-flight"):
            evo.rename_column(ds, "v", "value")
        with pytest.raises(ValueError, match="in-flight"):
            evo.drop_column(ds, "s")
    finally:
        os.remove(marker)
    evo.rename_column(ds, "v", "value")  # clear again → allowed
