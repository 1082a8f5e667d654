"""Regression pins for the ops/meta-module review findings (pass 4)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F


def test_range_join_left_keeps_unmatched_points(spark):
    from rugo_spark.ops.joins import range_join

    pts = spark.createDataFrame(pd.DataFrame({"pid": [1, 2], "v": [5.0, 99.0]}))
    ivs = spark.createDataFrame(pd.DataFrame({"iid": [10], "lo": [0.0], "hi": [10.0]}))
    out = range_join(pts, ivs, "v", "lo", "hi", bucket_size=7.0, how="left")
    rows = {r["pid"]: r for r in out.collect()}
    assert rows[1]["iid"] == 10
    assert rows[2]["iid"] is None and rows[2]["lo"] is None  # unmatched survives
    inner = range_join(pts, ivs, "v", "lo", "hi", bucket_size=7.0).collect()
    assert len(inner) == 1


def test_packing_null_tokens_treated_as_empty(spark):
    from rugo_spark.ops.packing import pack_sequences

    df = spark.createDataFrame(
        [("a", [1, 2, 3], 3), ("b", None, 0), ("c", [4, 5], 2)],
        schema="doc_id string, tokens array<int>, n_tok int",
    )
    packed = pack_sequences(df, seq_len=8, num_partitions=1, eos_id=99)
    total = packed.agg(F.sum(F.size(F.filter("tokens", lambda t: t != 99)))).first()[0]
    assert total == 5  # null doc contributes nothing


def test_frame_sample_zero_frame_video(spark):
    from rugo_spark.ops.multimodal import frame_sample_plan

    df = spark.createDataFrame(
        [("v1", "video/mp4", 25), ("v2", "video/mp4", 0), ("v3", "video/mp4", None)],
        schema="asset_id string, media_type string, n_frames int",
    )
    got = frame_sample_plan(df, every_n=10).groupBy("asset_id").count().collect()
    assert {r["asset_id"]: r["count"] for r in got} == {"v1": 3}  # 0, 10, 20


def test_empty_text_counts_zero_tokens(spark):
    from rugo_spark.ops.textstats import quality_features, token_counts

    df = spark.createDataFrame(
        [(1, "two words"), (2, ""), (3, "   ")], schema="doc_id long, text string"
    )
    tc = {r["doc_id"]: r["n_ws_tokens"] for r in token_counts(df).collect()}
    assert tc == {1: 2, 2: 0, 3: 0}
    qf = {r["doc_id"]: r["n_words"] for r in quality_features(df).collect()}
    assert qf[2] == 0


def test_fingerprint_long_doc_matches_oracle(spark):
    from rugo_spark.oracle_recompute import fingerprint_row
    from rugo_spark.ops.textstats import fingerprint

    long_doc = ("The quick brown fox %d. " * 9000)[: (1 << 16) + 12345]  # > LONG
    short_doc = "hello world"
    df = spark.createDataFrame(
        [(1, short_doc), (2, long_doc)], schema="doc_id long, text string"
    )
    got = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert got[1] == fingerprint_row(short_doc)
    assert got[2] == fingerprint_row(long_doc)  # closed form ≡ Horner fold


def test_schema_convert_unknown_nullcount_is_nullable():
    from rugo_spark.schema_convert import metadata_to_spark_schema

    md = {
        "num_rows": 1,
        "row_groups": [
            {
                "num_rows": 1,
                "columns": [
                    {"name": "a", "type": "int64", "logical_type": "int64",
                     "null_count": None},
                    {"name": "b", "type": "int64", "logical_type": "int64",
                     "null_count": 0},
                ],
            }
        ],
    }
    st = metadata_to_spark_schema(md)
    by = {f.name: f for f in st.fields}
    assert by["a"].nullable is True  # no stats → unknown → nullable
    assert by["b"].nullable is False


def test_parquet_meta_empty_extras_dict():
    from rugo_spark.parquet_meta import _from_parquet_file
    import pyarrow.parquet as pq
    import pyarrow as pa
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.parquet")
        pq.write_table(pa.table({"x": [1, 2]}), p)
        # {} extras (ColumnChunk without meta_data) must degrade to None
        md = _from_parquet_file(pq.ParquetFile(p), [[{}]])
        col = md["row_groups"][0]["columns"][0]
        assert col["bloom_offset"] is None and col["key_value_metadata"] is None
