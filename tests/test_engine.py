"""End-to-end encode → decode parity tests (the SURVEY §5 oracle pattern:
differential comparison against the Arrow/Parquet reference read, per-row
token-array equality — cf. reference ``tests/test_statistics.py:68-94``)."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from rugo_spark import manifest as mf
from rugo_spark.engine import decode_table, encode_table, manifest_df
from rugo_spark.tokengen import spark_token_df, token_batch

N_DOCS = 2000


@pytest.fixture(scope="module")
def token_df(spark):
    df = spark.createDataFrame(token_batch(N_DOCS).to_pandas())
    return df.cache()


def _sorted_pandas(df, key):
    pdf = df.toPandas().sort_values(key).reset_index(drop=True)
    return pdf


def test_encode_decode_tokens_bit_identical(spark, token_df, tmp_out):
    man = encode_table(token_df, tmp_out, key_col="doc_id", size_col="n_tok", num_partitions=7)
    assert man.count() == 7
    out = decode_table(spark, tmp_out)
    got = _sorted_pandas(out, "doc_id")
    want = _sorted_pandas(token_df, "doc_id")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_tok"].tolist() == want["n_tok"].tolist()
    assert got["source"].tolist() == want["source"].tolist()
    # per-row token-array equality — the north-rule invariant
    for g, w in zip(got["tokens"].values, want["tokens"].values):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_compressed_size_beats_reference_parquet(spark, token_df, tmp_out, tmp_path):
    """north rule: compressed size ≤ reference-encoded Parquet footprint."""
    ref = str(tmp_path / "ref.parquet")
    token_batch(N_DOCS)  # noqa — same data as token_df
    import pyarrow.parquet as pq

    pq.write_table(token_batch(N_DOCS), ref, compression="zstd")
    encode_table(token_df, tmp_out, key_col="doc_id", size_col="n_tok", num_partitions=4)
    ours = sum(
        os.path.getsize(os.path.join(tmp_out, mf.BLOCKS_DIR, f))
        for f in os.listdir(os.path.join(tmp_out, mf.BLOCKS_DIR))
    )
    theirs = os.path.getsize(ref)
    assert ours <= theirs * 1.0, f"ours={ours} theirs={theirs}"


def test_resume_skips_completed(spark, token_df, tmp_out):
    man1 = encode_table(token_df, tmp_out, key_col="doc_id", size_col="n_tok", num_partitions=6)
    rows1 = {r["partition_id"]: r for r in man1.collect()}
    # simulate crash: delete two sidecars + one block
    victim = rows1[0]
    os.remove(mf.sidecar_path(tmp_out, 0))
    os.remove(mf.sidecar_path(tmp_out, 3))
    os.remove(victim["block_path"])
    before = {p: os.path.getmtime(mf.sidecar_path(tmp_out, p)) for p in rows1 if p not in (0, 3)}
    man2 = encode_table(token_df, tmp_out, key_col="doc_id", size_col="n_tok", num_partitions=6)
    rows2 = {r["partition_id"]: r for r in man2.collect()}
    assert set(rows2) == set(rows1)
    # untouched partitions were NOT re-encoded
    for p, t in before.items():
        assert os.path.getmtime(mf.sidecar_path(tmp_out, p)) == t
    # re-encoded partitions are bit-identical (deterministic blocks)
    for p in (0, 3):
        assert rows2[p]["checksum"] == rows1[p]["checksum"]
        assert rows2[p]["output_bytes"] == rows1[p]["output_bytes"]
    out = decode_table(spark, tmp_out)
    assert out.count() == N_DOCS


def test_decode_column_pruning(spark, token_df, tmp_out):
    encode_table(token_df, tmp_out, key_col="doc_id", size_col="n_tok", num_partitions=3)
    out = decode_table(spark, tmp_out, columns=["doc_id", "n_tok"])
    assert out.columns == ["doc_id", "n_tok"]
    assert out.count() == N_DOCS


def test_manifest_lineage_fields(spark, token_df, tmp_out):
    man = encode_table(token_df, tmp_out, key_col="doc_id", size_col="n_tok", num_partitions=5)
    rows = man.collect()
    assert {r["partition_id"] for r in rows} == set(range(5))
    for r in rows:
        assert r["n_rows"] > 0 and r["output_bytes"] > 0 and r["input_bytes"] > 0
        assert os.path.exists(r["block_path"])
        codecs = json.loads(r["codecs"])
        assert set(codecs) == {"doc_id", "tokens", "n_tok", "source"}
        assert codecs["tokens"]["codec"] in {"for", "dict", "plain", "rle", "delta", "bss"}
    # size balance: token mass per partition within 3.5x of each other
    masses = sorted(r["n_tokens"] for r in rows)
    assert masses[0] > 0 and masses[-1] / masses[0] < 3.5, masses


def test_rugo_parity_read_manifest(spark, token_df, tmp_out):
    encode_table(token_df, tmp_out, key_col="doc_id", size_col="n_tok", num_partitions=2)
    meta = mf.read_manifest(tmp_out)
    assert meta["num_rows"] == N_DOCS
    assert len(meta["row_groups"]) == 2
    col = meta["row_groups"][0]["columns"][1]
    assert col["name"] == "tokens"
    assert col["total_compressed_size"] > 0
    assert isinstance(col["encodings"], list)
    names = {s["name"] for s in meta["schema"]}
    assert names == {"doc_id", "tokens", "n_tok", "source"}


def test_distributed_tokengen(spark):
    df = spark_token_df(spark, 500, n_partitions=4)
    assert df.count() == 500
    ids = [r[0] for r in df.select("doc_id").orderBy("doc_id").limit(3).collect()]
    assert ids == ["doc-000000000000", "doc-000000000001", "doc-000000000002"]


def test_decode_block_pruning_with_filters(spark, token_df, tmp_out):
    """min/max stats in the manifest skip whole blocks (rugo's external
    min/max pruning pattern), and the residual filter is exact."""
    encode_table(token_df, tmp_out, key_col="doc_id", size_col="n_tok", num_partitions=8)
    rows = mf.completed_partitions(tmp_out)
    # partitioning is by n_tok quantile bucket → n_tok ranges are disjoint-ish
    threshold = sorted(json.loads(r["codecs"])["n_tok"]["max"] for r in rows)[3]
    pruned = decode_table(spark, tmp_out, filters=[("n_tok", ">", threshold)])
    full = decode_table(spark, tmp_out)
    want = full.filter(full.n_tok > threshold)
    assert pruned.count() == want.count()
    got_sum = pruned.agg({"n_tok": "sum"}).first()[0]
    want_sum = want.agg({"n_tok": "sum"}).first()[0]
    assert got_sum == want_sum
    kept = [
        r for r in rows
        if json.loads(r["codecs"])["n_tok"]["max"] > threshold
    ]
    assert len(kept) < len(rows)  # blocks actually skipped


def test_encode_with_null_sizes_and_empty_df(spark, tmp_out):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(50)],
            "n_tok": [None if i % 5 == 0 else i for i in range(50)],
            "val": list(range(50)),
        }
    )
    df = spark.createDataFrame(pdf.astype({"val": "int64"}))
    man = encode_table(df, tmp_out, key_col="doc_id", size_col="n_tok", num_partitions=3)
    assert man.agg({"n_rows": "sum"}).first()[0] == 50  # null sizes not dropped
    out = decode_table(spark, tmp_out)
    assert out.count() == 50
    assert out.filter(out.n_tok.isNull()).count() == 10


def test_maponly_encode_roundtrip(spark, token_df, tmp_out):
    from rugo_spark.engine import encode_table_maponly

    src = token_df.repartition(5)
    man = encode_table_maponly(src, tmp_out, sort_key="doc_id", size_col="n_tok")
    assert man.count() >= 1
    out = decode_table(spark, tmp_out)
    assert out.count() == N_DOCS
    got = _sorted_pandas(out.select("doc_id", "n_tok"), "doc_id")
    want = _sorted_pandas(token_df.select("doc_id", "n_tok"), "doc_id")
    assert got["n_tok"].tolist() == want["n_tok"].tolist()
    # map-only: the encoder adds no shuffle beyond the input's own lineage
    base_plan = src._jdf.queryExecution().executedPlan().toString()
    enc_plan = src.mapInArrow(lambda it: it, src.schema)._jdf.queryExecution().executedPlan().toString()
    assert enc_plan.count("Exchange") == base_plan.count("Exchange")


def test_user_partition_id_column_survives(spark, tmp_out):
    import pandas as pd

    pdf = pd.DataFrame({"partition_id": [9, 9, 7], "k": ["a", "b", "c"], "n_tok": [3, 4, 5]})
    df = spark.createDataFrame(pdf)
    encode_table(df, tmp_out, key_col="k", size_col="n_tok", num_partitions=2)
    out = decode_table(spark, tmp_out).toPandas().sort_values("k")
    assert out["partition_id"].tolist() == [9, 9, 7]  # user column untouched


def test_all_testdata_tables_roundtrip(spark, tmp_path):
    """Every provided table encodes and decodes losslessly."""
    import pyspark.sql.functions as F

    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        out = str(tmp_path / f"rt_{t}")
        key = df.columns[0]
        encode_table(df, out, key_col=key, num_partitions=2)
        back = decode_table(spark, out)
        assert back.count() == df.count(), t
        assert back.schema == df.schema, t
        assert back.exceptAll(df).count() == 0, t
        assert df.exceptAll(back).count() == 0, t


def test_precombine_encode_roundtrip_and_resume(spark, token_df, tmp_out):
    man = encode_table(
        token_df, tmp_out, key_col="doc_id", size_col="n_tok",
        num_partitions=6, precombine=True,
    )
    rows1 = {r["partition_id"]: r for r in man.collect()}
    assert set(rows1) == set(range(6))
    out = decode_table(spark, tmp_out)
    got = _sorted_pandas(out, "doc_id")
    want = _sorted_pandas(token_df, "doc_id")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    for g, w in zip(got["tokens"].values, want["tokens"].values):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # min/max survive stripe merging → pruning still works
    import json as _json

    codecs = _json.loads(rows1[0]["codecs"])
    assert codecs["n_tok"]["min"] is not None and codecs["n_tok"]["max"] is not None
    # resume: drop one sidecar+block, re-run, identical checksum
    os.remove(mf.sidecar_path(tmp_out, 2))
    os.remove(rows1[2]["block_path"])
    man2 = encode_table(
        token_df, tmp_out, key_col="doc_id", size_col="n_tok",
        num_partitions=6, precombine=True,
    )
    rows2 = {r["partition_id"]: r for r in man2.collect()}
    assert rows2[2]["checksum"] == rows1[2]["checksum"]
    assert rows2[2]["n_rows"] == rows1[2]["n_rows"]


def test_stats_df_and_epoch_append(spark, token_df, tmp_out):
    from rugo_spark.engine import decode_dataset, encode_epoch, stats_df

    half = N_DOCS // 2
    a = token_df.limit(half)
    b = token_df.exceptAll(a)
    encode_epoch(a, tmp_out, epoch=0, key_col="doc_id", size_col="n_tok", num_partitions=3)
    encode_epoch(b, tmp_out, epoch=1, key_col="doc_id", size_col="n_tok", num_partitions=3)
    out = decode_dataset(spark, tmp_out)
    assert out.count() == N_DOCS
    assert out.select("doc_id").distinct().count() == N_DOCS
    s = stats_df(spark, os.path.join(tmp_out, "epoch=0"))
    rows = s.collect()
    assert {r["column"] for r in rows} == {"doc_id", "tokens", "n_tok", "source"}
    ntok = [r for r in rows if r["column"] == "n_tok"]
    assert all(r["min"] is not None and r["max"] is not None for r in ntok)
    assert all(r["enc_bytes"] > 0 for r in rows)


def test_bloom_point_lookup_pruning(spark, token_df, tmp_out):
    """The capability the reference declared but never implemented
    (rugo metadata.hpp:79-80): bloom-filter block skipping on point lookups."""
    from rugo_spark import bloom as bl

    encode_table(token_df, tmp_out, key_col="doc_id", size_col="n_tok", num_partitions=8)
    rows = mf.completed_partitions(tmp_out)
    assert all(r.get("bloom") for r in rows)
    # present key: exactly the blocks whose bloom admits it are scanned; row found
    got = decode_table(spark, tmp_out, filters=[("doc_id", "=", "doc-000000000042")])
    assert got.count() == 1
    # absent key: every block pruned driver-side → zero tasks
    kept = [r for r in rows if bl.might_contain(r["bloom"], "doc-999999999999")]
    assert len(kept) <= 1  # fp rate ~0 at this size
    miss = decode_table(spark, tmp_out, filters=[("doc_id", "=", "doc-999999999999")])
    assert miss.count() == 0


def test_bloom_unit():
    import pyarrow as pa

    from rugo_spark import bloom as bl

    arr = pa.array([f"key-{i}" for i in range(5000)])
    b = bl.build(arr)
    assert all(bl.might_contain(b, f"key-{i}") for i in range(0, 5000, 97))
    fps = sum(bl.might_contain(b, f"other-{i}") for i in range(1000))
    assert fps < 20
    ints = pa.array(list(range(1000)), type=pa.int64())
    bi = bl.build(ints)
    assert bl.might_contain(bi, 999) and not bl.might_contain(bi, 12345)
    u = bl.union([b, bi])
    assert bl.might_contain(u, "key-1") and bl.might_contain(u, 999)


def test_decode_checksum_verification(spark, token_df, tmp_out):
    man = encode_table(token_df, tmp_out, key_col="doc_id", size_col="n_tok", num_partitions=3)
    victim = man.collect()[0]["block_path"]
    assert decode_table(spark, tmp_out, verify_checksums=True).count() == N_DOCS
    # corrupt one byte mid-file → verified decode must fail loudly
    with open(victim, "r+b") as f:
        f.seek(100)
        b = f.read(1)
        f.seek(100)
        f.write(bytes([b[0] ^ 0xFF]))
    import pytest as _pytest

    with _pytest.raises(Exception, match="checksum mismatch"):
        decode_table(spark, tmp_out, verify_checksums=True).count()


def test_io_roundtrip_and_missing_dataset_error(spark, tmp_path):
    from rugo_spark.io import read_table, write_table

    df = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    p = str(tmp_path / "io_rt")
    write_table(df, p)
    assert read_table(spark, p).count() == df.count()
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="not an encoded dataset"):
        decode_table(spark, str(tmp_path / "nope"))


def test_blocks_invariant_to_input_partitioning(spark, token_df, tmp_path):
    """Grouped encode output is a pure function of (data, num_partitions):
    input split layout must not change a single output byte (this is what
    makes resume + re-runs on different cluster sizes reproducible)."""
    outs = {}
    for tag, nparts in [("a", 3), ("b", 11)]:
        out = str(tmp_path / tag)
        encode_table(
            token_df.repartition(nparts), out,
            key_col="doc_id", size_col="n_tok", num_partitions=5,
        )
        outs[tag] = {r["partition_id"]: r["checksum"] for r in mf.completed_partitions(out)}
    assert outs["a"] == outs["b"]
