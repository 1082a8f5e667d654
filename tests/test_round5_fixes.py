"""Round-5 regression tests: ADVICE_r04 findings."""

from __future__ import annotations

import json
import os
import warnings
from decimal import Decimal

import pyarrow as pa
import pytest


# --------------------------------------------------------------- ADVICE medium:
# float probes were Decimal-normalized unconditionally; a float64 bloom column
# renders '1e+20' on the build side but the probe rendered
# '100000000000000000000' — bloom false negatives silently dropped blocks.


@pytest.mark.parametrize("v", [1e20, 1e-10, 1.5, 1.0, 0.1, 123456.789])
def test_bloom_float_column_float_probe(v):
    from rugo_spark import bloom

    b = bloom.build(pa.array([v, 42.5], type=pa.float64()))
    assert bloom.might_contain(b, v), f"false negative for float {v!r}"


@pytest.mark.parametrize("v", ["1.50", "100.00", "0.001"])
def test_bloom_decimal_column_probes_still_match(v):
    from rugo_spark import bloom

    # decimal column at storage scale; probe with Decimal AND float forms
    b = bloom.build(pa.array([Decimal(v)], type=pa.decimal128(10, 3)))
    assert bloom.might_contain(b, Decimal(v))
    assert bloom.might_contain(b, float(v))


def test_bloom_float_column_decimal_probe():
    from rugo_spark import bloom

    # user probes a float column with a Decimal — second rendering must hit
    b = bloom.build(pa.array([1e20, 2.5], type=pa.float64()))
    assert bloom.might_contain(b, Decimal("1E+20"))


def test_bloom_absent_value_still_excluded():
    from rugo_spark import bloom

    b = bloom.build(pa.array([1.5, 2.5, 1e20], type=pa.float64()))
    # multi-rendering OR must not destroy the skip capability
    assert not bloom.might_contain(b, 999.25)
    assert not bloom.might_contain(b, Decimal("77.125"))


def test_bloom_probe_renderings_dedup_and_shapes():
    from rugo_spark.bloom import _probe_renderings

    # identical renderings collapse; divergent ones both present
    assert _probe_renderings(1.5) == [b"1.5"]
    rs = _probe_renderings(1e20)
    assert b"1e+20" in rs and b"100000000000000000000" in rs
    assert _probe_renderings(b"\xff\x00") == [b"\xff\x00"]
    assert _probe_renderings("abc") == [b"abc"]


# --------------------------------------------------------------- ADVICE low:
# nulls_ok recursed into 'metadata' — list values of differing lengths in
# field metadata rejected a schema-identical append.


def test_append_schema_ok_ignores_metadata_subtrees():
    from rugo_spark.engine import _append_schema_ok

    ds = {
        "type": "struct",
        "fields": [
            {
                "name": "a",
                "type": "integer",
                "nullable": True,
                "metadata": {"tags": ["x", "y", "z"], "note": {"nullable": False}},
            }
        ],
    }
    inc = {
        "type": "struct",
        "fields": [
            {
                "name": "a",
                "type": "integer",
                "nullable": True,
                "metadata": {"tags": ["only-one"], "other": [1, 2]},
            }
        ],
    }
    assert _append_schema_ok(ds, inc)


def test_append_schema_ok_still_rejects_null_loosening():
    from rugo_spark.engine import _append_schema_ok

    ds = {"type": "struct",
          "fields": [{"name": "a", "type": "integer", "nullable": False,
                      "metadata": {}}]}
    inc = {"type": "struct",
           "fields": [{"name": "a", "type": "integer", "nullable": True,
                       "metadata": {}}]}
    assert not _append_schema_ok(ds, inc)
    # tightening stays fine
    assert _append_schema_ok(inc, ds)


# --------------------------------------------------------------- ADVICE low:
# connected_components' non-convergence path referenced n_changed unbound when
# max_iter <= 0 and used a bare stderr print.


def test_connected_components_max_iter_zero_warns(spark):
    from rugo_spark.ops.dedup import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a int, id_b int")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        # local_edge_limit=0 forces the iterative loop (r6: small edge sets
        # route to the single-task union-find, which always converges — the
        # warning under test belongs to the loop path)
        out = connected_components(edges, max_iter=0, local_edge_limit=0)
        out.collect()  # materialize — no NameError
    assert any("did not converge" in str(w.message) for w in rec)


def test_connected_components_converged_no_warning(spark):
    from rugo_spark.ops.dedup import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a int, id_b int")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = {tuple(r) for r in connected_components(edges).collect()}
    assert not any("did not converge" in str(w.message) for w in rec)
    assert out == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


# --------------------------------------------------------------- ADVICE low:
# RugoWriter append offset had no int32 overflow guard (append_table raises at
# the same boundary).


def test_datasource_append_offset_overflow_guard(tmp_path, monkeypatch):
    from rugo_spark import datasource as dsrc
    from rugo_spark import manifest as mf

    out = str(tmp_path / "ds")
    os.makedirs(os.path.join(out, mf.BLOCKS_DIR), exist_ok=True)

    monkeypatch.setattr(
        mf, "completed_partitions", lambda d: [{"partition_id": 2**31 - 1}]
    )
    monkeypatch.setattr(mf, "append_reservations", lambda d: [])

    w = object.__new__(dsrc.RugoWriter)
    w.out_dir = out
    w.overwrite = False
    w.staging = str(tmp_path / "staging")
    w._arrow_schema_bytes = pa.schema([("a", pa.int64())]).serialize().to_pybytes()
    w._schema_json = json.dumps({"type": "struct", "fields": []})

    class Msg:
        sidecar = json.dumps({"partition_id": 0, "block_path": "/nonexistent"})

    with pytest.raises(ValueError, match="int32"):
        w.commit([Msg()])


# --------------------------------------------------------------- ADVICE low:
# encode_table_sorted's resume fingerprint was path-only — an in-place
# overwrite of a same-named input read as 'same input'.


def test_sorted_fingerprint_uses_stat_signature(spark, tmp_path):
    import time

    from rugo_spark.engine import _files_signature

    src = tmp_path / "in.parquet"
    spark.range(10).toDF("k").write.mode("overwrite").parquet(str(src))
    df1 = spark.read.parquet(str(src))
    sig1 = _files_signature(df1)
    assert all(len(s) == 3 for s in sig1), "local files must carry size+mtime"

    time.sleep(0.05)
    spark.range(20).toDF("k").write.mode("overwrite").parquet(str(src))
    df2 = spark.read.parquet(str(src))
    sig2 = _files_signature(df2)
    assert sig1 != sig2, "in-place overwrite must change the signature"


_FP_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from rugo_spark.session import get_spark
from rugo_spark.engine import _input_fingerprint
spark = get_spark(master="local[2]")
df = spark.read.parquet({src!r}).filter("n_tok > 0").repartition(3)
print("FP=" + _input_fingerprint(df))
spark.stop()
"""


def test_input_fingerprint_stable_across_jvms(tmp_path):
    """df.semanticHash() is the JVM hashCode of the canonicalized plan and
    differs between JVM instances for the SAME parquet read (measured), so a
    fingerprint built on it breaks every cross-process crash-resume match —
    the resume session sees its own crashed append as a foreign writer and
    refuses.  The fingerprint must hash the canonicalized plan *string*
    instead, which is cross-JVM stable."""
    import subprocess
    import sys as _sys

    from rugo_spark.tokengen import write_token_table

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = str(tmp_path / "tokens.parquet")
    write_token_table(src, 200)
    fps = []
    for _ in range(2):
        proc = subprocess.run(
            [_sys.executable, "-c", _FP_SCRIPT.format(repo=repo, src=src)],
            capture_output=True,
            timeout=300,
        )
        assert proc.returncode == 0, proc.stderr.decode()[-800:]
        line = [l for l in proc.stdout.decode().splitlines() if l.startswith("FP=")]
        assert line, proc.stdout.decode()[-400:]
        fps.append(line[0])
    assert fps[0] == fps[1], f"fingerprint not cross-JVM stable: {fps}"


def test_plan_signature_sees_plan_changes(spark, tmp_path):
    """The stable signature must still distinguish different plans over the
    same files (the reason semanticHash was there at all)."""
    from rugo_spark.engine import _plan_signature
    from rugo_spark.tokengen import write_token_table

    src = str(tmp_path / "tokens.parquet")
    write_token_table(src, 200)
    base = spark.read.parquet(src)
    assert _plan_signature(base) == _plan_signature(spark.read.parquet(src))
    assert _plan_signature(base) != _plan_signature(base.filter("n_tok > 1"))
    assert _plan_signature(base) != _plan_signature(base.repartition(5))


def test_plan_cache_never_hijacks_identityless_inputs(spark, tmp_path):
    """Session plan cache collision (found via a deterministic cross-test
    streaming failure): a createDataFrame/foreachBatch input has NO
    inputFiles and an epoch-invariant canonicalized plan string, so caching
    its split plan replays the FIRST encode's partition count onto every
    later same-schema encode — a 200k-token-target plan hijacked a
    30k-target one.  Identity-less inputs must re-plan every time, and the
    sizing knobs must be part of the cache key."""
    from rugo_spark import manifest as mf
    from rugo_spark.engine import encode_table
    from rugo_spark.tokengen import token_batch

    df = spark.createDataFrame(token_batch(400).to_pandas())
    assert not df.inputFiles()  # the precondition the fix keys on
    big = str(tmp_path / "one_part")
    encode_table(df, big, key_col="doc_id", size_col="n_tok",
                 target_tokens=10**9)
    assert len(mf.completed_partitions(big)) == 1
    small = str(tmp_path / "many_parts")
    encode_table(df, small, key_col="doc_id", size_col="n_tok",
                 target_tokens=20_000)
    assert len(mf.completed_partitions(small)) > 1, (
        "30k-target encode reused the 1-partition cached plan"
    )


# --------------------------------------------------------------- review find:
# timestamp/date min/max serialize as strings in sidecars (default=str) but
# probe values are datetime objects; the Decimal fallback raised
# InvalidOperation -> every temporal predicate degraded to a full scan.


def test_temporal_stats_prune_blocks():
    import datetime as dt

    from rugo_spark.engine import _block_may_match

    codecs = {"ts": {"min": "2024-01-05 00:00:00", "max": "2024-01-06 12:30:00"},
              "d": {"min": "2024-01-05", "max": "2024-01-06"}}
    inside = dt.datetime(2024, 1, 5, 10, 0)
    before = dt.datetime(2024, 1, 1)
    after = dt.datetime(2024, 2, 1)
    assert _block_may_match(codecs, "ts", "=", inside)
    assert not _block_may_match(codecs, "ts", "=", before)
    assert not _block_may_match(codecs, "ts", "=", after)
    assert not _block_may_match(codecs, "ts", "<", dt.datetime(2024, 1, 5))
    assert _block_may_match(codecs, "ts", "<=", dt.datetime(2024, 1, 5))
    assert not _block_may_match(codecs, "ts", ">", dt.datetime(2024, 1, 6, 12, 30))
    assert _block_may_match(codecs, "ts", ">=", dt.datetime(2024, 1, 6, 12, 30))
    # fractional-second probes compare correctly against whole-second stats
    assert _block_may_match(codecs, "ts", ">", dt.datetime(2024, 1, 6, 12, 29, 59, 500000))
    assert not _block_may_match(codecs, "ts", ">", dt.datetime(2024, 1, 6, 12, 30, 0, 1))
    # dates
    assert _block_may_match(codecs, "d", "=", dt.date(2024, 1, 5))
    assert not _block_may_match(codecs, "d", "=", dt.date(2024, 1, 7))
    # tz-aware probe vs naive stats: conservative scan, never a wrong skip
    aware = dt.datetime(2024, 2, 1, tzinfo=dt.timezone.utc)
    assert _block_may_match(codecs, "ts", "=", aware)


# --------------------------------------------------------------- review find
# (via the CDC-stream rollback test): the canonicalized plan string elides
# LocalRelation data, so two same-shape in-memory appends shared a
# fingerprint and the second silently no-oped as a "resume" of the first.


def test_identityless_appends_with_different_content_both_land(spark, tmp_path):
    import numpy as np
    import pandas as pd

    from rugo_spark.engine import append_table, decode_table, encode_table

    def df(start):
        return spark.createDataFrame(pd.DataFrame({
            "k": np.arange(start, start + 100, dtype="int64"),
            "v": np.arange(start, start + 100, dtype="int64") % 7,
        }))

    out = str(tmp_path / "ds")
    encode_table(df(0), out, key_col="k", num_partitions=2)
    append_table(df(100), out)
    append_table(df(200), out)  # same shape, different rows: MUST land
    assert decode_table(spark, out).count() == 300
    # identical content re-append IS still the idempotent resume
    append_table(df(200), out)
    assert decode_table(spark, out).count() == 300


# --------------------------------------------------------------- r5 late:
# map-only/append/V2 blocks were single flat stripes — a point lookup in a
# 128 MB split decoded the whole block.  Large splits now write RGS2 with a
# per-stripe min/max directory (deterministically chunked), so intra-block
# stripe skipping works on every writer path.


def test_maponly_blocks_stripe_and_skip(spark, tmp_path):
    import numpy as np
    import pandas as pd

    from rugo_spark import engine

    # 2M rows x 16 raw bytes = 32 MB in one split -> ~4 stripes at the 8 MB
    # target (the constant lives executor-side; size the data, not a patch)
    N_ROWS = 2_000_000
    out = str(tmp_path / "ds")
    df = spark.createDataFrame(pd.DataFrame({
        "k": np.arange(N_ROWS, dtype="int64"),
        "v": np.arange(N_ROWS, dtype="int64") * 2,
    })).coalesce(1)
    engine.encode_table_maponly(df, out, sort_key="k")
    import os

    blocks = os.listdir(os.path.join(out, "blocks"))
    assert len(blocks) == 1
    with open(os.path.join(out, "blocks", blocks[0]), "rb") as f:
        assert f.read(4) == engine.STRIPED_MAGIC2
    # bit-exact roundtrip through the striped layout
    got = engine.decode_table(spark, out).toPandas().sort_values("k")
    assert got["k"].to_numpy().tolist() == list(range(N_ROWS))
    assert (got["v"].to_numpy() == np.arange(N_ROWS) * 2).all()
    # a point filter decodes exactly one matching row via stripe skipping
    hit = engine.decode_table(spark, out, filters=[("k", "=", 12345)]).collect()
    assert [r["v"] for r in hit] == [24690]
    # determinism: re-encoding the same table heals bit-identically
    path = os.path.join(out, "blocks", blocks[0])
    import hashlib

    before = hashlib.md5(open(path, "rb").read()).hexdigest()
    os.remove(path)
    os.remove(os.path.join(out, "manifest", "part-000000.json"))
    engine.encode_table_maponly(df, out, sort_key="k")
    assert hashlib.md5(open(path, "rb").read()).hexdigest() == before


# --------------------------------------------------------------- r5 late:
# IN-list predicates through every layer: stats pruning (OR of equality
# tests), bloom (OR of probes), stripe skipping, the exact re-apply, and
# the DML mask kernel.


def test_in_predicate_decode_and_delete(spark, tmp_path):
    import numpy as np
    import pandas as pd

    from rugo_spark import manifest as mf
    from rugo_spark.engine import (_sidecar_keep, decode_table, delete_where,
                                   encode_table)

    out = str(tmp_path / "ds")
    df = spark.createDataFrame(pd.DataFrame({
        "k": np.arange(10_000, dtype="int64"),
        "v": np.arange(10_000, dtype="int64") % 13,
    }))
    encode_table(df, out, key_col="k", num_partitions=8)
    keys = [17, 4242, 9999]
    got = decode_table(spark, out, filters=[("k", "in", keys)]).collect()
    assert sorted(r["k"] for r in got) == keys
    # pruning: an IN-list whose members all live in one block keeps ~1 block
    rows = mf.visible_partitions(out)
    kept = [r for r in rows if _sidecar_keep(r, [("k", "in", [17, 18])])]
    assert len(kept) < len(rows)
    # empty IN matches nothing (and skips every block)
    assert decode_table(spark, out, filters=[("k", "in", [])]).count() == 0
    # DML: IN-list delete masks exactly those rows, idempotently
    res = delete_where(spark, out, [("k", "in", keys)])
    assert res["n_deleted"] == 3
    assert decode_table(spark, out).count() == 10_000 - 3
    assert delete_where(spark, out, [("k", "in", keys)])["n_deleted"] == 0


def test_isnull_notnull_predicates(spark, tmp_path):
    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F

    from rugo_spark import manifest as mf
    from rugo_spark.engine import (_sidecar_keep, decode_table, delete_where,
                                   encode_table_sorted)

    out = str(tmp_path / "ds")
    # quality is NULL only for k < 100: the RANGE-sorted layout localizes
    # the nulls to one block, so null_count stats prune the rest
    df = spark.createDataFrame(pd.DataFrame({
        "k": np.arange(4000, dtype="int64"),
    })).withColumn(
        "quality",
        F.when(F.col("k") >= 100, F.col("k").cast("double") / 2),
    )
    encode_table_sorted(df, out, key_col="k", num_partitions=8)
    got = decode_table(spark, out, filters=[("quality", "isnull", None)])
    assert sorted(r["k"] for r in got.collect()) == list(range(100))
    assert decode_table(
        spark, out, filters=[("quality", "notnull", None)]
    ).count() == 3900
    # pruning: blocks with zero recorded nulls skip for isnull
    rows = mf.visible_partitions(out)
    kept = [r for r in rows if _sidecar_keep(r, [("quality", "isnull", None)])]
    assert len(kept) < len(rows)
    # DML: delete the null-quality rows (the data-quality purge shape)
    res = delete_where(spark, out, [("quality", "isnull", None)])
    assert res["n_deleted"] == 100
    assert decode_table(spark, out).count() == 3900
