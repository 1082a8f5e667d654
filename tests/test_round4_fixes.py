"""Round-4 regression tests: ADVICE_r03 findings + VERDICT_r03 items."""

from __future__ import annotations

import json
import os
from decimal import Decimal

import numpy as np
import pytest


# --------------------------------------------------------------- ADVICE high:
# concat-compaction merged decimal min/max lexicographically (strings from
# json.dumps(default=str)), inverting bounds → silent block pruning data loss


def test_merge_column_metas_decimal_compares_numerically():
    from rugo_spark.block import KIND_DEC128
    from rugo_spark.engine import merge_column_metas

    # lexicographic min('10.20','9.50') == '10.20' — the r3 bug
    a = {"price": {"kind": KIND_DEC128, "codec": "dec128", "min": "9.50",
                   "max": "9.90", "raw_bytes": 10, "enc_bytes": 5,
                   "null_count": 0, "n": 2}}
    b = {"price": {"kind": KIND_DEC128, "codec": "dec128", "min": "10.20",
                   "max": "10.80", "raw_bytes": 10, "enc_bytes": 5,
                   "null_count": 0, "n": 2}}
    merged = merge_column_metas([a, b])["price"]
    assert Decimal(str(merged["min"])) == Decimal("9.50")
    assert Decimal(str(merged["max"])) == Decimal("10.80")
    # order independence
    merged2 = merge_column_metas([b, a])["price"]
    assert Decimal(str(merged2["min"])) == Decimal("9.50")
    assert Decimal(str(merged2["max"])) == Decimal("10.80")
    # kind survives the merge so downstream re-merges stay type-aware
    assert merged["kind"] == KIND_DEC128


def test_merge_column_metas_mixed_decimal_and_string_forms():
    from rugo_spark.block import KIND_DEC128
    from rugo_spark.engine import merge_column_metas

    # in-memory metas carry Decimal objects; sidecar round-trips carry str —
    # a merge may see both
    a = {"p": {"kind": KIND_DEC128, "codec": "dec128", "min": Decimal("9.5"),
               "max": Decimal("9.9"), "raw_bytes": 1, "enc_bytes": 1,
               "null_count": 0, "n": 1}}
    b = {"p": {"kind": KIND_DEC128, "codec": "dec128", "min": "10.2",
               "max": "10.8", "raw_bytes": 1, "enc_bytes": 1,
               "null_count": 0, "n": 1}}
    merged = merge_column_metas([a, b])["p"]
    assert Decimal(str(merged["min"])) == Decimal("9.5")
    assert Decimal(str(merged["max"])) == Decimal("10.8")


def test_merge_column_metas_unparseable_decimal_stat_drops_bounds():
    from rugo_spark.block import KIND_DEC128
    from rugo_spark.engine import merge_column_metas

    a = {"p": {"kind": KIND_DEC128, "codec": "dec128", "min": "9.5",
               "max": "9.9", "raw_bytes": 1, "enc_bytes": 1,
               "null_count": 0, "n": 1}}
    b = {"p": {"kind": KIND_DEC128, "codec": "dec128", "min": "garbage",
               "max": "alsogarbage", "raw_bytes": 1, "enc_bytes": 1,
               "null_count": 0, "n": 1}}
    merged = merge_column_metas([a, b])["p"]
    # conservative: no bounds → always scan, never wrong pruning
    assert merged["min"] is None and merged["max"] is None


def test_merge_column_metas_string_column_stays_lexicographic():
    from rugo_spark.engine import merge_column_metas

    # a REAL string column whose values look numeric must keep the
    # lexicographic merge — that is the order the pruning side uses for str
    a = {"s": {"kind": 2, "codec": "fsst", "min": "10.2", "max": "10.2",
               "raw_bytes": 1, "enc_bytes": 1, "null_count": 0, "n": 1}}
    b = {"s": {"kind": 2, "codec": "fsst", "min": "9.5", "max": "9.5",
               "raw_bytes": 1, "enc_bytes": 1, "null_count": 0, "n": 1}}
    merged = merge_column_metas([a, b])["s"]
    assert merged["min"] == "10.2" and merged["max"] == "9.5"


def test_concat_compact_decimal_filter_no_silent_data_loss(spark, tmp_path):
    """End-to-end ADVICE-high scenario: filter col = 9.50 on a
    concat-compacted dataset must return the matching row (r3 silently
    pruned the stripe because merged bounds were ['10.20','9.90'])."""
    import pandas as pd

    from rugo_spark.engine import compact_dataset, decode_table, encode_table_maponly

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    pdf = pd.DataFrame(
        {
            "k": np.arange(8, dtype=np.int64),
            "price": [Decimal(f"{v}") for v in
                      ("9.50", "9.60", "9.70", "9.90",
                       "10.20", "10.40", "10.60", "10.80")],
        }
    )
    df = spark.createDataFrame(pdf, "k long, price decimal(12,2)").repartitionByRange(
        2, "price"
    )
    encode_table_maponly(df, src)
    compact_dataset(spark, src, dst, mode="concat")

    # merged sidecar bounds must be numerically correct
    from rugo_spark import manifest as mf

    rows = mf.completed_partitions(dst)
    assert len(rows) == 1
    meta = json.loads(rows[0]["codecs"])["price"]
    assert Decimal(str(meta["min"])) == Decimal("9.50")
    assert Decimal(str(meta["max"])) == Decimal("10.80")

    got = decode_table(
        spark, dst, filters=[("price", "=", Decimal("9.50"))]
    ).collect()
    assert len(got) == 1 and got[0]["k"] == 0
    hi = decode_table(
        spark, dst, filters=[("price", ">=", Decimal("10.60"))]
    ).collect()
    assert sorted(r["k"] for r in hi) == [6, 7]


# --------------------------------------------------------------- ADVICE low:
# resize_media single-row overflow must raise, not recurse forever


def test_resize_media_single_row_overflow_raises():
    from rugo_spark.ops import multimodal

    # craft the guard condition directly: one row whose target alone exceeds
    # the int32 offset budget must produce a clear error, not RecursionError
    with pytest.raises(ValueError, match="exceeds|too large|int32"):
        multimodal._check_single_row_overflow(1, (1 << 31))


# --------------------------------------------------------------- VERDICT #1:
# vanilla-session conf reads must not throw on typed keys with no set value


def test_conf_get_guard_never_throws(spark):
    from rugo_spark.engine import _conf_get

    # a typed key (bytes) — r3's conf.get(key, "") threw INVALID_CONF_VALUE
    v = _conf_get(spark.conf, "spark.sql.files.maxPartitionBytes", "")
    assert isinstance(v, str)
    # unknown key falls back to our default
    assert _conf_get(spark.conf, "rugo.not.a.key", "fallback") == "fallback"


# --------------------------------------------------------------- VERDICT #7:
# small-stripe FSST: task-scoped symbol-table reuse (train once per column
# per task, compress-only for stripes 2..k, deterministic fallback on drift)


def _stripes_of(text: bytes, k: int = 6):
    step = max(len(text) // k, 1)
    return [text[i : i + step] for i in range(0, len(text), step)]


def test_fsst_reuse_trains_once_and_roundtrips(monkeypatch):
    from rugo_spark.codecs import fsst

    base = (b"the quick brown fox jumps over the lazy dog. " * 2000)
    stripes = _stripes_of(base)
    calls = {"n": 0}
    real_train = fsst.train

    def counting_train(*a, **kw):
        calls["n"] += 1
        return real_train(*a, **kw)

    monkeypatch.setattr(fsst, "train", counting_train)
    reuse = {}
    out = [fsst.encode(s, reuse=reuse) for s in stripes]
    assert calls["n"] == 1, "stable-distribution chain must train exactly once"
    for s, o in zip(stripes, out):
        assert fsst.decode(o) == s


def test_fsst_reuse_chain_is_deterministic():
    from rugo_spark.codecs import fsst

    base = (b"encode me repeatedly with shifting content %d " * 500) % tuple(range(500))
    stripes = _stripes_of(base)
    a = [fsst.encode(s, reuse={}) for s in stripes]  # fresh per call — no amortize
    r1, r2 = {}, {}
    b = [fsst.encode(s, reuse=r1) for s in stripes]
    c = [fsst.encode(s, reuse=r2) for s in stripes]
    assert b == c, "same chain → bit-identical payloads (resume contract)"
    for s, o in zip(stripes, b):
        assert fsst.decode(o) == s
    del a


def test_fsst_reuse_guard_retrains_on_distribution_drift(monkeypatch):
    import numpy as _np

    from rugo_spark.codecs import fsst

    calls = {"n": 0}
    real_train = fsst.train

    def counting_train(*a, **kw):
        calls["n"] += 1
        return real_train(*a, **kw)

    monkeypatch.setattr(fsst, "train", counting_train)
    reuse = {}
    english = b"a common english sentence about data engines. " * 4000
    rng = _np.random.default_rng(7)
    noise = rng.integers(0, 256, size=150_000, dtype=_np.uint8).tobytes()
    e1 = fsst.encode(english, reuse=reuse)
    assert calls["n"] == 1
    e2 = fsst.encode(noise, reuse=reuse)
    assert fsst.decode(e1) == english and fsst.decode(e2) == noise
    # incompressible noise blows the ratio guard → one fresh training
    assert calls["n"] == 2


def test_precombine_reuse_output_matches_decode(spark, tmp_path):
    """End-to-end: shuffled precombine encode (the stripe path that now
    reuses tables) still decodes bit-identically, and resume re-encode of a
    dropped partition reproduces the same checksum."""
    import os

    import pandas as pd

    from rugo_spark import manifest as mf
    from rugo_spark.engine import decode_table, encode_table

    out = str(tmp_path / "enc")
    n = 3000
    pdf = pd.DataFrame(
        {
            "doc_id": [f"doc-{i:05d}" for i in range(n)],
            "text": [f"document body {i} with repeated phrasing common to all" * 3
                     for i in range(n)],
            "n_tok": np.arange(n, dtype=np.int32) % 50 + 1,
        }
    )
    df = spark.createDataFrame(pdf)
    man1 = {r["partition_id"]: r for r in encode_table(
        df, out, key_col="doc_id", size_col="n_tok", num_partitions=5,
        precombine=True,
    ).collect()}
    got = decode_table(spark, out).orderBy("doc_id").toPandas()
    assert got["doc_id"].tolist() == pdf["doc_id"].tolist()
    assert got["text"].tolist() == pdf["text"].tolist()
    # resume: drop one partition, re-run, checksum identical (determinism
    # of the reuse chain under re-execution)
    victim = sorted(man1)[1]
    os.remove(mf.sidecar_path(out, victim))
    os.remove(man1[victim]["block_path"])
    man2 = {r["partition_id"]: r for r in encode_table(
        df, out, key_col="doc_id", size_col="n_tok", num_partitions=5,
        precombine=True,
    ).collect()}
    assert man2[victim]["checksum"] == man1[victim]["checksum"]
    assert man2[victim]["output_bytes"] == man1[victim]["output_bytes"]


def test_fsst_serialize_roundtrip_and_pinned_encode():
    from rugo_spark.codecs import fsst

    text = b"tokenized training sequences compress well with shared tables " * 3000
    t = fsst.train(text)
    blob = fsst.serialize_table(t)
    t2 = fsst.deserialize_table(blob)
    assert t2.out_expansions == t.out_expansions
    # pinned encode with the DESERIALIZED table must round-trip and be
    # bit-identical to pinned encode with the original
    other = b"more tokenized sequences in the same distribution " * 4000
    a = fsst.encode(other, table=t)
    b = fsst.encode(other, table=t2)
    assert a == b
    assert fsst.decode(a) == other


def test_fsst_pinned_table_guard_is_immutable(monkeypatch):
    import numpy as _np

    from rugo_spark.codecs import fsst

    english = b"ordinary compressible english text for the pinned table " * 3000
    t = fsst.train(english)
    ratio = len(fsst.compress(english, t)) / len(english)
    rng = _np.random.default_rng(11)
    noise = rng.integers(0, 256, size=120_000, dtype=_np.uint8).tobytes()
    calls = {"n": 0}
    real_train = fsst.train
    monkeypatch.setattr(fsst, "train", lambda *a, **kw: (calls.__setitem__("n", calls["n"] + 1), real_train(*a, **kw))[1])
    # drifted stripe: falls back to local training for THIS call only
    e_noise = fsst.encode(noise, table=t, expected_ratio=ratio)
    assert calls["n"] == 1
    assert fsst.decode(e_noise) == noise
    # pinned table unchanged: a later good stripe still uses it (no retrain)
    e_good = fsst.encode(english, table=t, expected_ratio=ratio)
    assert calls["n"] == 1
    assert fsst.decode(e_good) == english


def test_precombine_pins_codec_plans_and_uses_fsst(spark, tmp_path):
    import pandas as pd

    from rugo_spark import manifest as mf
    from rugo_spark.engine import encode_table

    out = str(tmp_path / "enc")
    n = 2000
    rng = np.random.default_rng(3)
    vocab = ["data", "engine", "column", "stripe", "token", "quantile", "shuffle",
             "manifest", "codec", "partition", "sample", "vector", "arrow", "batch"]
    texts = [
        " ".join(rng.choice(vocab, size=40)) + f" uid{rng.integers(1 << 60):x}"
        for _ in range(n)
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i:06d}" for i in range(n)],
            "text": texts,
            "n_tok": np.arange(n, dtype=np.int32) % 40 + 1,
        }
    )
    df = spark.createDataFrame(pdf)
    encode_table(df, out, key_col="doc_id", size_col="n_tok",
                 num_partitions=4, precombine=True)
    pins = mf.read_codec_plans(out)
    assert pins is not None and "text" in pins
    assert pins["text"]["data"] == "fsst" and pins["text"]["fsst_table"]
    # the encoded blocks actually used the pinned codec
    rows = mf.completed_partitions(out)
    metas = json.loads(rows[0]["codecs"])
    assert "fsst" in str(metas["text"]["codec"])
