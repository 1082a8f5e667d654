"""Regression pins for the FSST-pinning review pass (round-4 session-2):
reuse-chain stash poisoning, table wire-format validation, legacy kind-less
decimal stat merges, and the job-level dict-worthiness threshold."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rugo_spark.codecs import fsst


def _english(n=200_000):
    words = (b"the quick brown fox jumps over lazy dogs and runs through fields ")
    return (words * (n // len(words) + 1))[:n]


def _noise(n=200_000, seed=3):
    return np.random.default_rng(seed).integers(0, 256, n, dtype=np.uint8).tobytes()


def test_reuse_chain_recovers_after_drifted_stripe():
    """One incompressible stripe must not poison the chain stash: the next
    in-distribution stripe has to re-trip the guard and compress well again
    (pre-fix: noise table + its 1.6 ratio became the bound, and English then
    EXPANDED 1.7x forever)."""
    reuse: dict = {}
    s1 = fsst.encode(_english(), reuse=reuse)
    r1 = len(s1) / 200_000
    assert r1 < 0.5
    fsst.encode(_noise(), reuse=reuse)
    assert reuse["ratio"] <= 1.0  # the stashed bound is capped
    s3 = fsst.encode(_english(), reuse=reuse)
    r3 = len(s3) / 200_000
    assert r3 < 0.5, f"stash poisoned: english ratio {r3:.2f} after noise stripe"
    # round-trips hold throughout
    assert fsst.decode(s3) == _english()


def test_incompressible_table_never_replaces_a_good_stash():
    reuse: dict = {}
    fsst.encode(_english(), reuse=reuse)
    good = reuse["table"]
    fsst.encode(_noise(), reuse=reuse)
    assert reuse["table"] is good  # noise retrain did not take over the chain


def test_deserialize_table_rejects_truncation_and_trailing():
    t = fsst.train(_english(50_000))
    blob = fsst.serialize_table(t)
    assert fsst.deserialize_table(blob).out_expansions == t.out_expansions
    with pytest.raises(ValueError, match="truncated|empty"):
        fsst.deserialize_table(blob[: max(1, len(blob) // 2)])
    with pytest.raises(ValueError, match="empty"):
        fsst.deserialize_table(b"")
    with pytest.raises(ValueError, match="trailing"):
        fsst.deserialize_table(blob + b"\x00")


def test_legacy_kindless_decimal_merge_drops_ambiguous_bounds():
    """Sidecars written before 'kind' was recorded carry decimal stats as
    bare strings; when the lexicographic winner differs from the numeric
    winner the merge must drop the bounds (always-scan) rather than invert
    them (silent pruning data loss)."""
    from rugo_spark.engine import merge_column_metas

    legacy = [
        {"price": {"codec": "dec", "raw_bytes": 8, "enc_bytes": 8, "null_count": 0,
                   "n": 1, "min": "9.5", "max": "9.5"}},
        {"price": {"codec": "dec", "raw_bytes": 8, "enc_bytes": 8, "null_count": 0,
                   "n": 1, "min": "10.2", "max": "10.2"}},
    ]
    out = merge_column_metas(legacy)
    assert out["price"]["min"] is None and out["price"]["max"] is None
    # agreeing orders keep their bounds ("1.5" < "2.5" both ways)
    ok = [
        {"price": {"codec": "dec", "raw_bytes": 8, "enc_bytes": 8, "null_count": 0,
                   "n": 1, "min": "1.5", "max": "1.5"}},
        {"price": {"codec": "dec", "raw_bytes": 8, "enc_bytes": 8, "null_count": 0,
                   "n": 1, "min": "2.5", "max": "2.5"}},
    ]
    out = merge_column_metas(ok)
    assert out["price"]["min"] == "1.5" and out["price"]["max"] == "2.5"
    # genuine strings (not decimal-parsable) merge lexicographically as ever
    strs = [
        {"name": {"codec": "s", "raw_bytes": 4, "enc_bytes": 4, "null_count": 0,
                  "n": 1, "min": "apple", "max": "pear"}},
        {"name": {"codec": "s", "raw_bytes": 4, "enc_bytes": 4, "null_count": 0,
                  "n": 1, "min": "fig", "max": "zucchini"}},
    ]
    out = merge_column_metas(strs)
    assert out["name"]["min"] == "apple" and out["name"]["max"] == "zucchini"


def test_mid_cardinality_column_stays_unpinned():
    """~200 distinct values over 512 sampled rows showed repetition — a
    16k-row stripe may dict-encode it, so the job plan must NOT pin raw/fsst
    (pre-fix threshold pinned anything over 64 distinct)."""
    from rugo_spark.engine import _build_string_plans

    vals = [f"city-{i % 200:04d}-padded-for-size" for i in range(512)]
    sample = pa.table({"category": pa.array(vals)})
    plans = _build_string_plans(sample)
    assert "category" not in plans
    # a near-unique column IS pinned
    uniq = [f"document body {i} with plenty of words to train on " * 8 for i in range(512)]
    plans = _build_string_plans(pa.table({"text": pa.array(uniq)}))
    assert "text" in plans


def test_bloom_decimal_scale_insensitive():
    """Write side renders storage scale ('1.50'), probes render minimal
    scale ('1.5') — both must canonicalize identically or equality lookups
    false-negative (verified pre-fix)."""
    import decimal

    from rugo_spark import bloom

    col = pa.array([decimal.Decimal("1.50"), decimal.Decimal("100.00"),
                    decimal.Decimal("0.10")], type=pa.decimal128(10, 2))
    b = bloom.build(col)
    assert bloom.might_contain(b, decimal.Decimal("1.5"))
    assert bloom.might_contain(b, decimal.Decimal("1.50"))
    assert bloom.might_contain(b, 1.5)
    assert bloom.might_contain(b, decimal.Decimal("100"))
    assert bloom.might_contain(b, decimal.Decimal("0.1"))
    assert not bloom.might_contain(b, decimal.Decimal("2.5"))


def test_bloom_binary_keys_no_utf8_validation():
    from rugo_spark import bloom

    col = pa.array([b"\xff\xfe\x01", b"plain", b"\x00\x80"], type=pa.binary())
    b = bloom.build(col)  # pre-fix: ArrowInvalid 'Invalid UTF8 payload'
    assert bloom.might_contain(b, b"\xff\xfe\x01")
    assert bloom.might_contain(b, b"plain")
    assert not bloom.might_contain(b, b"absent-key")


def test_bloom_none_probe_is_conservative_match():
    from rugo_spark import bloom

    b = bloom.build(pa.array(["a", "b"]))
    assert bloom.might_contain(b, None) is True  # residual filter decides


def test_iceberg_probe_actually_detects_absence(spark):
    """py4j returns a JavaPackage (no raise) for missing classes, so the old
    attribute probe was always-True and the actionable error unreachable."""
    from rugo_spark.io import iceberg_available, read_table

    assert iceberg_available(spark) is False  # no runtime in this sandbox
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_table(spark, "iceberg:cat.db.tokens")


def test_stride_sample_covers_the_tail():
    from rugo_spark.stats import sample_values

    v = np.arange(100_000, dtype=np.int64)
    s = sample_values(v, limit=65_536)
    assert len(s) <= 65_536
    assert s[-1] > 99_000, f"prefix-only sample: tail at {s[-1]}"
