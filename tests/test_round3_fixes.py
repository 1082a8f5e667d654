"""Regression tests for the round-3 ADVICE findings."""

from __future__ import annotations

import numpy as np
import pytest


def test_resize_media_empty_trailing_payload(spark):
    # ADVICE r3 #1: an empty binary payload in the LAST row of a batch made
    # the stride-gather index == len(data) → IndexError before masking
    import pandas as pd

    from rugo_spark.ops import multimodal

    pdf = pd.DataFrame(
        {
            "asset_id": ["a", "b", "c"],
            "media": [b"\x01\x02\x03\x04" * 64, b"", b""],
        }
    )
    df = spark.createDataFrame(pdf)
    rows = {r["asset_id"]: r for r in multimodal.resize_media(df, 8, 8).collect()}
    assert len(rows) == 3
    assert rows["b"]["media"] == b"\x00" * 64
    assert rows["c"]["media"] == b"\x00" * 64
    assert any(b != 0 for b in rows["a"]["media"])

    # all-empty batch: gather base is an empty data buffer
    pdf2 = pd.DataFrame({"asset_id": ["x", "y"], "media": [b"", b""]})
    rows2 = multimodal.resize_media(spark.createDataFrame(pdf2), 4, 4).collect()
    assert all(r["media"] == b"\x00" * 16 for r in rows2)


def test_thrift_skip_bool_list():
    # ADVICE r3 #2: compact protocol writes one byte per bool list element;
    # _skip must advance by `size`, not recurse into the zero-byte
    # struct-field bool skip (which desyncs the scanner)
    from rugo_spark.thrift_lite import _FALSE, _I32, _LIST, _skip

    # struct: field 1 = list<bool>[3], field 2 = i32, stop
    payload = bytes(
        [
            (1 << 4) | _LIST,  # field header: delta 1, type list
            (3 << 4) | _FALSE,  # list header: size 3, elem type bool
            1, 0, 1,            # three one-byte bool elements
            (1 << 4) | _I32,    # field header: delta 1, type i32
            0x2A,               # varint 42
            0x00,               # stop
        ]
    )
    from rugo_spark.thrift_lite import _STRUCT

    end = _skip(memoryview(payload), 0, _STRUCT)
    assert end == len(payload)


def test_fsst_train_rejects_oversized_max_merges():
    # ADVICE r3 #3: >255 merges would overflow the 1-byte symbol-count
    # header and the dense 512-wide pair LUT
    from rugo_spark.codecs import fsst

    with pytest.raises(ValueError, match="max_merges"):
        fsst.train(b"abcabcabc" * 100, max_merges=256)
    t = fsst.train(b"abcabcabc" * 100, max_merges=255)
    assert t.n_merges <= 255


def test_decimal_minmax_stats_actually_prune():
    # ADVICE r3 #4: decimal min/max land as strings in the JSON sidecar;
    # _block_may_match must compare via Decimal, not TypeError into a scan
    from rugo_spark.engine import _block_may_match

    codecs = {"price": {"min": "10.50", "max": "99.99"}}
    assert not _block_may_match(codecs, "price", "=", 5)
    assert not _block_may_match(codecs, "price", "=", 100.5)
    assert _block_may_match(codecs, "price", "=", 50)
    assert not _block_may_match(codecs, "price", "<", 10)
    assert _block_may_match(codecs, "price", "<", 11)
    assert not _block_may_match(codecs, "price", ">", 100)
    assert _block_may_match(codecs, "price", ">=", 99.99)
    # garbage stats stay conservative
    assert _block_may_match({"c": {"min": "abc", "max": "zzz"}}, "c", "=", 5)


def test_decimal_filter_prunes_blocks_end_to_end(spark, tmp_out):
    from decimal import Decimal

    import pandas as pd

    from rugo_spark import manifest as mf
    from rugo_spark.engine import _sidecar_keep, decode_table, encode_table_maponly

    pdf = pd.DataFrame(
        {
            "k": np.arange(400, dtype=np.int64),
            "price": [Decimal(f"{i}.25") for i in range(400)],
        }
    )
    df = spark.createDataFrame(pdf, "k long, price decimal(12,2)")
    # range partitioning → disjoint price ranges per block, so stats can prune
    encode_table_maponly(df.repartitionByRange(4, "k"), tmp_out, sort_key="k")
    rows = mf.completed_partitions(tmp_out)
    assert len(rows) == 4
    filt = [("price", "=", 7.25)]
    kept = [r for r in rows if _sidecar_keep(r, filt)]
    assert 0 < len(kept) < len(rows), "decimal stats must prune some blocks"
    got = decode_table(spark, tmp_out, filters=filt).collect()
    assert len(got) == 1 and got[0]["k"] == 7
