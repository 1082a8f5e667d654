from __future__ import annotations

import os
import shutil

import pytest

# recompute-based oracles must read the same SF the parity tests query
# (the driver's gate runs at sf0.01 — the entry module's default)
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from rugo_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="rugo_spark_tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def tmp_out(tmp_path):
    out = str(tmp_path / "encoded")
    yield out
    shutil.rmtree(out, ignore_errors=True)
