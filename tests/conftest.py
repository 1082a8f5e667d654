from __future__ import annotations

import shutil

import pytest


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
