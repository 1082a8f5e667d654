"""Differential oracle tests: every ``queries()`` entry vs its DuckDB oracle
at sf0.001 — a local mirror of the driver's correctness gate (and the same
pattern the reference uses with PyArrow as oracle,
``tests/test_statistics.py:68-94``)."""

from __future__ import annotations

import os
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def conv(col: pd.Series) -> pd.Series:
        if col.map(lambda v: isinstance(v, Decimal)).any():
            return col.astype(float)
        if pd.api.types.is_datetime64_any_dtype(col):
            if getattr(col.dt, "tz", None) is not None:
                col = col.dt.tz_localize(None)
            return col.astype("datetime64[us]")
        return col

    df = df.apply(conv)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame, name: str):
    a, b = _canon(spark_df), _canon(duck_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            np.testing.assert_allclose(av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-12,
                                       err_msg=f"{name}.{c}")
        elif av.dtype.kind == "O" and len(av) and isinstance(next((x for x in av if x is not None), None), (list, np.ndarray)):
            for x, y in zip(av, bv):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=f"{name}.{c}")
        else:
            assert list(map(str, av)) == list(map(str, bv)), f"{name}.{c} differs"


ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_vs_oracle(spark, name):
    q = entrymod.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(spark_pdf) >= 0  # rows-only check (driver does the same)
        return
    duck_pdf = _duck(ORACLES[name])
    _compare(spark_pdf, duck_pdf, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() == 2000


def test_values_sql_float_literals_roundtrip_through_duckdb():
    """DuckDB parses bare decimal literals as DECIMAL, truncating the last
    ulp on re-cast — values_sql must emit DOUBLE (exponent-form) literals
    that round-trip bit-exactly."""
    import math

    from rugo_spark.oracle_recompute import values_sql

    vals = [0.9895470383275261, 1.0 / 3.0, 2.0**-40, 1e300, -0.0, 123.456]
    sql = values_sql([(v,) for v in vals], [("x", "DOUBLE")])
    got = [r[0] for r in duckdb.connect().execute(sql).fetchall()]
    assert len(got) == len(vals)
    for a, b in zip(sorted(vals), sorted(got)):
        assert a == b and math.copysign(1, a) == math.copysign(1, b), (a, b)
