"""Z-order clustering (`ops/zorder.py` — the Delta OPTIMIZE ZORDER BY
analog): Morton-key layout rewrite that makes manifest min/max pruning
bite on MULTIPLE columns at once (the write-side completion of the
reference's stats-prune thesis, ``rugo/parquet/metadata.cpp:618-646``)."""
from __future__ import annotations

import numpy as np
import pytest

from rugo_spark import deletes as dl
from rugo_spark import manifest as mf
from rugo_spark.engine import decode_table, delete_where, encode_table
from rugo_spark.ops.zorder import pruned_fraction, zorder_dataset, zorder_key


@pytest.fixture(scope="module")
def grid_df(spark):
    """A 64x64 integer grid — every (x, y) cell once, plus a value column."""
    import pandas as pd

    xs, ys = np.meshgrid(np.arange(64), np.arange(64))
    return spark.createDataFrame(
        pd.DataFrame({
            "x": xs.ravel().astype("int64"),
            "y": ys.ravel().astype("int64"),
            "v": (xs.ravel() * 64 + ys.ravel()).astype("int64"),
        })
    ).cache()


def test_zorder_key_locality_and_nulls(spark, grid_df):
    """Morton keys are monotone per column (bucketing is order-preserving)
    and NULLs cluster at the low end instead of crashing."""
    import pyspark.sql.functions as F

    bounds = {"x": (0, 63), "y": (0, 63)}
    z = zorder_key(grid_df, ["x", "y"], bounds, bits=6)
    pdf = grid_df.withColumn("z", z).toPandas()
    # exact Morton interleave on an aligned power-of-two grid
    def morton(x, y):
        out = 0
        for b in range(6):
            out |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return out
    want = [morton(r.x, r.y) for r in pdf.itertuples()]
    assert pdf["z"].tolist() == want
    withnull = grid_df.withColumn("x", F.when(F.col("v") == 0, None).otherwise(F.col("x")))
    z0 = withnull.withColumn("z", zorder_key(withnull, ["x", "y"], bounds, bits=6))
    assert z0.filter(F.col("v") == 0).first()["z"] == 0


def test_zorder_roundtrip_and_two_dim_pruning(spark, grid_df, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    encode_table(grid_df, src, key_col="v", num_partitions=16)
    meta = zorder_dataset(spark, src, dst, ["x", "y"], num_partitions=16)
    assert meta["n_blocks"] == 16
    got = decode_table(spark, dst).drop(meta["z_col"])
    g = got.toPandas().sort_values("v").reset_index(drop=True)
    w = grid_df.toPandas().sort_values("v").reset_index(drop=True)
    assert g["x"].tolist() == w["x"].tolist()
    assert g["y"].tolist() == w["y"].tolist()
    # a small range on EITHER dimension prunes blocks; the unclustered
    # source prunes neither
    fx = pruned_fraction(dst, [("x", ">=", 10), ("x", "<=", 13)])
    fy = pruned_fraction(dst, [("y", ">=", 50), ("y", "<=", 53)])
    assert fx >= 0.5, f"x-range pruned only {fx:.2f}"
    assert fy >= 0.5, f"y-range pruned only {fy:.2f}"
    assert pruned_fraction(src, [("x", ">=", 10), ("x", "<=", 13)]) == 0.0
    # the spec rides the schema payload for future appends
    spec = (mf.read_schema_payload(dst) or {})["zorder"]
    assert spec["cols"] == ["x", "y"] and spec["z_col"] == "z_order"


def test_zorder_purges_delete_masks(spark, grid_df, tmp_path):
    """The rewrite decodes under masks — dst is physically purged."""
    import os

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    encode_table(grid_df, src, key_col="v", num_partitions=8)
    delete_where(spark, src, [("v", "<", 100)])
    zorder_dataset(spark, src, dst, ["x", "y"], num_partitions=8)
    assert not os.path.isdir(os.path.join(dst, dl.DELETES_DIR))
    assert decode_table(spark, dst).count() == 64 * 64 - 100


def test_zorder_validation(spark, grid_df, tmp_path):
    src = str(tmp_path / "src")
    encode_table(grid_df, src, key_col="v", num_partitions=4)
    with pytest.raises(ValueError, match=">=2 columns"):
        zorder_dataset(spark, src, str(tmp_path / "d1"), ["x"])
    with pytest.raises(ValueError, match="Morton budget"):
        zorder_key(grid_df, ["x", "y"], {"x": (0, 1), "y": (0, 1)}, bits=32)
    with pytest.raises(ValueError, match="unknown z-order column"):
        zorder_key(grid_df, ["nope"], {"nope": (0, 1)})

def test_zorder_temporal_columns_and_spec_roundtrip(spark, tmp_path):
    """Date/timestamp z-order columns work end-to-end (the type gate allows
    them; bounds from metadata_agg arrive as datetime objects and the
    persisted spec round-trips them as strings — both must map to the SAME
    bucket expression as the data column), and zorder_key_from_spec
    reproduces the rewrite's key bit-identically on new rows."""
    import datetime as dt

    import pandas as pd
    import pyspark.sql.functions as F

    from rugo_spark.ops.zorder import zorder_key_from_spec

    n = 4096
    rng = np.random.default_rng(7)
    base = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame({
        "ts": [base + dt.timedelta(minutes=int(m)) for m in rng.integers(0, 60 * 24 * 30, n)],
        "k": rng.integers(0, 1000, n).astype("int64"),
        "v": np.arange(n, dtype="int64"),
    })
    df = spark.createDataFrame(pdf)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    encode_table(df, src, key_col="v", num_partitions=8)
    meta = zorder_dataset(spark, src, dst, ["ts", "k"], num_partitions=8)
    got = decode_table(spark, dst)
    assert got.count() == n
    # pruning bites on the timestamp dimension
    lo = base + dt.timedelta(days=3)
    hi = base + dt.timedelta(days=4)
    f_ts = pruned_fraction(dst, [("ts", ">=", lo), ("ts", "<=", hi)])
    assert f_ts >= 0.25, f"ts-range pruned only {f_ts:.2f}"
    # the persisted spec (string bounds) reproduces the key on new rows
    spec = (mf.read_schema_payload(dst) or {})["zorder"]
    with_key = df.withColumn("z2", zorder_key_from_spec(df, spec))
    direct = df.withColumn(
        "z1", zorder_key(df, meta["cols"],
                         {c: tuple(b) for c, b in meta["bounds"].items()},
                         bits=meta["bits"]))
    a = with_key.select("v", "z2").toPandas().sort_values("v")
    b = direct.select("v", "z1").toPandas().sort_values("v")
    assert a["z2"].tolist() == b["z1"].tolist()


def test_zorder_degenerate_span(spark, tmp_path):
    """A constant z-order column (span 0) buckets to 0 instead of
    dividing by zero / NaN-flooding the key."""
    import pandas as pd

    pdf = pd.DataFrame({"a": np.full(100, 7, dtype="int64"),
                        "b": np.arange(100, dtype="int64")})
    df = spark.createDataFrame(pdf)
    z = zorder_key(df, ["a", "b"], {"a": (7, 7), "b": (0, 99)}, bits=6)
    out = df.withColumn("z", z).toPandas()
    assert (out["z"] >= 0).all()
    # 'a' contributes nothing; key is monotone in b's buckets
    assert out.sort_values("b")["z"].is_monotonic_increasing
