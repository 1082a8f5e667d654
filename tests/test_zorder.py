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
