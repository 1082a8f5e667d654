"""encode_table_sorted: disjoint key ranges per block → min/max range pruning."""

from __future__ import annotations

import json

import pandas as pd

from rugo_spark import manifest as mf
from rugo_spark.engine import _sidecar_keep, decode_table, encode_table_sorted


def _encode(spark, tmp_out):
    pdf = pd.DataFrame(
        {
            "doc_id": range(3000),
            "n_chars": [(7 + 13 * i) % 401 for i in range(3000)],
        }
    )
    encode_table_sorted(
        spark.createDataFrame(pdf), tmp_out, key_col="doc_id", num_partitions=6,
        size_col="n_chars",
    )
    return pdf


def test_blocks_carry_disjoint_key_ranges(spark, tmp_out):
    _encode(spark, tmp_out)
    spans = []
    for r in mf.completed_partitions(tmp_out):
        m = json.loads(r["codecs"])["doc_id"]
        spans.append((int(m["min"]), int(m["max"])))
    spans.sort()
    assert len(spans) >= 4
    for (_, hi), (lo2, _) in zip(spans, spans[1:]):
        assert hi < lo2, f"overlapping block ranges: {spans}"


def test_range_predicate_prunes_blocks(spark, tmp_out):
    _encode(spark, tmp_out)
    rows = mf.completed_partitions(tmp_out)
    survive = [r for r in rows if _sidecar_keep(r, [("doc_id", "<", 400)])]
    assert 0 < len(survive) < len(rows)
    # and the pruned decode is still exact
    got = decode_table(spark, tmp_out, filters=[("doc_id", "<", 400)]).count()
    assert got == 400


def test_roundtrip_content(spark, tmp_out):
    pdf = _encode(spark, tmp_out)
    got = decode_table(spark, tmp_out).orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(
        got, pdf.sort_values("doc_id").reset_index(drop=True), check_dtype=False
    )


def test_murmur3_int32_matches_spark_hash(spark):
    """The routing identity everything rests on: murmur3_int32(j) must equal
    Spark's ``F.hash(j int)`` (HashPartitioning's Murmur3, seed 42) — and
    repartition placement must equal pmod(hash, n) — or task id != bucket id
    and blocks silently merge key ranges."""
    import pyspark.sql.functions as F
    from pyspark.sql.functions import spark_partition_id

    from rugo_spark.partitioning import hash_routes, murmur3_int32

    rows = (
        spark.range(0, 512)
        .select(F.col("id").cast("int").alias("j"))
        .withColumn("h", F.hash("j"))
        .collect()
    )
    assert all(murmur3_int32(r["j"]) == r["h"] for r in rows)
    n = 7
    placed = (
        spark.range(0, 128)
        .select(F.col("id").cast("int").alias("j"))
        .repartition(n, "j")
        .select("j", spark_partition_id().alias("p"))
        .collect()
    )
    assert all(r["p"] == murmur3_int32(r["j"]) % n for r in placed)
    # routes are valid pre-images for every bucket
    for nn in (1, 2, 5, 32, 256):
        routes = hash_routes(nn)
        assert [murmur3_int32(j) % nn for j in routes] == list(range(nn))
