"""Regression pins for the session-2 review findings (older-module bugs)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F


def test_short_docs_do_not_cluster_together(spark):
    """Sub-shingle-length docs share the all-null signature; they must emit
    no bands (matching the sequential oracle), not merge into one cluster."""
    from rugo_spark.ops.dedup import dedup_clusters, minhash_lsh_candidates

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": ["ab", "xy", "q", "completely different long document body"]})
    )
    assert minhash_lsh_candidates(df, n_hashes=8, n_bands=2).count() == 0
    clusters = dedup_clusters(df, n_hashes=8, n_bands=2)
    assert clusters.filter("is_kept").count() == 4  # all singletons kept


def test_cosine_zero_norm_vector_is_zero_not_error(spark):
    from rugo_spark.ops.similarity import cosine_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 1.0])],
        schema="vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r["cos"] for r in cosine_topk(df, [1.0, 0.0], k=3).collect()}
    assert rows[2] == 0.0 and abs(rows[1] - 1.0) < 1e-9


def test_simhash_null_text_is_zero(spark):
    from rugo_spark.ops.dedup import simhash

    df = spark.createDataFrame(
        [(1, "hello world"), (2, None)], schema="doc_id long, text string"
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    assert got[2] == 0 and got[1] != 0


def test_jaccard_zero_union_candidates(spark):
    from rugo_spark.ops.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["ab", "xy"]})
    )
    cand = spark.createDataFrame(pd.DataFrame({"id_a": [1], "id_b": [2]}))
    out = ngram_jaccard_pairs(df, prefilter=cand, threshold=0.0).collect()
    assert len(out) == 1 and out[0]["jaccard"] == 0.0


def test_null_embeddings_do_not_misalign_ivf(spark):
    from rugo_spark.ops.similarity import ivf_topk

    rows = [(i, [float(i == j) for j in range(4)]) for i in range(8)]
    rows.insert(3, (99, None))  # null row in the middle
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    got = [r["vec_id"] for r in ivf_topk(df, [1.0, 0, 0, 0], k=1, n_clusters=2, n_probe=2).collect()]
    assert got == [0]  # the aligned nearest id, not a shifted neighbor


def test_contamination_custom_id_col(spark):
    from rugo_spark.ops.contamination import find_needle

    df = spark.createDataFrame(
        [(7, [1, 2, 3])], schema="sample_id long, tokens array<int>"
    )
    out = find_needle(df, [2, 3], id_col="sample_id")
    assert out.columns == ["sample_id", "n_matches", "first_pos"]
    assert out.first()["sample_id"] == 7


def test_codec_ids_are_pinned():
    from rugo_spark.codecs import BYTES_CODEC_IDS, CODEC_BY_ID, INT_CODEC_IDS

    # on-disk ids — if this test fails, block files written by older
    # versions no longer decode: append new codecs, never renumber
    assert INT_CODEC_IDS == {"bss": 0, "delta": 1, "dict": 2, "for": 3, "plain": 4, "rle": 5}
    assert BYTES_CODEC_IDS == {"fsst": 64, "raw": 65}
    assert CODEC_BY_ID[0] == "bss" and CODEC_BY_ID[64] == "fsst"


def test_ivf_index_reuse_requires_matching_recipe(spark, tmp_path):
    import numpy as np

    from rugo_spark.ops.similarity import build_ivf_index

    df4 = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5) for j in range(4)]) for i in range(64)],
        schema="vec_id long, embedding array<float>",
    )
    d = str(tmp_path / "ivf")
    m1 = build_ivf_index(df4, d, n_clusters=4, sample_n=32)
    # same recipe → reused centroids
    m2 = build_ivf_index(df4, d, n_clusters=4, sample_n=32)
    assert np.allclose(m1["centroids"], m2["centroids"])
    # different dim → retrain, no reshape scramble
    df6 = spark.createDataFrame(
        [(i, [float((i * 3 + j) % 5) for j in range(6)]) for i in range(64)],
        schema="vec_id long, embedding array<float>",
    )
    m3 = build_ivf_index(df6, d, n_clusters=4, sample_n=32)
    assert m3["dim"] == 6
