"""Tests for the training-data pipeline operators."""

from __future__ import annotations

import numpy as np
import pytest
import pyspark.sql.functions as F

from rugo_spark.ops import dedup, multimodal, similarity, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup(spark, docs):
    out = dedup.exact_dedup(docs).collect()
    n_docs = docs.count()
    assert sum(r["dup_count"] for r in out) == n_docs
    assert len(out) <= n_docs


def test_minhash_lsh_finds_injected_dups(spark, docs):
    # inject a near-duplicate: same text under a new id
    base = docs.limit(3).select("doc_id", "text")
    dup = base.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    both = base.unionAll(dup)
    pairs = dedup.minhash_lsh_candidates(both, n_hashes=16, n_bands=4).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs if r["est_jaccard"] >= 0.99}
    for r in base.collect():
        assert (r["doc_id"], r["doc_id"] + 1_000_000) in found


def test_ngram_jaccard_identical_is_one(spark, docs):
    base = docs.limit(2).select("doc_id", "text")
    dup = base.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    both = base.unionAll(dup)
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup.ngram_jaccard_pairs(both, threshold=0.99).collect()}
    for r in base.collect():
        assert out[(r["doc_id"], r["doc_id"] + 1_000_000)] == pytest.approx(1.0)


def test_simhash_identical_and_stable(spark, docs):
    out1 = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs.limit(50)).collect()}
    out2 = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs.limit(50)).collect()}
    assert out1 == out2  # deterministic
    # identical text → identical simhash
    two = docs.limit(1).select("doc_id", "text")
    clone = two.withColumn("doc_id", F.col("doc_id") + 77)
    res = {r["doc_id"]: r["simhash"] for r in dedup.simhash(two.unionAll(clone)).collect()}
    vals = list(res.values())
    assert vals[0] == vals[1]


def test_cosine_topk_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    q = pdf["embedding"].iloc[0]
    mat = np.vstack(pdf["embedding"].to_numpy())
    qv = np.asarray(q, dtype=np.float64)
    cos = (mat @ qv) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    order = np.argsort(-cos)[:5]
    want = [int(pdf["vec_id"].iloc[i]) for i in order]
    got = [r["vec_id"] for r in similarity.cosine_topk(emb, [float(x) for x in q], k=5).collect()]
    assert got == want


def test_ann_topk_contains_query_vector(spark, emb):
    pdf = emb.limit(1).toPandas()
    q = [float(x) for x in pdf["embedding"].iloc[0]]
    got = similarity.ann_topk(emb, q, k=5, bits=6)
    rows = got.collect()
    assert rows and rows[0]["vec_id"] == int(pdf["vec_id"].iloc[0])
    assert rows[0]["cos"] == pytest.approx(1.0, abs=1e-6)


def test_lang_id_on_known_text(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the cat and the dog went to the park and that was fun for all",
                "der Hund und die Katze sind nicht mit dem Zug gefahren und das ist gut",
                "le chat et les chiens sont dans la maison pour une fête",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    out = {r["doc_id"]: r["lang_pred"] for r in textstats.lang_id(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr"}


def test_quality_and_token_counts(spark, docs):
    q = textstats.quality_features(docs.limit(20)).collect()
    for r in q:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert r["text_len"] >= 0 and r["n_words"] >= 0
    t = textstats.token_counts(docs.limit(20)).collect()
    for r in t:
        assert r["n_subword_pieces"] >= r["n_ws_tokens"] >= 1


def test_fingerprint_deterministic_and_discriminative(spark, docs):
    f1 = {r["doc_id"]: r["fingerprint"] for r in textstats.fingerprint(docs.limit(100)).collect()}
    f2 = {r["doc_id"]: r["fingerprint"] for r in textstats.fingerprint(docs.limit(100)).collect()}
    assert f1 == f2
    assert len(set(f1.values())) > 90  # near-unique over distinct texts


def test_multimodal_plumbing(spark):
    df = multimodal.synth_media_df(spark, n=64)
    feats = multimodal.extract_features(df, fake=True).collect()
    assert len(feats) == 64
    for r in feats[:5]:
        assert len(r["features"]) == multimodal.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["features"])
    # determinism
    again = multimodal.extract_features(multimodal.synth_media_df(spark, n=64), fake=True).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))
    plan = multimodal.frame_sample_plan(df, every_n=50)
    assert plan.count() > 0
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_asof_join_matches_pandas_merge_asof(spark):
    import pandas as pd

    from rugo_spark.ops.joins import asof_join

    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "t": rng.integers(0, 1000, 200).astype("int64"),
            "lid": range(200),
        }
    ).sort_values("t").reset_index(drop=True)
    right = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 5, 80),
                "t": rng.integers(0, 1000, 80).astype("int64"),
                "rv": rng.integers(0, 10**6, 80).astype("int64"),
            }
        )
        .drop_duplicates(["k", "t"])
        .sort_values("t")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(left, right, on="t", by="k", direction="backward")
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right.rename(columns={"t": "rt"})),
        key="k", left_ts="t", right_ts="rt", right_cols=["rv"],
    ).toPandas().sort_values("lid").reset_index(drop=True)
    w = want.sort_values("lid").reset_index(drop=True)
    assert got["rv"].fillna(-1).tolist() == w["rv"].fillna(-1).tolist()


def test_range_join_matches_naive(spark):
    import pandas as pd

    from rugo_spark.ops.joins import range_join

    rng = np.random.default_rng(4)
    pts = pd.DataFrame({"pid": range(300), "v": rng.uniform(0, 100, 300)})
    ivs = pd.DataFrame(
        {"iid": range(20), "lo": rng.uniform(0, 90, 20)}
    )
    ivs["hi"] = ivs["lo"] + rng.uniform(1, 20, 20)
    got = (
        range_join(spark.createDataFrame(pts), spark.createDataFrame(ivs), "v", "lo", "hi", bucket_size=7.0)
        .select("pid", "iid").toPandas()
    )
    naive = pts.merge(ivs, how="cross")
    naive = naive[(naive.v >= naive.lo) & (naive.v < naive.hi)][["pid", "iid"]]
    assert sorted(map(tuple, got.values.tolist())) == sorted(map(tuple, naive.values.tolist()))


def test_embedding_near_dups_finds_clone(spark, emb):
    from rugo_spark.ops.similarity import embedding_near_dups

    # inject an exact clone of vec 0 under a new id
    clone = emb.limit(1).withColumn("vec_id", F.col("vec_id") + 10_000)
    both = emb.unionAll(clone)
    pairs = embedding_near_dups(both, threshold=0.999, bits=4).collect()
    assert any(r["id_a"] == 0 and r["id_b"] == 10_000 for r in pairs)


def test_simhash_batch_independent(spark, docs):
    """Same text must hash identically regardless of batch composition."""
    one = docs.limit(1).select("doc_id", "text")
    alone = dedup.simhash(one).collect()[0]["simhash"]
    with_crowd = {
        r["doc_id"]: r["simhash"] for r in dedup.simhash(docs.limit(200)).collect()
    }
    assert with_crowd[one.first()["doc_id"]] == alone


def test_tokenize_shape_and_determinism(spark, docs):
    from rugo_spark.ops.tokenize import VOCAB, tokenize

    t1 = tokenize(docs.limit(50)).toPandas().sort_values("doc_id").reset_index(drop=True)
    t2 = tokenize(docs.limit(50)).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert list(t1.columns) == ["doc_id", "tokens", "n_tok", "source"]
    for a, b in zip(t1["tokens"], t2["tokens"]):
        assert list(a) == list(b)
    flat = [t for row in t1["tokens"] for t in row]
    assert flat and all(0 <= t < VOCAB for t in flat)
    assert (t1["n_tok"] == t1["tokens"].map(len)).all()
