"""hash_sample: deterministic, partitioning-invariant sampling."""

from __future__ import annotations

import pandas as pd
import pytest

from rugo_spark.ops.sampling import hash_sample


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(4000),
            "lang": [["en", "fr", "de", "it"][i % 4] for i in range(4000)],
        }
    )
    return spark.createDataFrame(pdf)


def test_fraction_rate_and_determinism(spark, docs):
    a = hash_sample(docs, fraction=0.25).orderBy("doc_id").toPandas()
    b = hash_sample(docs.repartition(7), fraction=0.25).orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(a, b)  # partitioning-invariant
    assert 0.2 < len(a) / 4000 < 0.3


def test_stratified_fractions(spark, docs):
    got = hash_sample(
        docs, fractions={"en": 0.5, "fr": 0.1}, stratum_col="lang"
    ).groupBy("lang").count().collect()
    rates = {r["lang"]: r["count"] / 1000 for r in got}
    assert set(rates) == {"en", "fr"}  # unlisted strata dropped
    assert 0.4 < rates["en"] < 0.6 and 0.03 < rates["fr"] < 0.2


def test_seed_changes_subset(spark, docs):
    a = {r["doc_id"] for r in hash_sample(docs, fraction=0.3, seed=1).collect()}
    b = {r["doc_id"] for r in hash_sample(docs, fraction=0.3, seed=2).collect()}
    assert a != b and len(a & b) > 0


def test_nested_sample_property(spark, docs):
    # hash gates nest: a 10% sample is a subset of the 30% sample (same seed)
    small = {r["doc_id"] for r in hash_sample(docs, fraction=0.1).collect()}
    big = {r["doc_id"] for r in hash_sample(docs, fraction=0.3).collect()}
    assert small <= big


def test_arg_validation(spark, docs):
    with pytest.raises(ValueError):
        hash_sample(docs)
    with pytest.raises(ValueError):
        hash_sample(docs, fraction=0.1, fractions={"en": 0.2})
    with pytest.raises(ValueError):
        hash_sample(docs, fractions={"en": 0.2})  # no stratum_col
