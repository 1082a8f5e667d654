"""CHECK constraints (`engine.set_constraint` — the Delta ADD CONSTRAINT
analog): SQL boolean expressions every future write must satisfy, enforced
at the append choke-point (merge/update route through it) against the
incoming rows only — one early-exit pass over the WRITE, never the table."""
from __future__ import annotations

import pytest

from rugo_spark import manifest as mf
from rugo_spark.engine import (
    append_table,
    decode_table,
    drop_constraint,
    encode_table,
    merge_table,
    set_constraint,
    update_where,
)
from rugo_spark.tokengen import token_batch

N_DOCS = 400


@pytest.fixture(scope="module")
def token_df(spark):
    return spark.createDataFrame(token_batch(N_DOCS).to_pandas()).cache()


@pytest.fixture()
def encoded(spark, token_df, tmp_out):
    encode_table(token_df, tmp_out, key_col="doc_id", size_col="n_tok",
                 num_partitions=3)
    set_constraint(tmp_out, "positive_tokens", "n_tok > 0")
    set_constraint(tmp_out, "has_source", "source IS NOT NULL")
    return tmp_out


def test_append_enforces_constraints(spark, token_df, encoded):
    import pyspark.sql.functions as F

    good = spark.createDataFrame(token_batch(50, seed=9).to_pandas())
    good = good.withColumn("doc_id", F.concat(F.lit("new-"), F.col("doc_id")))
    append_table(good, encoded)  # passes
    assert decode_table(spark, encoded).count() == N_DOCS + 50
    bad = good.withColumn("n_tok", F.lit(-1))
    with pytest.raises(ValueError, match="positive_tokens"):
        append_table(bad, encoded)
    # the failed write reserved nothing: no stale band blocks future appends
    assert not [m for m in mf.append_reservations(encoded) if not m["complete"]]
    assert decode_table(spark, encoded).count() == N_DOCS + 50


def test_update_and_merge_enforce(spark, token_df, encoded):
    import pyspark.sql.functions as F

    with pytest.raises(ValueError, match="positive_tokens"):
        update_where(spark, encoded, [("n_tok", ">=", 0)], {"n_tok": "-n_tok"})
    bad_src = token_df.limit(5).withColumn("source", F.lit(None).cast("string"))
    with pytest.raises(ValueError, match="has_source"):
        merge_table(bad_src, encoded, key_col="doc_id")
    assert decode_table(spark, encoded).count() == N_DOCS  # nothing landed


def test_null_passes_check_semantics(spark, token_df, encoded):
    """SQL CHECK: only FALSE violates — a NULL n_tok passes n_tok > 0."""
    import pyspark.sql.functions as F

    nully = (
        spark.createDataFrame(token_batch(5, seed=11).to_pandas())
        .withColumn("doc_id", F.concat(F.lit("nn-"), F.col("doc_id")))
        .withColumn("n_tok", F.lit(None).cast("int"))
    )
    append_table(nully, encoded)
    assert decode_table(spark, encoded).count() == N_DOCS + 5


def test_constraint_management(spark, token_df, encoded):
    import pyspark.sql.functions as F

    with pytest.raises(ValueError, match="does not resolve"):
        set_constraint(encoded, "bad", "no_such_col > 0")
    with pytest.raises(ValueError, match="no constraint"):
        drop_constraint(encoded, "nope")
    drop_constraint(encoded, "positive_tokens")
    bad = (
        spark.createDataFrame(token_batch(5, seed=12).to_pandas())
        .withColumn("doc_id", F.concat(F.lit("bb-"), F.col("doc_id")))
        .withColumn("n_tok", F.lit(-1))
    )
    append_table(bad, encoded)  # constraint dropped → accepted
    assert decode_table(spark, encoded).count() == N_DOCS + 5
