"""Regression pins for the round-4 session-2 review pass (dedup kernels,
partition planner edge cases, streaming epoch completeness, docgen)."""

from __future__ import annotations

import os

import numpy as np
import pyspark.sql.functions as F
import pytest

from rugo_spark.docgen import doc_batch
from rugo_spark.ops.dedup import minhash_lsh_candidates, simhash


def test_simhash_trailing_null_text_does_not_crash(spark):
    """A zero-length doc at the END of an Arrow batch used to hand
    np.add.reduceat an index == len(votes) → IndexError killed the task."""
    from rugo_spark.oracle_recompute import simhash_row

    rows = [(1, "some real words here"), (2, None), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    got = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    assert set(got) == {1, 2, 3, 4}
    # null text → zero-length token list → simhash 0 (the crash case was a
    # TRAILING zero-length list); "" splits to [""] — one empty token — in
    # both engines, so it matches the sequential oracle, not 0
    assert got[2] == got[4] == 0
    assert got[3] == simhash_row("")
    assert got[1] == simhash_row("some real words here")


def test_encode_empty_table_is_clean_noop(spark, tmp_path):
    """Empty input used to crash the planner with mismatched plan arrays
    ('All arrays must be of the same length' from pandas)."""
    from rugo_spark.engine import encode_table
    from rugo_spark.tokengen import spark_token_df

    df = spark_token_df(spark, 100, n_partitions=2).filter(F.col("n_tok") < 0)
    out = str(tmp_path / "empty")
    man = encode_table(df, out, key_col="doc_id", size_col="n_tok")
    assert man.count() == 0


def test_zero_size_rows_spread_across_partitions(spark):
    """Rows with size 0/null carry no mass, so their salt term vanished and
    ALL of them collapsed onto one partition — a row-count hot spot on
    corpora with many empty docs.  They now place hash-uniformly."""
    from rugo_spark.partitioning import with_partition_id

    rows = [(f"d{i}", 0 if i % 2 == 0 else 100) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    planned, n, total, _ = with_partition_id(
        df, num_partitions=8, size_col="n_tok", key_col="doc_id"
    )
    pids = (
        planned.filter(F.col("n_tok") == 0)
        .groupBy("__rugo_pid")
        .count()
        .collect()
    )
    assert len(pids) >= 6, f"zero-size rows concentrated in {len(pids)} partitions"
    counts = sorted(r["count"] for r in pids)
    assert counts[-1] < 1000 * 0.5  # no single-partition pile-up


def test_minhash_rejects_indivisible_bands(spark):
    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_candidates(df, n_hashes=32, n_bands=5)


def test_decode_batches_skips_incomplete_epoch(spark, tmp_path):
    """An epoch dir without the _epoch_complete marker (mid-crash state)
    must be invisible to decode_batches unless explicitly requested."""
    import pyarrow.parquet as pq

    from rugo_spark.streaming import EPOCH_MARKER, decode_batches, encode_stream
    from rugo_spark.tokengen import token_batch

    src = tmp_path / "src"
    src.mkdir()
    for i in range(2):
        pq.write_table(token_batch(200, start=i * 200), str(src / f"f{i}.parquet"))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    stream = (
        spark.readStream.schema("doc_id string, tokens array<int>, n_tok int, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = encode_stream(stream, out, ck, target_tokens=100_000).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(300)
    assert decode_batches(spark, out).count() == 400
    # simulate a crash mid-epoch: drop batch=1's marker
    os.remove(os.path.join(out, "batch=1", EPOCH_MARKER))
    assert decode_batches(spark, out).count() == 200
    assert decode_batches(spark, out, include_incomplete=True).count() == 400
    # no complete epoch at all → loud error naming the marker
    os.remove(os.path.join(out, "batch=0", EPOCH_MARKER))
    with pytest.raises(ValueError, match=EPOCH_MARKER):
        decode_batches(spark, out)


def test_docgen_exact_dup_fraction_matches_plant():
    """Dup-of-dup chains now resolve to the root unique doc, so the realized
    exact-duplicate fraction matches the documented ~10% plant (pre-fix it
    silently undershot: a dup whose base was itself a dup reproduced text
    that duplicated NO existing doc)."""
    from collections import Counter

    n = 20_000
    texts = doc_batch(n).column("text").to_pylist()
    dup_rows = sum(v - 1 for v in Counter(texts).values() if v > 1)
    # sel in [80,90) → exact dup; chains resolved → nearly all land on a
    # real earlier text (clamp-at-0 and self-base edge cases shave a little)
    assert 0.08 <= dup_rows / n <= 0.13, dup_rows / n


def test_docgen_doc_ids_unique_at_large_offsets():
    """U12 id cast truncated ids ≥ 10^12 into colliding doc_ids."""
    t = doc_batch(3, start=10**12 - 1)
    ids = t.column("doc_id").to_pylist()
    assert len(set(ids)) == 3
    assert ids == sorted(ids)
