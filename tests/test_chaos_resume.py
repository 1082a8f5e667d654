"""Chaos/kill-resume tests for the sorted-encode and compaction paths
(VERDICT r3 item 9) — plus pins for the determinism bug this round's work
uncovered: Spark's ``repartitionByRange`` draws DIFFERENT boundaries on
every run (RDD-id-seeded sample), so the pre-fix sorted encode could not be
resumed safely at all.  The fix (deterministic seeded boundaries persisted
in ``_plan.json`` + murmur3 pre-image routing) is pinned here end to end.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

from rugo_spark import manifest as mf
from rugo_spark.engine import (
    compact_dataset,
    decode_table,
    encode_table,
    encode_table_sorted,
)
from rugo_spark.tokengen import spark_token_df

N_DOCS = 2500
N_PARTS = 6


@pytest.fixture()
def token_df(spark):
    return spark_token_df(spark, N_DOCS, n_partitions=5)


def _rows(out):
    return {r["partition_id"]: r for r in mf.completed_partitions(out)}


def test_sorted_encode_is_run_to_run_deterministic(spark, token_df, tmp_path):
    """The property resume depends on: two independent runs of the same
    sorted encode produce bit-identical blocks (repartitionByRange does NOT
    have this property — its boundary sample is RDD-id seeded)."""
    outs = {}
    for tag in ("a", "b"):
        out = str(tmp_path / tag)
        encode_table_sorted(token_df, out, key_col="doc_id", num_partitions=N_PARTS,
                            size_col="n_tok")
        outs[tag] = {p: (r["checksum"], r["n_rows"]) for p, r in _rows(out).items()}
    assert outs["a"] == outs["b"]


def test_sorted_encode_kill_resume_bit_identical(spark, token_df, tmp_path):
    """Kill after K sidecars (simulated: delete two sidecars + one block
    from a completed run), resume, assert (a) completed partitions were NOT
    re-encoded, (b) re-encoded ones are bit-identical, (c) decode returns
    every row exactly once, (d) key ranges stay disjoint."""
    out = str(tmp_path / "sorted")
    encode_table_sorted(token_df, out, key_col="doc_id", num_partitions=N_PARTS,
                        size_col="n_tok")
    rows1 = _rows(out)
    assert len(rows1) >= 3
    victims = sorted(rows1)[:2]
    os.remove(mf.sidecar_path(out, victims[0]))
    os.remove(rows1[victims[0]]["block_path"])
    os.remove(mf.sidecar_path(out, victims[1]))
    survivors = {p: os.path.getmtime(mf.sidecar_path(out, p)) for p in rows1
                 if p not in victims}
    encode_table_sorted(token_df, out, key_col="doc_id", num_partitions=N_PARTS,
                        size_col="n_tok")
    rows2 = _rows(out)
    assert set(rows2) == set(rows1)
    for p, t in survivors.items():
        assert os.path.getmtime(mf.sidecar_path(out, p)) == t, "survivor re-encoded"
    for p in victims:
        assert rows2[p]["checksum"] == rows1[p]["checksum"]
        assert rows2[p]["output_bytes"] == rows1[p]["output_bytes"]
    dec = decode_table(spark, out)
    assert dec.count() == N_DOCS
    assert dec.select("doc_id").distinct().count() == N_DOCS
    # disjoint key ranges survive the resume
    import json as _json

    ranges = sorted(
        (_json.loads(r["codecs"])["doc_id"]["min"], _json.loads(r["codecs"])["doc_id"]["max"])
        for r in rows2.values()
    )
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_sorted_resume_guards(spark, token_df, tmp_path):
    out = str(tmp_path / "guarded")
    encode_table_sorted(token_df, out, key_col="doc_id", num_partitions=N_PARTS,
                        size_col="n_tok")
    os.remove(mf.sidecar_path(out, 0))
    with pytest.raises(ValueError, match="num_partitions"):
        encode_table_sorted(token_df, out, key_col="doc_id", num_partitions=N_PARTS + 2,
                            size_col="n_tok")
    with pytest.raises(ValueError, match="key_col"):
        encode_table_sorted(token_df, out, key_col="source", num_partitions=N_PARTS,
                            size_col="n_tok")
    # a hash/mass-planned dataset must not be resumed by the sorted path …
    out2 = str(tmp_path / "hashed")
    encode_table(token_df, out2, key_col="doc_id", size_col="n_tok", num_partitions=4)
    os.remove(mf.sidecar_path(out2, 0))
    with pytest.raises(ValueError, match="different encode path|plan mode"):
        encode_table_sorted(token_df, out2, key_col="doc_id", num_partitions=4,
                            size_col="n_tok")
    # … and a range-planned dataset must not be resumed by encode_table
    with pytest.raises(ValueError, match="encode_table_sorted"):
        encode_table(token_df, out, key_col="doc_id", size_col="n_tok",
                     num_partitions=N_PARTS)


def test_sorted_corrupt_plan_raises(spark, token_df, tmp_path):
    out = str(tmp_path / "corrupt")
    encode_table_sorted(token_df, out, key_col="doc_id", num_partitions=N_PARTS,
                        size_col="n_tok")
    os.remove(mf.sidecar_path(out, 0))
    with open(os.path.join(out, mf.PLAN_FILE), "w") as f:
        f.write("{truncated")
    with pytest.raises(ValueError, match="corrupt"):
        encode_table_sorted(token_df, out, key_col="doc_id", num_partitions=N_PARTS,
                            size_col="n_tok")


@pytest.mark.parametrize("mode", ["concat", "rewrite"])
def test_compact_kill_rerun_converges(spark, token_df, tmp_path, mode):
    """Compaction is restart-from-scratch (it clears dst manifest+blocks
    first); the chaos contract is CONVERGENCE: a re-run over a partially
    populated dst — the state a mid-compact SIGKILL leaves — must produce
    output bit-identical to an uninterrupted compaction, with no stale-block
    row duplication."""
    src = str(tmp_path / "src")
    encode_table(token_df, src, key_col="doc_id", size_col="n_tok", num_partitions=8)
    ref_dst = str(tmp_path / "ref_dst")
    compact_dataset(spark, src, ref_dst, target_bytes=1 << 20, mode=mode)
    ref = {p: r["checksum"] for p, r in _rows(ref_dst).items()}
    assert len(ref) >= 2

    dst = str(tmp_path / "dst")
    compact_dataset(spark, src, dst, target_bytes=1 << 20, mode=mode)
    # simulate the kill: drop one sidecar, one block, corrupt nothing else
    rows = _rows(dst)
    victim = sorted(rows)[0]
    os.remove(mf.sidecar_path(dst, victim))
    os.remove(rows[victim]["block_path"])
    compact_dataset(spark, src, dst, target_bytes=1 << 20, mode=mode)
    got = {p: r["checksum"] for p, r in _rows(dst).items()}
    assert got == ref
    a = decode_table(spark, dst).orderBy("doc_id").toPandas()
    b = decode_table(spark, src).orderBy("doc_id").toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    for x, y in zip(a["tokens"].values, b["tokens"].values):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    shutil.rmtree(dst, ignore_errors=True)


def test_sorted_on_maponly_dataset_refuses_without_stamping_plan(spark, token_df, tmp_path):
    """A mistaken sorted call against a map-only dataset (completed sidecars,
    no _plan.json) must raise BEFORE writing its range plan — otherwise the
    stale foreign plan would block the dataset's legitimate resume path."""
    from rugo_spark.engine import encode_table_maponly

    out = str(tmp_path / "mo")
    encode_table_maponly(token_df.repartition(4), out, size_col="n_tok")
    os.remove(mf.sidecar_path(out, 0))
    with pytest.raises(ValueError, match="different encode path"):
        encode_table_sorted(token_df, out, key_col="doc_id", num_partitions=4,
                            size_col="n_tok")
    assert not os.path.exists(os.path.join(out, mf.PLAN_FILE)), "foreign plan stamped"
    # the legitimate resume still works afterwards
    encode_table_maponly(token_df.repartition(4), out, size_col="n_tok")
    assert len(mf.completed_partitions(out)) == 4
