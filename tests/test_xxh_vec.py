"""Pins for the r6 vectorized minhash internals.

Three layers, each against an independent formulation:

1. ``ops/xxh.py``'s numpy xxHash64 kernels vs the sequential from-spec
   implementation in ``oracle_recompute`` (adversarial lengths crossing
   every 32/8/4/1-byte phase boundary, multiple seeds, unicode bytes).
2. The numpy string kernel vs Spark's own ``F.xxhash64`` (the bit-identity
   the LSH signature relies on: ``xxhash64(s, lit(j)) == xxh64_int(j,
   seed=xxh64_bytes(utf8(s), 42))``).
3. ``_word_minhash_bands`` (the Arrow kernel) vs the SQL formulation it
   replaced (``_shingled`` + ``minhash_signature`` + band explode) on texts
   with empty tokens, repeated shingles, unicode, and too-short docs —
   including the single-task union-find vs the iterative label-propagation
   loop in ``connected_components``.
"""

from __future__ import annotations

import numpy as np
import pytest

import pyspark.sql.functions as F


def test_xxh64_vec_matches_from_spec_oracle():
    from rugo_spark.oracle_recompute import xxh64_bytes, xxh64_int, xxh64_long
    from rugo_spark.ops.xxh import (xxh64_bytes_vec, xxh64_int_const_vec,
                                    xxh64_long_vec)

    rng = np.random.default_rng(7)
    strs = [bytes(rng.integers(0, 256, L, dtype=np.uint8))
            for L in list(range(0, 70)) + [95, 96, 97, 127, 128, 129, 200, 1000]]
    strs += [b"", "héllo wörld ünïcode ø".encode()]
    data = np.frombuffer(b"".join(strs), dtype=np.uint8)
    lens = np.array([len(s) for s in strs], dtype=np.int64)
    starts = np.zeros(len(lens), np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    for seed in (42, 0, 2**63 + 5, 12345):
        got = xxh64_bytes_vec(data, starts, lens, seed)
        exp = np.array([xxh64_bytes(s, seed) for s in strs], dtype=np.uint64)
        assert np.array_equal(got, exp), seed

    seeds = xxh64_bytes_vec(data, starts, lens, 42)
    for j in (0, 1, 15):
        got = xxh64_int_const_vec(j, seeds)
        exp = np.array([xxh64_int(j, int(s)) for s in seeds], dtype=np.uint64)
        assert np.array_equal(got, exp), j

    vs = rng.integers(0, 2**64, len(seeds), dtype=np.uint64)
    got = xxh64_long_vec(vs, seeds)
    exp = np.array(
        [xxh64_long(int(v), int(s)) for v, s in zip(vs, seeds)], dtype=np.uint64
    )
    assert np.array_equal(got, exp)


def test_xxh64_vec_matches_spark_builtin(spark):
    from rugo_spark.ops.xxh import xxh64_bytes_vec, xxh64_int_const_vec

    texts = [
        "", " ", "a", "abc def", "x" * 31, "y" * 32, "z" * 33, "w" * 200,
        "héllo wörld", "tab\tsep", "très long mot " * 10,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    exp = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    exp_seeded = [r[0] for r in df.select(F.xxhash64("s", F.lit(3))).collect()]
    bs = [t.encode() for t in texts]
    data = np.frombuffer(b"".join(bs), dtype=np.uint8)
    lens = np.array([len(b) for b in bs], dtype=np.int64)
    starts = np.zeros(len(lens), np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    got = xxh64_bytes_vec(data, starts, lens, 42).view(np.int64)
    assert got.tolist() == exp
    got3 = xxh64_int_const_vec(3, got.view(np.uint64)).view(np.int64)
    assert got3.tolist() == exp_seeded


_TRICKY_TEXTS = [
    (1, "plain three word shingles here ok"),
    (2, "two words"),                           # below shingle length -> dropped
    (3, ""),                                    # empty -> dropped
    (4, None),                                  # null text -> dropped
    (5, "  leading and   multiple   spaces"),   # split() empty-token semantics
    (6, "rep rep rep rep rep rep"),             # repeated shingles (distinct-min)
    (7, "münchen über straße café naïve"),  # unicode
    (8, "one two three"),                       # exactly one shingle
    (9, "tab\tand\nnewline separated words here"),
    (10, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
]


@pytest.mark.parametrize("n_hashes,n_bands", [(16, 4), (8, 2)])
def test_word_kernel_matches_sql_formulation(spark, n_hashes, n_bands):
    from rugo_spark.ops import dedup as dd

    df = spark.createDataFrame(_TRICKY_TEXTS, "doc_id long, text string")
    rpb = n_hashes // n_bands
    sig = (
        dd._shingled(df, "text", "doc_id", 3, "word")
        .filter(F.size("_sh") > 0)
        .select(F.col("doc_id"), dd.minhash_signature(F.col("_sh"), n_hashes).alias("sig"))
    )
    old = sig.select(
        "doc_id", "sig",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.element_at("sig", b * rpb + r + 1) for r in range(rpb)]).alias("band_key"),
            ) for b in range(n_bands)
        ])).alias("bk"),
    ).select("doc_id", "sig", "bk.band", "bk.band_key")
    new = dd._word_minhash_bands(df, "text", "doc_id", 3, n_hashes, n_bands)
    key = lambda r: (r["doc_id"], r["band"])
    old_rows = sorted([r.asDict() for r in old.collect()], key=key)
    new_rows = sorted([r.asDict() for r in new.collect()], key=key)
    assert old_rows == new_rows
    assert {r["doc_id"] for r in new_rows} == {1, 5, 6, 7, 8, 9, 10}


def test_components_local_matches_iterative_loop(spark):
    from rugo_spark.ops.dedup import connected_components

    # chain + star + singleton-free isolated pair, with string AND int ids
    edges_int = [(1, 2), (2, 3), (3, 4), (10, 11), (12, 10), (20, 21)]
    for typ, rows in (
        ("long", edges_int),
        ("string", [(f"d-{a:03d}", f"d-{b:03d}") for a, b in edges_int]),
    ):
        df = spark.createDataFrame(rows, f"id_a {typ}, id_b {typ}")
        fast = connected_components(df).collect()
        slow = connected_components(df, local_edge_limit=0).collect()
        assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))
        got = {r["v"]: r["cluster_id"] for r in fast}
        if typ == "long":
            assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
                           20: 20, 21: 20}
