"""Deterministic generator for the north-star input table.

Produces ``(doc_id string, tokens array<int32>, n_tok int32, source string)``
(BASELINE.json input_hint) with realistic structure: Zipfian token ids
(dictionary/bit-pack friendly), a long-tailed lognormal ``n_tok``
distribution (the skew the partitioner must defuse), and a handful of
``source`` values (RLE-friendly).  Seeded numpy only — no wall-clock, no
external data — so every run is bit-identical (resume/oracle stable).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SOURCES = ["web", "books", "code", "wiki", "forums"]
VOCAB = 50257  # GPT-2-ish vocabulary size — public constant


def token_batch(n_docs: int, seed: int = 42, start: int = 0,
                mean_len: float = 400.0, sigma: float = 1.0) -> pa.Table:
    """Generate ``n_docs`` rows deterministically (rows ``start..start+n``).

    ``start`` offsets doc ids *and* the RNG stream so disjoint batches tile
    into one consistent table.
    """
    rng = np.random.default_rng(np.random.SeedSequence([seed, start]))
    mu = np.log(mean_len) - sigma * sigma / 2.0
    n_tok = np.maximum(1, rng.lognormal(mu, sigma, n_docs)).astype(np.int64)
    n_tok = np.minimum(n_tok, 16384)
    total = int(n_tok.sum())
    flat = rng.zipf(1.2, total)
    flat = np.minimum(flat, VOCAB - 1).astype(np.int32)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    tokens = pa.LargeListArray.from_arrays(offsets, pa.array(flat, type=pa.int32())).cast(
        pa.list_(pa.int32())
    )
    ids = np.arange(start, start + n_docs)
    doc_id = pa.array(np.char.add("doc-", np.char.zfill(ids.astype("U12"), 12)))
    source = pa.array(np.array(SOURCES)[rng.integers(0, len(SOURCES), n_docs)])
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(n_tok.astype(np.int32), type=pa.int32()),
            "source": source,
        }
    )


def write_token_table(path: str, n_docs: int, seed: int = 42, batch_docs: int = 100_000) -> None:
    """Write the token table to parquet in bounded-memory batches."""
    import pyarrow.parquet as pq

    first = token_batch(min(batch_docs, n_docs), seed=seed, start=0)
    with pq.ParquetWriter(path, first.schema, compression="zstd") as w:
        w.write_table(first)
        done = len(first["doc_id"])
        while done < n_docs:
            t = token_batch(min(batch_docs, n_docs - done), seed=seed, start=done)
            w.write_table(t)
            done += t.num_rows


def spark_token_df(spark, n_docs: int, seed: int = 42, n_partitions: int = 32):
    """Distributed deterministic generation — one ``mapInArrow`` task per slice.

    Scale story: at 10^12 sequences no single node generates the table; each
    executor generates its own disjoint ``start`` range from the shared seed.
    """
    bounds = np.linspace(0, n_docs, n_partitions + 1, dtype=np.int64)
    slices = [(int(a), int(b - a)) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
    sdf = spark.createDataFrame(slices, "start long, count long").repartition(len(slices), "start")

    def gen(batches):
        for batch in batches:
            starts = batch.column("start").to_numpy()
            counts = batch.column("count").to_numpy()
            for s, c in zip(starts, counts):
                t = token_batch(int(c), seed=seed, start=int(s))
                for rb in t.to_batches(max_chunksize=8192):
                    yield rb

    return sdf.mapInArrow(gen, "doc_id string, tokens array<int>, n_tok int, source string")
