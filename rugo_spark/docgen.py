"""Deterministic generator for a dedup-shaped ``documents`` table.

The driver's ``documents.parquet`` caps at 5k rows (sf0.1) — too small to
wall-clock the dedup pipeline (fixed per-round costs dominate, VERDICT r3).
This generator tiles to any size with a KNOWN duplicate structure so the
bench can (a) run LSH/connected-components at 600k+ docs and (b) sanity-check
the found-duplicate fraction against the planted one.

Planted structure, decided per absolute doc id (so any partitioning of the
id range yields the identical corpus — same resume/scale-out contract as
``tokengen``):

- ~80% unique docs (fresh word sequence from the doc's own id),
- ~10% EXACT duplicates of an earlier doc (same word sequence),
- ~10% NEAR duplicates: an earlier doc's words with 3 positions rewritten.

Everything derives from splitmix64 mixing of (seed, id) — seeded arithmetic
only, no wall clock, no external data.  Word draws are skewed (u² mapping)
so shingle hashing sees the repeated-substring distribution real crawl text
has, and doc length varies 30–70 words (~250–600 chars).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_M64 = (1 << 64) - 1
VOCAB = 4096  # distinct words
LANGS = ["en", "de", "fr", "es"]
SOURCES = ["web", "books", "code", "wiki", "forums"]


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_M64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_M64)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(_M64)
    return x ^ (x >> np.uint64(31))


def _h(seed: int, *streams: np.ndarray) -> np.ndarray:
    out = np.full_like(streams[0], seed, dtype=np.uint64)
    for s in streams:
        out = _mix(out ^ s.astype(np.uint64))
    return out


_WORDS = None


def _word_list() -> np.ndarray:
    """VOCAB deterministic pseudo-words, lengths 3-9, lowercase letters."""
    global _WORDS
    if _WORDS is None:
        j = np.arange(VOCAB, dtype=np.uint64)
        ln = 3 + (_h(7, j) % np.uint64(7)).astype(np.int64)
        letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)
        words = []
        for i in range(VOCAB):
            hs = _h(11, np.full(int(ln[i]), i, dtype=np.uint64),
                    np.arange(int(ln[i]), dtype=np.uint64))
            words.append(letters[(hs % np.uint64(26)).astype(np.int64)].tobytes().decode())
        _WORDS = np.array(words)
    return _WORDS


def doc_batch(
    n_docs: int, seed: int = 42, start: int = 0, mega_every: int | None = None
) -> pa.Table:
    """Rows ``start..start+n_docs`` of the corpus, as one Arrow table.

    ``mega_every``: adversarial-skew mode (VERDICT r4 item 3) — every id
    divisible by it becomes an EXACT copy of doc 0, planting one
    mega-cluster of ``n/mega_every`` identical docs (the boilerplate-crawl
    shape: k ≈ 10⁵-10⁶ docs sharing every LSH band).  Still a pure function
    of the id, so any slicing yields the identical corpus."""
    words = _word_list()
    ids = np.arange(start, start + n_docs, dtype=np.uint64)
    u = _h(seed, ids)
    sel = (u % np.uint64(100)).astype(np.int64)
    # base id: self for unique docs; an earlier doc (within 1000) for dups.
    # Resolve CHAINS to a fixed point: a base that is itself a dup renders
    # its own base's words, so stopping after one hop would generate text
    # that duplicates no existing doc (~20% of dup picks) and the realized
    # exact-dup fraction would silently undershoot the documented ~10%.
    # Pure function of the id → still slice-deterministic.
    back = np.uint64(1) + (_h(seed + 1, ids) % np.uint64(1000))
    base = np.where(sel < 80, ids, np.maximum(np.int64(0), ids.astype(np.int64) - back.astype(np.int64)).astype(np.uint64))
    for _ in range(64):  # P(chain > 64 hops) ~ 0.2^64
        bsel = (_h(seed, base) % np.uint64(100)).astype(np.int64)
        bback = np.uint64(1) + (_h(seed + 1, base) % np.uint64(1000))
        nxt = np.where(
            (bsel < 80) | (base == 0),
            base,
            np.maximum(np.int64(0), base.astype(np.int64) - bback.astype(np.int64)).astype(np.uint64),
        )
        if np.array_equal(nxt, base):
            break
        base = nxt
    if mega_every:
        mega = ids % np.uint64(mega_every) == 0
        base = np.where(mega, np.uint64(0), base)
        # exact-dup selector band: keeps the near-dup rewrite branch off
        sel = np.where(mega, np.int64(85), sel)
    n_words = (30 + (_h(seed + 2, base) % np.uint64(41)).astype(np.int64))
    texts = []
    for k in range(n_docs):
        b, L = base[k], int(n_words[k])
        hw = _h(seed + 3, np.full(L, b, dtype=np.uint64), np.arange(L, dtype=np.uint64))
        # skew the word distribution: u² mapping concentrates mass at low ids.
        # clamp: float64 spacing at 2^64 is 4096, so a hash within 2048 of
        # 2^64 rounds frac to exactly 1.0 and idx to VOCAB (out of bounds)
        frac = hw.astype(np.float64) / float(1 << 64)
        idx = np.minimum((frac * frac * VOCAB).astype(np.int64), VOCAB - 1)
        ws = words[idx]
        if sel[k] >= 90 and base[k] != ids[k]:  # near-dup: rewrite 3 positions
            pos = (_h(seed + 4, np.full(3, ids[k], dtype=np.uint64),
                      np.arange(3, dtype=np.uint64)) % np.uint64(L)).astype(np.int64)
            rep = (_h(seed + 5, np.full(3, ids[k], dtype=np.uint64),
                      np.arange(3, dtype=np.uint64)) % np.uint64(VOCAB)).astype(np.int64)
            ws = ws.copy()
            ws[pos] = words[rep]
        texts.append(" ".join(ws))
    lang_pick = (_h(seed + 6, ids) % np.uint64(10)).astype(np.int64)
    lang = np.array(LANGS)[np.minimum(lang_pick, 3)]  # 0-3 → de/fr/es only on 1,2,3
    lang = np.where(lang_pick >= 4, "en", lang)
    source = np.array(SOURCES)[(_h(seed + 7, ids) % np.uint64(5)).astype(np.int64)]
    # U20: a U12 cast TRUNCATES ids >= 10^12 to colliding strings; 14-digit
    # zfill keeps ordering for any corpus this generator can address
    doc_id = np.char.add("d-", np.char.zfill(ids.astype("U20"), 14))
    return pa.table(
        {
            "doc_id": pa.array(doc_id),
            "text": pa.array(texts),
            "lang": pa.array(lang),
            "source": pa.array(source),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int32)),
        }
    )


def spark_doc_df(
    spark, n_docs: int, seed: int = 42, n_partitions: int = 32,
    mega_every: int | None = None,
):
    """Distributed deterministic generation — disjoint id slices per task
    (same scale shape as ``tokengen.spark_token_df``)."""
    bounds = np.linspace(0, n_docs, n_partitions + 1, dtype=np.int64)
    slices = [(int(a), int(b - a)) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
    sdf = spark.createDataFrame(slices, "start long, count long").repartition(len(slices), "start")

    def gen(batches):
        for batch in batches:
            starts = batch.column("start").to_numpy()
            counts = batch.column("count").to_numpy()
            for s, c in zip(starts, counts):
                t = doc_batch(int(c), seed=seed, start=int(s), mega_every=mega_every)
                for rb in t.to_batches(max_chunksize=4096):
                    yield rb

    return sdf.mapInArrow(
        gen, "doc_id string, text string, lang string, source string, n_chars int"
    )
