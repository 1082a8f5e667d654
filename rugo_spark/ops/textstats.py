"""Text analysis: language ID, quality scoring, token counting, fingerprints.

Everything except the rolling-hash fingerprint is built-in-only (codegen'd).
The fingerprint is a polynomial rolling hash over the document bytes — a
numpy kernel via mapInArrow (same vectorization rule as the engine).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# tiny public stopword marker lists per language (heuristic language ID)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "los", "de", "que", "es", "en", "una", "por", "con"],
}


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: count stopword-marker hits per language over
    lowercased whitespace tokens; argmax wins ('und' = undetermined)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    scores = [
        F.size(F.array_intersect(F.array_distinct(words), F.array(*[F.lit(w) for w in ws]))).alias(f"score_{lang}")
        for lang, ws in LANG_MARKERS.items()
    ]
    scored = df.select(F.col(id_col), *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{la}") for la in langs])
    pick = F.when(best <= 0, F.lit("und"))
    for la in langs:  # first-wins tie-break, deterministic order
        pick = pick.when(F.col(f"score_{la}") == best, F.lit(la))
    return scored.select(id_col, *[F.col(f"score_{la}") for la in langs], pick.alias("lang_pred"))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword / uppercase ratios + a 0-1 score."""
    text = F.col(text_col)
    n = F.length(text).cast("double")
    words = F.split(F.lower(F.trim(text)), r"\s+")
    # split('') yields [''] — empty docs have zero words, not one phantom
    n_words = F.when(n == 0, F.lit(0.0)).otherwise(F.size(words).cast("double"))
    punct = (n - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))).cast("double")
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin([*LANG_MARKERS["en"]]))
    ).cast("double")
    upper = (n - F.length(F.regexp_replace(text, r"[A-Z]", ""))).cast("double")
    mean_word_len = F.when(n_words > 0, n / n_words).otherwise(F.lit(0.0))
    score = (
        F.when((n >= 200) & (n <= 20000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((punct / F.greatest(n, F.lit(1.0))).between(0.005, 0.1), F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when((stop_hits / F.greatest(n_words, F.lit(1.0))) >= 0.05, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when((upper / F.greatest(n, F.lit(1.0))) <= 0.3, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return df.select(
        id_col,
        n.cast("long").alias("text_len"),
        n_words.cast("long").alias("n_words"),
        punct.cast("long").alias("punct_chars"),
        stop_hits.cast("long").alias("en_stopword_hits"),
        mean_word_len.alias("mean_word_len"),
        score.alias("quality_score"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish piece estimate, built-ins only.

    Pieces = maximal alphanumeric runs + individual symbol characters (the
    shape of the public GPT-2 pre-tokenizer); expressed without regex
    lookarounds so an RE2-based oracle (DuckDB) can reproduce it exactly."""
    text = F.trim(F.col(text_col))
    # split('') yields [''] (size 1) — an empty doc has zero tokens
    ws = F.when(F.length(text) == 0, F.lit(0)).otherwise(F.size(F.split(text, r"\s+")))
    alnum_runs = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+"), 0))
    symbols = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return df.select(
        id_col,
        ws.cast("long").alias("n_ws_tokens"),
        (alnum_runs + symbols).cast("long").alias("n_subword_pieces"),
        F.ceil(F.length(text) / 4).cast("long").alias("n_tok_est_len4"),
    )


def repetition_ratio(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5) -> DataFrame:
    """Boilerplate/repetition signal: 1 − distinct/total character n-grams.

    High values flag template-y or looping documents (a standard pretraining
    quality filter).  Built-ins only; ties out exactly against a SQL oracle."""
    text = F.col(text_col)
    # length guard: Spark's sequence(1, 0) is descending [1, 0], not empty
    grams = F.expr(
        f"if(length({text_col}) < {n}, array(),"
        f" transform(sequence(1, length({text_col}) - {n - 1}),"
        f" i -> substr({text_col}, i, {n})))"
    )
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return df.select(
        id_col,
        total.cast("long").alias("total_ngrams"),
        distinct.cast("long").alias("distinct_ngrams"),
        F.when(total > 0, 1.0 - distinct.cast("double") / total.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("repetition_ratio"),
    )


PII_PATTERNS = {  # RE2-safe (no lookaround/backrefs) so SQL oracles match
    "n_emails": r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z][a-zA-Z]+",
    "n_urls": r"https?://[^\s]+",
    "n_phoneish": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
}


def pii_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Counts of PII-ish spans (emails / URLs / phone-like digit runs) — the
    screening pass a training pipeline runs before redaction."""
    cols = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).cast("long").alias(name)
        for name, pat in PII_PATTERNS.items()
    ]
    return df.select(id_col, *cols)


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Polynomial rolling-hash document fingerprint (numpy kernel, mapInArrow).

    hash = Horner fold of ALL document bytes mod 2^64 with P = 1099511628211,
    xor'd with len·P — an exact content key (two docs differing anywhere
    differ), unlike the earlier 64-byte-prefix sketch.  Vectorization: rows
    sorted by length descending so byte position k touches a contiguous
    PREFIX of the batch (no boolean masks); total work is O(total_bytes)
    numpy gathers.
    """
    import pyarrow as pa

    P = np.uint64(1099511628211)

    def kernel(batches):
        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1)
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            bufs = texts.buffers()
            offs = np.frombuffer(bufs[1], np.int32, count=len(texts) + 1, offset=texts.offset * 4).astype(np.int64)
            data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
            lens = np.diff(offs)
            n = len(lens)
            starts = offs[:-1]
            out = np.zeros(n, dtype=np.uint64)
            # one long outlier must not degrade the whole batch to an
            # O(maxlen) Python loop (plus an O(maxlen) bincount): rows above
            # LONG switch to the closed form Σ bᵢ·P^(L-1-i) — identical to
            # the Horner fold mod 2^64 (uint64 cumprod/sum wrap IS the mod)
            LONG = 1 << 16
            with np.errstate(over="ignore"):
                short = np.flatnonzero(lens <= LONG)
                if len(short):
                    order = np.argsort(-lens[short], kind="stable")
                    sl = lens[short][order]
                    ss = starts[short][order]
                    maxlen = int(sl[0]) if len(sl) else 0
                    acc = np.zeros(len(short), dtype=np.uint64)
                    # remaining[k] = rows with len > k = sorted prefix at byte k
                    remaining = len(short) - np.cumsum(np.bincount(sl, minlength=maxlen + 1))
                    for k in range(maxlen):
                        p = int(remaining[k])
                        acc[:p] = acc[:p] * P + data[ss[:p] + k]
                    tmp = np.empty(len(short), dtype=np.uint64)
                    tmp[order] = acc
                    out[short] = tmp
                for i in np.flatnonzero(lens > LONG):
                    L, s = int(lens[i]), int(starts[i])
                    pw = np.empty(L, dtype=np.uint64)
                    pw[0] = 1
                    np.cumprod(np.full(L - 1, P, dtype=np.uint64), out=pw[1:])
                    out[i] = (data[s : s + L].astype(np.uint64) * pw[::-1]).sum()
                out ^= lens.astype(np.uint64) * P
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out.view(np.int64), type=pa.int64())],
                names=[batch.schema.names[0], "fingerprint"],
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInArrow(kernel, f"{id_col} {id_type}, fingerprint long")
