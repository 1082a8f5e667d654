"""Deterministic tokenizer: text → token-id arrays (north-star table shape).

A hash tokenizer over GPT-2-style pre-token pieces (alphanumeric runs +
individual symbols — the public pre-tokenizer shape): every piece maps to
``xxhash64(piece) mod vocab``.  Pure Spark built-ins — the pieces split is
one ``regexp_extract_all``, the id mapping one ``transform`` — so the
documents→tokens bridge runs JVM-side at full codegen speed, and its output
feeds ``encode_table`` directly (doc_id, tokens array<int>, n_tok, source).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

VOCAB = 50257  # GPT-2-ish vocabulary size — public constant
_PIECES_RE = r"[a-z0-9]+|[^a-z0-9\s]"


def tokenize(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str | None = "source",
    vocab: int = VOCAB,
) -> DataFrame:
    """→ ``(doc_id, tokens array<int>, n_tok int, source)`` from raw text."""
    pieces = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_PIECES_RE), 0)
    tokens = F.transform(pieces, lambda p: F.pmod(F.xxhash64(p), F.lit(vocab)).cast("int"))
    cols = [
        F.col(id_col),
        tokens.alias("tokens"),
        F.size(tokens).cast("int").alias("n_tok"),
    ]
    if source_col and source_col in df.columns:
        cols.append(F.col(source_col))
    return df.select(*cols)
