"""Codec registry: lightweight integer codecs + byte-stream codecs.

Integer codecs operate on int64 logical values (``encode(np.ndarray) ->
bytes``, ``decode(bytes) -> np.ndarray[int64]``); the block layer handles
original dtypes and nulls.  Names mirror the reference's encoding vocabulary
(rugo ``metadata.cpp:89-112``).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

from rugo_spark.codecs import bss, dictionary, foref, fsst, general, plain, rle  # noqa: F401

# name → (encode, decode) over int64 arrays
INT_CODECS: dict[str, tuple[Callable[[np.ndarray], bytes], Callable[[bytes], np.ndarray]]] = {
    "plain": (plain.encode, plain.decode),
    "bss": (bss.encode, bss.decode),
    "for": (foref.for_encode, foref.for_decode),
    "delta": (foref.delta_encode, foref.delta_decode),
    "rle": (rle.encode, rle.decode),
    "dict": (dictionary.encode, dictionary.decode),
}

# name → (encode, decode) over raw bytes
BYTES_CODECS: dict[str, tuple[Callable[[bytes], bytes], Callable[[bytes], bytes]]] = {
    "fsst": (fsst.encode, fsst.decode),
    "raw": (lambda b: bytes(b), lambda b: bytes(b)),
}

INT_CODEC_IDS = {name: i for i, name in enumerate(sorted(INT_CODECS))}
BYTES_CODEC_IDS = {name: i + 64 for i, name in enumerate(sorted(BYTES_CODECS))}
CODEC_BY_ID = {v: k for k, v in {**INT_CODEC_IDS, **BYTES_CODEC_IDS}.items()}
