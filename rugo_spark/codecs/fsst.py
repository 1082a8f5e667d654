"""FSST-style string compression: static symbol table, escape-byte stream.

A from-scratch, numpy-vectorized take on the FSST idea ("Fast Static Symbol
Table", Boncz/Neumann/Leis, VLDB 2020 — public paper): compress a byte
stream with a table of ≤255 symbols of 1..8 bytes each; output codes are one
byte, code 255 escapes a literal byte.  Covers the reference's string-
compression encoding slots DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY
(rugo ``metadata.cpp:89-112`` enum ids 5, 6) in our codec menu.

Differences from the published FSST algorithm (deliberate, from-scratch):
the table is trained by bounded byte-pair-merge rounds (BPE-style) on a
sample, and encoding applies the same merge sequence vectorized — every pass
is whole-array numpy; there is no per-byte Python loop anywhere.

Payload layout (little-endian):
  u8 n_symbols | (u8 len | bytes)*n_symbols | u64 orig_len | u64 n_merges…
  …merge list is NOT stored (decode only needs expansions) |
  u64 stream_len | stream
"""

from __future__ import annotations

import struct

from dataclasses import dataclass, field

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 255  # output codes 0..254; 255 = escape
MAX_SYMBOL_LEN = 8
_MAX_MERGES = 160  # leaves ≥95 output codes for frequent single bytes
_SAMPLE_LIMIT = 1 << 20
_PAIR_K = np.uint32(1 << 16)


@dataclass
class Table:
    rounds: list[tuple[np.ndarray, np.ndarray]] = field(default_factory=list)  # (sorted pair keys, new codes)
    n_merges: int = 0
    expansions: list[bytes] = field(default_factory=list)  # per internal code ≥256
    code_map: np.ndarray | None = None  # internal code → output code (or -1)
    out_expansions: list[bytes] = field(default_factory=list)  # per output code


def _apply_round(codes: np.ndarray, pair_keys: np.ndarray, new_codes: np.ndarray) -> np.ndarray:
    """Replace every non-overlapping occurrence of the round's pairs in ONE
    vectorized pass (greedy-left overlap resolution via run parity)."""
    if len(codes) < 2 or len(pair_keys) == 0:
        return codes
    c32 = codes.astype(np.uint32, copy=False)
    pk = (c32[:-1] << np.uint32(16)) | c32[1:]
    idx = np.searchsorted(pair_keys, pk)
    idx_c = np.minimum(idx, len(pair_keys) - 1)
    cand = np.flatnonzero(pair_keys[idx_c] == pk)
    if len(cand) == 0:
        return codes
    # consecutive candidates overlap (share an element): keep even offsets
    is_start = np.concatenate(([True], np.diff(cand) != 1))
    run_start = cand[is_start][np.cumsum(is_start) - 1]
    keep = cand[((cand - run_start) & 1) == 0]
    codes[keep] = new_codes[idx_c[keep]]
    mask = np.ones(len(codes), dtype=bool)
    mask[keep + 1] = False
    return codes[mask]


def train(sample: bytes, max_merges: int = _MAX_MERGES, rounds: int = 4) -> Table:
    """Train a symbol table by bounded pair-merge rounds on ``sample``.
    Each round selects the highest-count pairs and applies them all in one
    vectorized pass (same batch application at encode time)."""
    t = Table()
    codes = np.frombuffer(sample[:_SAMPLE_LIMIT], dtype=np.uint8).astype(np.uint32)
    expansions: dict[int, bytes] = {}
    next_code = 256
    min_count = max(4, len(codes) // 65536)
    for r in range(rounds):
        if len(codes) < 2 or t.n_merges >= max_merges:
            break
        pairs = (codes[:-1] << np.uint32(16)) | codes[1:]
        uniq, counts = np.unique(pairs, return_counts=True)
        order = np.argsort(counts)[::-1]
        budget = (max_merges - t.n_merges + (rounds - r - 1)) // (rounds - r)
        sel_keys: list[int] = []
        sel_codes: list[int] = []
        for idx in order:
            if len(sel_keys) >= budget or counts[idx] < min_count:
                break
            a, b = int(uniq[idx] >> 16), int(uniq[idx] & 0xFFFF)
            exp_a = expansions.get(a, bytes([a]) if a < 256 else b"")
            exp_b = expansions.get(b, bytes([b]) if b < 256 else b"")
            exp = exp_a + exp_b
            if len(exp) > MAX_SYMBOL_LEN:
                continue
            expansions[next_code] = exp
            sel_keys.append(a * int(_PAIR_K) + b)
            sel_codes.append(next_code)
            next_code += 1
        if not sel_keys:
            break
        order2 = np.argsort(sel_keys)
        pair_keys = np.asarray(sel_keys, dtype=np.uint32)[order2]
        new_codes = np.asarray(sel_codes, dtype=np.uint32)[order2]
        t.rounds.append((pair_keys, new_codes))
        t.n_merges += len(sel_keys)
        codes = _apply_round(codes, pair_keys, new_codes)
    t.expansions = [expansions[c] for c in range(256, next_code)]

    # assign output codes: merged symbols first, then most frequent literals
    n_codes = next_code
    code_map = np.full(n_codes, -1, dtype=np.int64)
    out_expansions: list[bytes] = []
    for c in range(256, next_code):
        code_map[c] = len(out_expansions)
        out_expansions.append(expansions[c])
    lit_codes = codes[codes < 256]
    if len(lit_codes):
        lits, lit_counts = np.unique(lit_codes, return_counts=True)
        for lit in lits[np.argsort(lit_counts)[::-1]]:
            if len(out_expansions) >= MAX_SYMBOLS:
                break
            code_map[int(lit)] = len(out_expansions)
            out_expansions.append(bytes([int(lit)]))
    t.code_map = code_map
    t.out_expansions = out_expansions
    return t


def compress(data: bytes, t: Table) -> bytes:
    """Apply the trained merges + code assignment to ``data`` → code stream."""
    codes = np.frombuffer(data, dtype=np.uint8).astype(np.uint32)
    for pair_keys, new_codes in t.rounds:
        codes = _apply_round(codes, pair_keys, new_codes)
    assert t.code_map is not None
    out_code = t.code_map[codes.astype(np.int64)]
    has_code = out_code >= 0
    lens = np.where(has_code, 1, 2).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))
    out = np.empty(offs[-1], dtype=np.uint8)
    out[offs[:-1][has_code]] = out_code[has_code]
    esc = ~has_code
    if esc.any():
        eo = offs[:-1][esc]
        out[eo] = ESCAPE
        out[eo + 1] = codes[esc]  # escaped codes are always literal bytes < 256
    return out.tobytes()


def _decompress_stream(stream: np.ndarray, out_expansions: list[bytes]) -> bytes:
    """Vectorized decode of an escape-coded symbol stream."""
    n = len(stream)
    if n == 0:
        return b""
    n_sym = len(out_expansions)
    symlen = np.zeros(256, dtype=np.int64)
    symbytes = np.zeros((256, MAX_SYMBOL_LEN), dtype=np.uint8)
    for i, e in enumerate(out_expansions):
        symlen[i] = len(e)
        symbytes[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
    # find escapes: within each run of consecutive 0xFF bytes, even offsets
    pos = np.flatnonzero(stream == ESCAPE)
    if len(pos):
        is_start = np.concatenate(([True], np.diff(pos) != 1))
        run_start = pos[is_start][np.cumsum(is_start) - 1]
        esc_pos = pos[((pos - run_start) & 1) == 0]
    else:
        esc_pos = pos
    out_len = np.zeros(n, dtype=np.int64)
    is_sym = np.ones(n, dtype=bool)
    is_sym[esc_pos] = False
    lit_pos = esc_pos + 1
    is_sym[lit_pos[lit_pos < n]] = False
    out_len[is_sym] = symlen[stream[is_sym]]
    out_len[esc_pos] = 1
    offs = np.concatenate(([0], np.cumsum(out_len)))
    out = np.empty(offs[-1], dtype=np.uint8)
    sym_idx = np.flatnonzero(is_sym)
    codes = stream[sym_idx]
    so = offs[sym_idx]
    for k in range(MAX_SYMBOL_LEN):
        m = symlen[codes] > k
        out[so[m] + k] = symbytes[codes[m], k]
    ok = lit_pos < n
    out[offs[esc_pos[ok]]] = stream[lit_pos[ok]]
    return out.tobytes()


_HDR = struct.Struct("<B")


def encode(data: bytes) -> bytes:
    t = train(data)
    stream = compress(data, t)
    parts = [struct.pack("<B", len(t.out_expansions))]
    for e in t.out_expansions:
        parts.append(struct.pack("<B", len(e)))
        parts.append(e)
    parts.append(struct.pack("<QQ", len(data), len(stream)))
    parts.append(stream)
    return b"".join(parts)


def decode(buf: bytes | memoryview) -> bytes:
    mv = memoryview(buf)
    n_sym = mv[0]
    off = 1
    out_expansions: list[bytes] = []
    for _ in range(n_sym):
        ln = mv[off]
        out_expansions.append(bytes(mv[off + 1 : off + 1 + ln]))
        off += 1 + ln
    orig_len, stream_len = struct.unpack_from("<QQ", mv, off)
    off += 16
    stream = np.frombuffer(mv, dtype=np.uint8, count=stream_len, offset=off)
    out = _decompress_stream(stream, out_expansions)
    assert len(out) == orig_len, "fsst decode length mismatch"
    return out
