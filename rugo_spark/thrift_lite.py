"""Minimal Thrift compact-protocol scanner for Parquet footers.

PyArrow's footer binding does not expose three per-column-chunk fields the
reference parses (``index_page_offset``, ``bloom_filter_offset`` /
``bloom_filter_length``, per-chunk ``key_value_metadata`` — rugo
``metadata.cpp:536-581``), so this module walks just enough of the footer's
FileMetaData struct to extract them, skipping every other field generically.
Written from the public Thrift compact-protocol and parquet-format specs
(parquet.thrift: ColumnMetaData fields 8/10/14/15) — not a port of the
reference's C++ decoder.
"""

from __future__ import annotations

# compact-protocol wire types
_STOP, _TRUE, _FALSE, _BYTE, _I16, _I32, _I64, _DOUBLE, _BINARY, _LIST, _SET, _MAP, _STRUCT = range(13)


def _uvarint(buf: memoryview, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _zigzag(buf: memoryview, pos: int) -> tuple[int, int]:
    u, pos = _uvarint(buf, pos)
    return (u >> 1) ^ -(u & 1), pos


def _skip(buf: memoryview, pos: int, t: int) -> int:
    if t in (_TRUE, _FALSE):
        return pos
    if t == _BYTE:
        return pos + 1
    if t in (_I16, _I32, _I64):
        return _uvarint(buf, pos)[1]
    if t == _DOUBLE:
        return pos + 8
    if t == _BINARY:
        ln, pos = _uvarint(buf, pos)
        return pos + ln
    if t in (_LIST, _SET):
        head = buf[pos]
        pos += 1
        size = head >> 4
        et = head & 0xF
        if size == 15:
            size, pos = _uvarint(buf, pos)
        if et in (_TRUE, _FALSE):
            # list<bool> elements are one byte each on the wire (unlike the
            # zero-byte struct-field bool encoding _skip(_TRUE/_FALSE) models)
            return pos + size
        for _ in range(size):
            pos = _skip(buf, pos, et)
        return pos
    if t == _MAP:
        size, pos = _uvarint(buf, pos)
        if size == 0:
            return pos
        kv = buf[pos]
        pos += 1
        kt, vt = kv >> 4, kv & 0xF
        for _ in range(size):
            pos = _skip(buf, pos, kt)
            pos = _skip(buf, pos, vt)
        return pos
    if t == _STRUCT:
        fid = 0
        while True:
            b = buf[pos]
            pos += 1
            if b == 0:
                return pos
            delta, ft = b >> 4, b & 0xF
            if delta:
                fid += delta
            else:
                fid, pos = _zigzag(buf, pos)
            pos = _skip(buf, pos, ft)
    raise ValueError(f"unknown thrift compact type {t}")


def _walk_struct(buf: memoryview, pos: int, on_field) -> int:
    """Iterate a struct's fields; ``on_field(fid, wire_type, pos) -> new_pos``
    must consume the value (return None to have it skipped)."""
    fid = 0
    while True:
        b = buf[pos]
        pos += 1
        if b == 0:
            return pos
        delta, ft = b >> 4, b & 0xF
        if delta:
            fid += delta
        else:
            fid, pos = _zigzag(buf, pos)
        handled = on_field(fid, ft, pos)
        pos = handled if handled is not None else _skip(buf, pos, ft)


def _list_header(buf: memoryview, pos: int) -> tuple[int, int, int]:
    head = buf[pos]
    pos += 1
    size = head >> 4
    et = head & 0xF
    if size == 15:
        size, pos = _uvarint(buf, pos)
    return size, et, pos


def _read_binary(buf: memoryview, pos: int) -> tuple[bytes, int]:
    ln, pos = _uvarint(buf, pos)
    return bytes(buf[pos : pos + ln]), pos + ln


def _parse_key_value_list(buf: memoryview, pos: int) -> tuple[dict, int]:
    size, _et, pos = _list_header(buf, pos)
    out: dict[str, str | None] = {}
    for _ in range(size):
        kv: dict = {}

        def on_field(fid, ft, p, kv=kv):
            if fid in (1, 2) and ft == _BINARY:
                val, p2 = _read_binary(buf, p)
                kv[fid] = val.decode("utf-8", "replace")
                return p2
            return None

        pos = _walk_struct(buf, pos, on_field)
        if 1 in kv:
            out[kv[1]] = kv.get(2)
    return out, pos


def _parse_column_meta(buf: memoryview, pos: int) -> tuple[dict, int]:
    """ColumnMetaData: extract fields 8 (key_value_metadata), 10
    (index_page_offset), 14/15 (bloom offset/length); skip the rest."""
    out: dict = {
        "index_page_offset": None,
        "bloom_offset": None,
        "bloom_length": None,
        "key_value_metadata": None,
    }

    def on_field(fid, ft, p):
        nonlocal out
        if fid == 10 and ft == _I64:
            v, p2 = _zigzag(buf, p)
            out["index_page_offset"] = v
            return p2
        if fid == 14 and ft == _I64:
            v, p2 = _zigzag(buf, p)
            out["bloom_offset"] = v
            return p2
        if fid == 15 and ft == _I32:
            v, p2 = _zigzag(buf, p)
            out["bloom_length"] = v
            return p2
        if fid == 8 and ft == _LIST:
            kv, p2 = _parse_key_value_list(buf, p)
            out["key_value_metadata"] = kv or None
            return p2
        return None

    pos = _walk_struct(buf, pos, on_field)
    return out, pos


def _parse_column_chunk(buf: memoryview, pos: int) -> tuple[dict, int]:
    meta: dict = {}

    def on_field(fid, ft, p):
        nonlocal meta
        if fid == 3 and ft == _STRUCT:  # meta_data: ColumnMetaData
            m, p2 = _parse_column_meta(buf, p)
            meta = m
            return p2
        return None

    pos = _walk_struct(buf, pos, on_field)
    return meta, pos


def _parse_row_group(buf: memoryview, pos: int) -> tuple[list[dict], int]:
    cols: list[dict] = []

    def on_field(fid, ft, p):
        nonlocal pos
        if fid == 1 and ft == _LIST:  # columns: list<ColumnChunk>
            size, _et, p2 = _list_header(buf, p)
            for _ in range(size):
                m, p2 = _parse_column_chunk(buf, p2)
                cols.append(m)
            return p2
        return None

    pos = _walk_struct(buf, pos, on_field)
    return cols, pos


def footer_column_extras(footer: bytes | memoryview) -> list[list[dict]]:
    """Parse a Parquet footer (FileMetaData thrift blob, no PAR1 framing) →
    per row group, per column: the four fields PyArrow hides."""
    buf = memoryview(footer)
    groups: list[list[dict]] = []

    def on_field(fid, ft, p):
        if fid == 4 and ft == _LIST:  # row_groups: list<RowGroup>
            size, _et, p2 = _list_header(buf, p)
            for _ in range(size):
                cols, p2 = _parse_row_group(buf, p2)
                groups.append(cols)
            return p2
        return None

    _walk_struct(buf, 0, on_field)
    return groups


def extract_footer(data: bytes | memoryview) -> memoryview:
    """Locate the footer blob inside a whole Parquet file: trailing
    ``<footer><u32 len>PAR1``."""
    mv = memoryview(data)
    if bytes(mv[-4:]) != b"PAR1":
        raise ValueError("not a parquet file (missing PAR1 trailer)")
    ln = int.from_bytes(mv[-8:-4], "little")
    return mv[-8 - ln : -8]


def file_column_extras(path: str) -> list[list[dict]]:
    """Footer-only I/O: read just the trailer + footer bytes from ``path``."""
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        f.seek(max(0, size - 8))
        tail = f.read(8)
        if tail[-4:] != b"PAR1":
            raise ValueError("not a parquet file (missing PAR1 trailer)")
        ln = int.from_bytes(tail[:4], "little")
        f.seek(size - 8 - ln)
        return footer_column_extras(f.read(ln))
