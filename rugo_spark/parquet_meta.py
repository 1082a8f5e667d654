"""Parquet footer metadata reader with the reference's exact dict surface.

Functional parity with rugo's flagship API (``read_metadata`` /
``read_metadata_from_bytes`` / ``read_metadata_from_memoryview``,
reference ``rugo/parquet/metadata_reader.pyx:76-99``), built on PyArrow's
footer parser instead of a hand-written Thrift decoder — the idiomatic
"don't re-parse what the platform parses" choice; rugo itself trusts
PyArrow as its differential oracle (``tests/test_statistics.py:29-66``).

Output shape mirrors ``_read_metadata_common``
(``metadata_reader.pyx:102-174``) exactly: ``{num_rows, row_groups:
[{num_rows, total_byte_size, columns: [{name, type, logical_type, min, max,
null_count, distinct_count, num_values, total_uncompressed_size,
total_compressed_size, data_page_offset, index_page_offset,
dictionary_page_offset, bloom_offset, bloom_length, encodings,
compression_codec, key_value_metadata}]}]}`` with the same enum vocabulary
(``metadata.cpp:15-36`` physical names, ``:89-112`` encodings,
``:114-135`` codecs) and the same −1→None sentinel handling.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

# physical-type names per rugo metadata.cpp:15-36
_PHYSICAL = {
    "BOOLEAN": "boolean",
    "INT32": "int32",
    "INT64": "int64",
    "INT96": "int96",
    "FLOAT": "float32",
    "DOUBLE": "float64",
    "BYTE_ARRAY": "byte_array",
    "FIXED_LEN_BYTE_ARRAY": "fixed_len_byte_array",
}


def _canonical_name(path: str) -> str:
    """Strip `schema.` / `.list.element` / `.list.item` (metadata.cpp:137-149)."""
    if path.startswith("schema."):
        path = path[len("schema."):]
    for suffix in (".list.element", ".list.item"):
        if path.endswith(suffix):
            path = path[: -len(suffix)]
    return path


def _arrow_logical(t: pa.DataType) -> str:
    """Arrow type → rugo logical-type string (metadata.cpp:154-339 naming)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "varchar"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_date32(t):
        return "date32[day]"
    if pa.types.is_date64(t):
        return "date64[ms]"
    if pa.types.is_timestamp(t):
        tz = ",UTC" if t.tz else ""
        return f"timestamp[{t.unit}{tz}]"
    if pa.types.is_time32(t) or pa.types.is_time64(t):
        return f"time[{t.unit}]"
    if pa.types.is_integer(t):
        return str(t)  # int8..int64 / uint8..uint64 — same names as rugo
    if pa.types.is_float16(t):
        return "float16"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{_arrow_logical(t.value_type)}>"
    if pa.types.is_struct(t) or pa.types.is_map(t):
        return "json"  # non-root struct collapse (metadata.cpp:684-689)
    if pa.types.is_fixed_size_binary(t):
        return f"fixed_len_byte_array[{t.byte_width}]"
    return str(t)


def _logical_for(path: str, schema: pa.Schema) -> str:
    name = _canonical_name(path)
    top = name.split(".")[0]
    if top in schema.names:
        t = schema.field(top).type
        if "." in name:
            return "json"  # struct-leaf → deepest json ancestor (metadata.cpp:804-820)
        return _arrow_logical(t)
    return ""


def _opt(v):
    return None if v is None or (isinstance(v, int) and v < 0) else v


def _from_parquet_file(pf: pq.ParquetFile, extras: list[list[dict]] | None = None) -> dict:
    md = pf.metadata
    schema = pf.schema_arrow
    result = {"num_rows": md.num_rows, "row_groups": []}
    _no_extra = {
        "index_page_offset": None,
        "bloom_offset": None,
        "bloom_length": None,
        "key_value_metadata": None,
    }
    for rg_i in range(md.num_row_groups):
        rg = md.row_group(rg_i)
        rg_dict = {
            "num_rows": rg.num_rows,
            "total_byte_size": rg.total_byte_size,
            "columns": [],
        }
        for c_i in range(rg.num_columns):
            col = rg.column(c_i)
            stats = col.statistics if col.is_stats_set else None
            # the three footer fields pyarrow's binding hides come from the
            # thrift-lite scan (rugo parses them: metadata.cpp:536-581)
            try:
                extra = extras[rg_i][c_i] if extras else _no_extra
            except (IndexError, TypeError):
                extra = _no_extra
            # .get: a legal ColumnChunk may omit meta_data entirely (external
            # or encrypted column metadata) → thrift-lite yields {} and the
            # three extra fields degrade to None instead of a KeyError
            kv = extra.get("key_value_metadata")
            rg_dict["columns"].append(
                {
                    "name": _canonical_name(col.path_in_schema),
                    "type": _PHYSICAL.get(col.physical_type, col.physical_type.lower()),
                    "logical_type": _logical_for(col.path_in_schema, schema),
                    "min": stats.min if stats is not None and stats.has_min_max else None,
                    "max": stats.max if stats is not None and stats.has_min_max else None,
                    "null_count": (
                        stats.null_count if stats is not None and stats.has_null_count else None
                    ),
                    "distinct_count": (
                        stats.distinct_count
                        if stats is not None and stats.has_distinct_count
                        else None
                    ),
                    "num_values": _opt(col.num_values),
                    "total_uncompressed_size": _opt(col.total_uncompressed_size),
                    "total_compressed_size": _opt(col.total_compressed_size),
                    "data_page_offset": _opt(col.data_page_offset),
                    "index_page_offset": _opt(extra.get("index_page_offset")),
                    "dictionary_page_offset": (
                        _opt(col.dictionary_page_offset) if col.has_dictionary_page else None
                    ),
                    "bloom_offset": _opt(extra.get("bloom_offset")),
                    "bloom_length": _opt(extra.get("bloom_length")),
                    "encodings": list(col.encodings),
                    "compression_codec": col.compression,
                    "key_value_metadata": kv,
                }
            )
        result["row_groups"].append(rg_dict)
    return result


def _safe_extras(fn, *args):
    try:
        return fn(*args)
    except Exception:
        return None  # malformed/exotic footer: extras degrade to None fields


def read_metadata(path: str) -> dict:
    """rugo ``read_metadata(path)`` parity (``metadata_reader.pyx:76-80``) —
    but footer-only I/O via PyArrow, not a whole-file read (the reference
    reads the entire file into memory first; SURVEY.md §4 flags that)."""
    from rugo_spark.thrift_lite import file_column_extras

    return _from_parquet_file(pq.ParquetFile(path), _safe_extras(file_column_extras, path))


def read_metadata_from_bytes(data: bytes) -> dict:
    """rugo ``read_metadata_from_bytes`` parity (``metadata_reader.pyx:83-87``)."""
    from rugo_spark.thrift_lite import extract_footer, footer_column_extras

    extras = _safe_extras(lambda d: footer_column_extras(extract_footer(d)), data)
    return _from_parquet_file(pq.ParquetFile(pa.BufferReader(data)), extras)


def read_metadata_from_memoryview(mv) -> dict:
    """rugo ``read_metadata_from_memoryview`` parity, zero-copy
    (``metadata_reader.pyx:90-99``): pa.py_buffer wraps without copying."""
    from rugo_spark.thrift_lite import extract_footer, footer_column_extras

    extras = _safe_extras(lambda d: footer_column_extras(extract_footer(d)), mv)
    return _from_parquet_file(pq.ParquetFile(pa.BufferReader(pa.py_buffer(mv))), extras)
