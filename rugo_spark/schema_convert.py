"""Metadata-dict → Spark schema converter (rugo→orso converter parity).

Functional analog of ``rugo_to_orso_schema`` / ``extract_schema_only``
(reference ``rugo/converters/orso.py:86-185``): build a relation schema from
the *first* row group of a rugo-shaped metadata dict (first-RG assumption,
``orso.py:111-112``), collapsing dotted struct leaves into one JSON string
column per top-level struct (``orso.py:127-134``), deriving nullability from
``null_count > 0`` (``orso.py:143``) and carrying ``row_count_estimate``.
The type mapping is logical-first with physical fallback, mirroring
``_map_parquet_type_to_orso`` (``orso.py:14-83``).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T


def _map_type(physical: str, logical: str) -> T.DataType:
    lt = (logical or "").lower()
    if lt.startswith("decimal"):
        m = re.match(r"decimal\((\d+),(\d+)\)", lt)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        return T.DecimalType(38, 18)
    if lt in ("varchar", "utf8", "enum"):
        return T.StringType()
    if lt in ("json", "bson"):
        return T.StringType()
    if lt.startswith("date"):
        return T.DateType()
    if lt.startswith("timestamp"):
        return T.TimestampType()
    if lt.startswith("time["):
        return T.LongType()
    if lt == "boolean":
        return T.BooleanType()
    if lt.startswith("array<"):
        inner = logical[6:-1]
        return T.ArrayType(_map_type("", inner))
    if lt in ("int8",):
        return T.ByteType()
    if lt in ("int16", "uint8"):
        return T.ShortType()
    if lt in ("int32", "uint16"):
        return T.IntegerType()
    if lt in ("int64", "uint32", "uint64"):
        return T.LongType()
    if lt in ("float16", "float32"):
        return T.FloatType()
    if lt == "float64":
        return T.DoubleType()
    if lt == "binary" or lt.startswith("fixed_len_byte_array"):
        return T.BinaryType()
    # physical fallback (orso.py:63-83)
    p = (physical or "").lower()
    if p in ("int32",):
        return T.IntegerType()
    if p in ("int64", "int96"):
        return T.LongType()
    if p == "float32":
        return T.FloatType()
    if p == "float64":
        return T.DoubleType()
    if p == "boolean":
        return T.BooleanType()
    if p in ("byte_array", "fixed_len_byte_array"):
        return T.StringType()
    return T.StringType()


def metadata_to_spark_schema(metadata: dict) -> T.StructType:
    """rugo-shaped metadata dict → Spark ``StructType`` (first row group)."""
    if not isinstance(metadata, dict) or "row_groups" not in metadata:
        raise ValueError("metadata must be a dict with a 'row_groups' key")
    if not metadata["row_groups"]:
        raise ValueError("metadata has no row groups")
    fields: list[T.StructField] = []
    seen_structs: set[str] = set()
    for col in metadata["row_groups"][0]["columns"]:
        name = col["name"]
        if "." in name:  # struct leaf → one JSON column per top-level struct
            top = name.split(".")[0]
            if top in seen_structs:
                continue
            seen_structs.add(top)
            fields.append(T.StructField(top, T.StringType(), True, {"collapsed": "json"}))
            continue
        # null_count None means "no statistics recorded", NOT "no nulls" —
        # unknown nullability must stay nullable (conservative)
        nc = col.get("null_count")
        nullable = nc is None or nc > 0
        fields.append(T.StructField(name, _map_type(col.get("type"), col.get("logical_type")), nullable))
    return T.StructType(fields)


def extract_schema_only(metadata: dict, table_name: str = "table") -> dict:
    """Flat ``{name: type_str}`` + row count (``orso.py:162-185`` parity)."""
    schema = metadata_to_spark_schema(metadata)
    return {
        "table": table_name,
        "num_rows": metadata.get("num_rows"),
        "columns": {f.name: f.dataType.simpleString() for f in schema.fields},
    }
