"""Converter parity tests (reference ``tests/test_orso_converter.py`` patterns:
type mapping, end-to-end on planets.parquet, malformed-metadata errors,
struct collapse on the nested CVE fixture)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from rugo_spark.parquet_meta import read_metadata
from rugo_spark.schema_convert import extract_schema_only, metadata_to_spark_schema

FIXTURES = "/root/reference/tests/data"


def test_type_mapping_end_to_end_planets():
    path = os.path.join(FIXTURES, "planets.parquet")
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    meta = read_metadata(path)
    schema = metadata_to_spark_schema(meta)
    assert isinstance(schema, T.StructType)
    assert len(schema.fields) == len(meta["row_groups"][0]["columns"])
    info = extract_schema_only(meta, "planets")
    assert info["num_rows"] == meta["num_rows"]
    assert set(info["columns"]) == {f.name for f in schema.fields}


def test_struct_collapse_on_nested_fixture():
    path = os.path.join(FIXTURES, "185d5a679a475304.parquet")
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    meta = read_metadata(path)
    schema = metadata_to_spark_schema(meta)
    # struct leaves collapse: one column per top-level name (orso.py:127-134)
    names = [f.name for f in schema.fields]
    assert len(names) == len(set(names))
    dotted = [c["name"] for c in meta["row_groups"][0]["columns"] if "." in c["name"]]
    for d in dotted:
        top = d.split(".")[0]
        assert top in names
        f = schema[top]
        assert f.dataType == T.StringType() and f.metadata.get("collapsed") == "json"


def test_malformed_metadata_errors():
    with pytest.raises(ValueError):
        metadata_to_spark_schema({"num_rows": 1})
    with pytest.raises(ValueError):
        metadata_to_spark_schema({"row_groups": []})
    with pytest.raises(ValueError):
        metadata_to_spark_schema("not a dict")  # type: ignore[arg-type]


def test_own_table_roundtrip_schema():
    meta = read_metadata("/root/testdata/sf0.001/documents.parquet")
    schema = metadata_to_spark_schema(meta)
    by_name = {f.name: f.dataType for f in schema.fields}
    assert by_name["doc_id"] == T.LongType()
    assert by_name["text"] == T.StringType()
    assert by_name["n_chars"] == T.LongType()
