"""Drop-in module alias matching the reference's ``rugo.parquet`` surface
(``read_metadata``, ``read_metadata_from_bytes``,
``read_metadata_from_memoryview`` — reference ``rugo/__init__.py:16-17``,
``metadata_reader.pyx:76-99``)."""

from rugo_spark.parquet_meta import (  # noqa: F401
    read_metadata,
    read_metadata_from_bytes,
    read_metadata_from_memoryview,
)

__all__ = ["read_metadata", "read_metadata_from_bytes", "read_metadata_from_memoryview"]
