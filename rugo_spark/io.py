"""Pluggable table IO: Iceberg when available, parquet directory fallback.

The north rule targets Iceberg tables of pre-tokenized sequences; this
sandbox has no Iceberg runtime/catalog, so the reader/writer resolve the
format at call time and degrade to plain parquet directories — the engine
above is format-agnostic (it sees a DataFrame).  Pattern mirrors the
reference's optional-dependency gating (rugo ``rugo/__init__.py:19-25``).

URIs:
  ``iceberg:<catalog.db.table>`` — requires an Iceberg-enabled Spark session
  ``<path>``                    — parquet directory / file
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime class actually loads.

    NOT ``spark._jvm.org.apache.iceberg.Table`` — py4j resolves a missing
    class to a ``JavaPackage`` object without raising, so that probe was
    always-True and the actionable error below was unreachable (review r4).
    ``Class.forName`` raises through py4j when the class is absent."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — probe only
            "org.apache.iceberg.catalog.Catalog"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, uri: str) -> DataFrame:
    if uri.startswith("iceberg:"):
        name = uri[len("iceberg:"):]
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; use a parquet path or "
                "add the iceberg-spark-runtime package"
            )
        return spark.read.format("iceberg").load(name)
    return spark.read.parquet(uri)


def write_table(df: DataFrame, uri: str, mode: str = "overwrite") -> None:
    if uri.startswith("iceberg:"):
        name = uri[len("iceberg:"):]
        if not iceberg_available(df.sparkSession):
            raise RuntimeError("Iceberg runtime not on the classpath")
        if mode == "overwrite":
            df.writeTo(name).createOrReplace()
        elif mode == "append":
            df.writeTo(name).append()
        elif mode in ("error", "errorifexists"):
            # mirror the parquet branch's semantics instead of appending
            if df.sparkSession.catalog.tableExists(name):
                raise ValueError(f"table {name} already exists (mode={mode})")
            df.writeTo(name).create()
        elif mode == "ignore":
            if not df.sparkSession.catalog.tableExists(name):
                df.writeTo(name).create()
        else:
            raise ValueError(f"unsupported write mode {mode!r}")
        return
    df.write.mode(mode).parquet(uri, compression="zstd")
