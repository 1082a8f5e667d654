"""Training-data pipeline operators over document/embedding tables.

Spark-first: everything expressible with built-in ``pyspark.sql.functions``
stays JVM-side (whole-stage codegen); only genuinely numeric-kernel work
(simhash bit accumulation, rolling fingerprints) drops to Arrow-vectorized
UDFs — the same no-per-row-Python rule as the encode engine.
"""
