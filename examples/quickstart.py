#!/usr/bin/env python
"""Quickstart: generate a token table, encode, inspect lineage, decode.

The structural sibling of the reference's ``examples/`` scripts
(``/root/reference/examples/example.py`` reads metadata and prints it);
here the engine round-trips data and prints the manifest.
Run: ``python examples/quickstart.py``
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rugo_spark import get_spark
from rugo_spark.engine import decode_table, encode_table
from rugo_spark.manifest import read_manifest
from rugo_spark.tokengen import spark_token_df


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".scratch", "quickstart")
    shutil.rmtree(out, ignore_errors=True)

    df = spark_token_df(spark, n_docs=5000, n_partitions=4)
    manifest = encode_table(df, out, key_col="doc_id", size_col="n_tok", num_partitions=6)
    print("--- lineage (one row per partition) ---")
    for row in manifest.orderBy("partition_id").collect():
        codecs = {k: v.get("codec") for k, v in json.loads(row["codecs"]).items()}
        print(
            f"partition {row['partition_id']}: {row['n_rows']} rows, "
            f"{row['n_tokens']} tokens, {row['input_bytes']}→{row['output_bytes']} bytes, "
            f"codecs={codecs}"
        )

    print("--- rugo-parity manifest dict (truncated) ---")
    meta = read_manifest(out)
    print(json.dumps(meta["row_groups"][0]["columns"][1], indent=2, default=str)[:600])

    back = decode_table(spark, out, columns=["doc_id", "n_tok"], filters=[("n_tok", ">", 1000)])
    print(f"--- decoded (pruned to n_tok>1000): {back.count()} rows ---")
    spark.stop()


if __name__ == "__main__":
    main()
