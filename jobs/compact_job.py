#!/usr/bin/env python
"""spark-submit entry point for dataset compaction (OPTIMIZE analog).

  zip -r rugo_spark.zip rugo_spark
  spark-submit --py-files rugo_spark.zip jobs/compact_job.py \\
      --input /data/encoded/tokens --output /data/encoded/tokens_opt \\
      --target-bytes 134217728 --sort-key doc_id --verify

Zero-shuffle: one task per merge group.  Two kernels (``--mode``):

- ``concat`` (the default when no ``--sort-key`` is given): member blocks
  become STRIPES of one container at disk-copy speed — no decode, no
  re-encode, member blooms OR together and min/max stats merge, so every
  pruning surface survives unchanged.
- ``rewrite`` (``--mode rewrite``, or automatic when ``--sort-key`` is
  given): decodes the member blocks, concatenates (optionally re-sorts),
  and re-encodes with fresh codec selection and rebuilt blooms.

``--verify`` cross-checks conserved row and token-mass totals from the two
manifests (metadata only — no data re-read).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="rugo_spark compaction job")
    p.add_argument("--input", required=True, help="encoded dataset directory")
    p.add_argument("--output", required=True, help="compacted dataset directory")
    p.add_argument("--target-bytes", type=int, default=128 << 20)
    p.add_argument("--sort-key", default=None)
    p.add_argument("--mode", default="auto", choices=["auto", "concat", "rewrite"],
                   help="concat: members become stripes at disk-copy speed; rewrite: decode+re-encode")
    p.add_argument("--recluster", action="store_true",
                   help="incremental recluster instead of compaction: merge "
                        "append bands into the sorted base — untouched base "
                        "blocks byte-copy, only overlapped/masked ones "
                        "rewrite (Iceberg incremental rewriteDataFiles "
                        "analog). --sort-key defaults to the recorded plan.")
    p.add_argument("--verify", action="store_true",
                   help="assert conserved totals via metadata_agg (no data read)")
    p.add_argument("--master", default=None, help="override master (local testing)")
    args = p.parse_args(argv)

    import pyspark.sql.functions as F

    from rugo_spark.engine import compact_dataset, metadata_agg
    from rugo_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="rugo_spark_compact")
    try:
        try:
            if args.recluster:
                from rugo_spark.recluster import recluster_dataset

                summary = recluster_dataset(
                    spark, args.input, args.output, sort_key=args.sort_key
                )
            else:
                man = compact_dataset(
                    spark, args.input, args.output,
                    target_bytes=args.target_bytes, sort_key=args.sort_key,
                    mode=args.mode,
                )
        except (FileNotFoundError, ValueError) as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        if not args.recluster:
            stats = man.agg(
                F.count("*").alias("blocks"),
                F.sum("n_rows").alias("rows"),
                F.sum("n_tokens").alias("tokens"),
                F.sum("output_bytes").alias("output_bytes"),
            ).first()
            summary = {k: int(stats[k] or 0) for k in stats.asDict()}
        if args.verify:
            a = metadata_agg(spark, args.input, columns=[]).first()
            b = metadata_agg(spark, args.output, columns=[]).first()
            # a raise, not an assert: python -O strips asserts and would
            # print "verified": true without having compared anything
            if (a["n_rows"], a["n_tokens"]) != (b["n_rows"], b["n_tokens"]):
                raise ValueError(f"compaction changed totals: {a} vs {b}")
            summary["verified"] = True
        print(json.dumps(summary))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
