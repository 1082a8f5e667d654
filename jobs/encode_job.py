#!/usr/bin/env python
"""spark-submit entry point for the encode job.

Cluster usage (the north-rule submission shape):

  zip -r rugo_spark.zip rugo_spark
  spark-submit --py-files rugo_spark.zip jobs/encode_job.py \\
      --input iceberg:catalog.db.token_table \\
      --output /data/encoded/tokens \\
      --key-col doc_id --size-col n_tok \\
      --target-tokens 32000000

Resumable: re-running with the same --output skips completed partitions
(manifest sidecar anti-join).  ``--decode-verify`` round-trips a sample and
asserts token-array equality.  ``--append`` lands the input as NEW blocks in
a reserved partition-id band of an existing dataset (Iceberg-append analog;
crash-resume replays the same band) instead of resuming/overwriting it.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="rugo_spark encode job")
    p.add_argument("--input", help="iceberg:<table> or parquet path "
                                   "(required except under --delete-where)")
    p.add_argument("--output", required=True, help="encoded dataset directory")
    p.add_argument("--key-col", default="doc_id")
    p.add_argument("--size-col", default="n_tok")
    p.add_argument("--num-partitions", type=int, default=None)
    p.add_argument("--target-tokens", type=int, default=None,
                   help="per-partition token budget when --num-partitions is "
                        "unset (default 32000000)")
    p.add_argument("--decode-verify", action="store_true")
    p.add_argument("--append", action="store_true",
                   help="append into an existing dataset (new partition-id band)")
    p.add_argument("--reclaim-append", metavar="FINGERPRINT",
                   help="before anything else, roll back incomplete (crashed) "
                        "append session(s) on --output: 'all', or a fingerprint "
                        "prefix as printed by the single-writer error. The "
                        "band was never reader-visible, so this restores the "
                        "exact pre-append state. To ADOPT a crashed append "
                        "instead, re-run with its original --input.")
    p.add_argument("--consolidate", action="store_true",
                   help="after the encode/append commits, fold loose manifest "
                        "sidecars into a parquet manifest segment (planning at "
                        "10^5-10^6 blocks reads segments, not per-block JSON)")
    p.add_argument("--delete-where", metavar="PRED", action="append",
                   help="row-level DELETE on --output instead of encoding: "
                        "'col OP value' with OP in = < <= > >= ; repeatable "
                        "(predicates AND together). Values parse as "
                        "int/float when possible, else string. Pure metadata "
                        "commit — no block is rewritten; a later compaction "
                        "purges physically.")
    p.add_argument("--update-where", metavar="PRED", action="append",
                   help="UPDATE predicate on --output ('col OP value', "
                        "repeatable, ANDed); pair with --update-set. Matched "
                        "originals are position-deleted and transformed "
                        "replacements appended in ONE atomic commit.")
    p.add_argument("--update-set", metavar="COL=EXPR", action="append",
                   help="assignment for --update-where: column = SQL "
                        "expression (repeatable), e.g. "
                        "\"o_totalprice=o_totalprice*1.1\"")
    p.add_argument("--delete-keys", metavar="PARQUET",
                   help="row-level DELETE by key list on --output: a parquet "
                        "file whose first column holds the keys (GDPR/"
                        "takedown shape); matches on --key-col. Pure "
                        "metadata commit, same masks as --delete-where.")
    p.add_argument("--consolidate-deletes", action="store_true",
                   help="maintenance on --output instead of encoding: fold "
                        "every visible position-delete file into one "
                        "(rewrite-position-deletes analog). Readers then "
                        "load one mask file instead of one per DML commit.")
    p.add_argument("--expire-snapshots", metavar="KEEP_LAST", type=int,
                   help="maintenance on --output instead of encoding: drop "
                        "expired snapshot history, keeping the newest N "
                        "entries, and GC delete files they were the last "
                        "reference to. Combine with --expire-older-than-s.")
    p.add_argument("--expire-older-than-s", metavar="SECONDS", type=float,
                   help="with --expire-snapshots: also keep every entry "
                        "younger than now minus SECONDS")
    p.add_argument("--set-tag", metavar="NAME[@SNAPSHOT_ID]",
                   help="maintenance on --output: name a snapshot (default "
                        "the newest). Tagged snapshots survive "
                        "--expire-snapshots; readers pass the tag anywhere "
                        "a snapshot id goes.")
    p.add_argument("--drop-tag", metavar="NAME",
                   help="maintenance on --output: remove a snapshot tag")
    p.add_argument("--rename-column", metavar="OLD:NEW", action="append",
                   help="maintenance on --output: metadata-only column "
                        "rename (repeatable). Blocks/stats are untouched; "
                        "readers and writers speak the new name.")
    p.add_argument("--drop-column", metavar="NAME", action="append",
                   help="maintenance on --output: metadata-only column drop "
                        "(repeatable). The data stays on disk until a "
                        "compaction rewrite; readers hide it immediately.")
    p.add_argument("--merge-key", metavar="COL",
                   help="MERGE INTO / upsert --input into --output on this "
                        "key: existing rows whose key appears in the input "
                        "are position-deleted and the whole input appended, "
                        "in ONE atomic commit (no block rewritten). "
                        "Excludes --append/--num-partitions/--target-tokens.")
    p.add_argument("--master", default=None, help="override master (local testing)")
    args = p.parse_args(argv)

    def _parse_one(raw: str):
        try:
            return int(raw)
        except ValueError:
            try:
                return float(raw)
            except ValueError:
                return raw.strip("'\"")

    def _parse_preds(preds, flag):
        filters = []
        for pred in preds:
            parts = pred.split(None, 2)
            if len(parts) == 2 and parts[1] in ("isnull", "notnull"):
                filters.append((parts[0], parts[1], None))
                continue
            if len(parts) != 3 or parts[1] not in ("=", "<", "<=", ">", ">=", "in"):
                p.error(f"{flag} {pred!r}: want 'col OP value' (OP in "
                        "= < <= > >= in), 'col in v1,v2,…', or "
                        "'col isnull'/'col notnull'")
            col, op, raw = parts
            if op == "in":
                filters.append((col, op, [_parse_one(x) for x in raw.split(",")]))
            else:
                filters.append((col, op, _parse_one(raw)))
        return filters

    if args.update_where or args.update_set:
        if not (args.update_where and args.update_set):
            p.error("--update-where and --update-set go together")
        if args.input:
            p.error("--update-where operates on --output alone; drop --input")
        assignments = {}
        for a in args.update_set:
            col, eq, expr = a.partition("=")
            if not eq or not col.strip() or not expr.strip():
                p.error(f"--update-set {a!r}: want 'col=expression'")
            assignments[col.strip()] = expr.strip()
        from rugo_spark.engine import update_where
        from rugo_spark.session import get_spark

        spark = get_spark(master=args.master, app_name="rugo_spark_update")
        try:
            print(json.dumps(update_where(
                spark, args.output,
                _parse_preds(args.update_where, "--update-where"),
                assignments,
            )))
        finally:
            spark.stop()
        return 0
    if args.delete_where:
        if args.input:
            p.error("--delete-where operates on --output alone; drop --input")
        from rugo_spark.engine import delete_where
        from rugo_spark.session import get_spark

        filters = _parse_preds(args.delete_where, "--delete-where")
        spark = get_spark(master=args.master, app_name="rugo_spark_delete")
        try:
            print(json.dumps(delete_where(spark, args.output, filters)))
        finally:
            spark.stop()
        return 0
    maint = (args.consolidate_deletes or args.expire_snapshots is not None
             or args.set_tag or args.drop_tag or args.rename_column
             or args.drop_column)
    if maint:
        if args.input:
            p.error("maintenance flags operate on --output alone; drop --input")
        out: dict = {}
        for spec in args.rename_column or []:
            old, sep, new = spec.partition(":")
            if not sep or not old or not new:
                p.error(f"--rename-column {spec!r}: want 'old:new'")
            from rugo_spark import evolution as evo

            evo.rename_column(args.output, old, new)
            out.setdefault("renamed", []).append([old, new])
        for name in args.drop_column or []:
            from rugo_spark import evolution as evo

            evo.drop_column(args.output, name)
            out.setdefault("dropped", []).append(name)
        if args.set_tag:
            from rugo_spark import manifest as mf

            name, at, sid = args.set_tag.partition("@")
            mf.set_tag(args.output, name, int(sid) if at else None)
            out["tags"] = mf.tags(args.output)
        if args.drop_tag:
            from rugo_spark import manifest as mf

            out["tags"] = mf.drop_tag(args.output, args.drop_tag)
        if args.consolidate_deletes:
            from rugo_spark.deletes import consolidate_delete_files

            out["consolidate_deletes"] = consolidate_delete_files(args.output)
        if args.expire_snapshots is not None:
            from rugo_spark import manifest as mf

            out["expire_snapshots"] = mf.expire_snapshots(
                args.output, keep_last=args.expire_snapshots,
                older_than_s=args.expire_older_than_s,
            )
        print(json.dumps(out))
        return 0
    if args.expire_older_than_s is not None:
        p.error("--expire-older-than-s requires --expire-snapshots")
    if args.delete_keys:
        if args.input:
            p.error("--delete-keys operates on --output alone; drop --input")
        from rugo_spark.engine import delete_keys
        from rugo_spark.session import get_spark

        spark = get_spark(master=args.master, app_name="rugo_spark_delete_keys")
        try:
            keys = spark.read.parquet(args.delete_keys)
            print(json.dumps(delete_keys(spark, args.output, args.key_col, keys)))
        finally:
            spark.stop()
        return 0
    if not args.input:
        p.error("--input is required (except under --delete-where/--delete-keys)")
    if args.merge_key and (args.append or args.num_partitions is not None
                           or args.target_tokens is not None):
        p.error("--merge-key is its own commit mode: drop --append/"
                "--num-partitions/--target-tokens")
    if args.append and (args.num_partitions is not None or args.target_tokens is not None):
        p.error("--append takes the input's split layout as-is: "
                "--num-partitions/--target-tokens have no effect there — drop "
                "them, or repartition the input before appending")

    from rugo_spark.engine import append_table, decode_table, encode_table
    from rugo_spark.io import read_table
    from rugo_spark.session import get_spark

    if args.reclaim_append:
        from rugo_spark.engine import reclaim_append

        fp = None if args.reclaim_append == "all" else args.reclaim_append
        rec = reclaim_append(args.output, fp)
        print(json.dumps({"reclaimed": rec}), file=sys.stderr)

    spark = get_spark(master=args.master, app_name="rugo_spark_encode")
    try:
        df = read_table(spark, args.input)
        df.schema  # force analysis so a bad path fails here, cleanly
    except Exception as e:  # noqa: BLE001 — CLI boundary
        print(f"error: cannot read --input {args.input}: {e}", file=sys.stderr)
        spark.stop()
        return 2
    if args.merge_key:
        from rugo_spark.engine import merge_table

        res = merge_table(df, args.output, key_col=args.merge_key)
        if args.consolidate:
            from rugo_spark import manifest as mf

            mf.consolidate_manifest(args.output)
        if args.decode_verify:
            dec = decode_table(spark, args.output)
            res["decode_verified_rows"] = dec.count()
        print(json.dumps(res))
        spark.stop()
        return 0
    if args.append:
        man = append_table(
            df,
            args.output,
            sort_key=args.key_col,
            size_col=args.size_col if args.size_col in df.columns else None,
            consolidate=args.consolidate,
        )
    else:
        man = encode_table(
            df,
            args.output,
            key_col=args.key_col,
            size_col=args.size_col if args.size_col in df.columns else None,
            num_partitions=args.num_partitions,
            target_tokens=args.target_tokens or 32_000_000,
        )
        if args.consolidate:
            from rugo_spark import manifest as mf

            mf.consolidate_manifest(args.output)
    import pyspark.sql.functions as F

    stats = man.agg(
        F.count("*").alias("partitions"),
        F.sum("n_rows").alias("rows"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("input_bytes").alias("input_bytes"),
        F.sum("output_bytes").alias("output_bytes"),
    ).first()
    summary = {k: int(stats[k] or 0) for k in stats.asDict()}
    if args.decode_verify:
        dec = decode_table(spark, args.output)
        n = dec.count()
        if args.append:
            # the summary counts only this append's band; verify against the
            # WHOLE dataset's accounting — metadata_agg, not raw manifest
            # sums, so position-delete masks subtract (appending to a
            # dataset with live deletes would otherwise always trip this)
            from rugo_spark.engine import metadata_agg

            want = int(metadata_agg(spark, args.output).first()["n_rows"])
        else:
            want = summary["rows"]
        assert n == want, f"decode rows {n} != manifest {want}"
        summary["decode_verified_rows"] = n
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
