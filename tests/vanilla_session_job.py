"""Driver-environment mirror: run the engine's main surfaces on a BARE
PySpark session (``SparkSession.builder.master("local[2]").getOrCreate()``,
zero repo conf).

Round 3 shipped a bug that every in-repo test missed because the whole suite
builds its session through ``session.py`` (which sets
``spark.sql.files.maxPartitionBytes``): on a vanilla PySpark 4.1 session,
``conf.get(key, "")`` throws ``INVALID_CONF_VALUE`` for typed keys with no
explicitly-set value, which redded 6 of 50 driver queries.  The reference
repo guards the same class of environment drift by running its suite on five
stock Pythons (``/root/reference/.github/workflows/test.yml``); this script
is the analog for session conf.

Run in a SUBPROCESS (own JVM) so the session really is vanilla — inside
pytest's process ``getOrCreate`` would hand back the tuned shared session.

Usage: python tests/vanilla_session_job.py <workdir>   # prints VANILLA-OK
"""

from __future__ import annotations

import os
import sys


def main(workdir: str) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.master("local[2]").appName("vanilla").getOrCreate()
    try:
        from rugo_spark.engine import (
            compact_dataset,
            decode_table,
            encode_table,
            encode_table_maponly,
            encode_table_sorted,
            metadata_agg,
        )

        src = os.path.join(workdir, "src.parquet")
        # input_hint shape: (doc_id, tokens array<int32>, n_tok, source)
        base = (
            spark.range(2000)
            .select(
                F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
                F.sequence(
                    F.lit(0), ((F.col("id") % 97) + 1).cast("int")
                ).cast("array<int>").alias("tokens"),
                (((F.col("id") % 97) + 2)).cast("int").alias("n_tok"),
                F.when(F.col("id") % 3 == 0, "web").otherwise("book").alias("source"),
            )
        )
        base.write.mode("overwrite").parquet(src)
        df = spark.read.parquet(src)
        n_src = df.count()
        mass_src = df.agg(F.sum("n_tok")).collect()[0][0]

        def check(out_dir: str, label: str) -> None:
            dec = decode_table(spark, out_dir)
            n = dec.count()
            mass = dec.agg(F.sum("n_tok")).collect()[0][0]
            assert n == n_src, f"{label}: rows {n} != {n_src}"
            assert mass == mass_src, f"{label}: mass {mass} != {mass_src}"

        # 1. size-balanced shuffled encode — the path that was red in r3
        out1 = os.path.join(workdir, "enc")
        encode_table(df, out1, key_col="doc_id", size_col="n_tok", num_partitions=4)
        check(out1, "encode_table")

        # 2. map-only encode (unconditionally fingerprints the input)
        out2 = os.path.join(workdir, "enc_maponly")
        encode_table_maponly(df, out2, size_col="n_tok")
        check(out2, "encode_table_maponly")

        # 3. sorted/range encode
        out3 = os.path.join(workdir, "enc_sorted")
        encode_table_sorted(df, out3, key_col="doc_id", num_partitions=4, size_col="n_tok")
        check(out3, "encode_table_sorted")

        # 4. compaction (concat kernel)
        out4 = os.path.join(workdir, "compacted")
        compact_dataset(spark, out2, out4)
        check(out4, "compact_dataset")

        # 4b. append into the map-only dataset (fresh band, whole-set decode)
        from rugo_spark.engine import append_table

        extra = df.withColumn("doc_id", F.concat(F.lit("x-"), F.col("doc_id"))).limit(50)
        n_extra = extra.count()
        append_table(extra, out2, size_col="n_tok")
        assert decode_table(spark, out2).count() == n_src + n_extra, "append_table"

        # 5. metadata-only aggregate
        row = metadata_agg(spark, out1, columns=["n_tok"]).collect()[0]
        assert row["n_rows"] == n_src, f"metadata_agg n_rows {row['n_rows']}"

        # 6. filtered decode (manifest pruning path)
        one = decode_table(
            spark, out1, columns=["doc_id"], filters=[("doc_id", "=", "doc-7")]
        ).count()
        assert one == 1, f"point lookup returned {one} rows"

        # 7. DML + retention + evolution + CDC stream (round-5 surfaces) on
        # the bare session — the same environment-drift class as r3
        from rugo_spark import deletes as dl
        from rugo_spark import evolution as evo
        from rugo_spark import manifest as mf
        from rugo_spark.engine import delete_where, read_changes

        delete_where(spark, out1, [("doc_id", "in", ["doc-11", "doc-13"])])
        delete_where(spark, out1, [("doc_id", "=", "doc-17")])
        assert decode_table(spark, out1).count() == n_src - 3, "delete_where"
        c = dl.consolidate_delete_files(out1)
        assert c["files_after"] == 1, f"consolidate {c}"
        mf.set_tag(out1, "v1")
        mf.expire_snapshots(out1, keep_last=1)
        assert decode_table(spark, out1, snapshot_id="v1").count() == n_src - 3
        evo.rename_column(out1, "n_tok", "tok_n")
        agg = metadata_agg(spark, out1, columns=["tok_n"]).collect()[0]
        assert agg["n_rows"] == n_src - 3, "metadata_agg after rename"
        ch = read_changes(spark, out2, 1)
        assert ch.count() == n_extra, f"cdc {ch.count()} != {n_extra}"
        from rugo_spark.datasource import register

        register(spark)
        sink = os.path.join(workdir, "cdc_sink")
        ck = os.path.join(workdir, "cdc_ckpt")
        q = (spark.readStream.format("rugo_cdc")
             .option("startingSnapshot", "earliest").load(out2)
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = spark.read.parquet(sink).count()
        assert got == n_extra, f"cdc stream {got} != {n_extra}"

        print("VANILLA-OK")
    finally:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1])
