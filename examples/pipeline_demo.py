#!/usr/bin/env python
"""Training-data pipeline demo: raw documents → quality/language filters →
near-dup clustering (keep one per cluster) → tokenize → size-balanced encode
→ pruned decode — the end-to-end path a pretraining data pipeline runs, all
on this engine's operators.  Run: ``python examples/pipeline_demo.py``
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F

from rugo_spark import get_spark
from rugo_spark.engine import decode_table, encode_table
from rugo_spark.ops.dedup import dedup_clusters
from rugo_spark.ops.textstats import lang_id, quality_features
from rugo_spark.ops.tokenize import tokenize

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".scratch", "pipeline")
    shutil.rmtree(out, ignore_errors=True)

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n0 = docs.count()

    # 1. quality + language screen (built-ins, codegen'd)
    q = quality_features(docs).filter(F.col("quality_score") >= 0.4).select("doc_id")
    lang = lang_id(docs).filter(F.col("lang_pred") != "und").select("doc_id")
    kept = docs.join(q, "doc_id", "left_semi").join(lang, "doc_id", "left_semi")
    n1 = kept.count()

    # 2. near-dup clustering: keep one representative per cluster
    reps = dedup_clusters(kept, n_hashes=16, n_bands=4).filter("is_kept").select("doc_id")
    deduped = kept.join(reps, "doc_id", "left_semi")
    n2 = deduped.count()

    # 3. tokenize → size-balanced encode (one shuffle) → lineage
    tok = tokenize(deduped)
    manifest = encode_table(tok, out, key_col="doc_id", size_col="n_tok", num_partitions=4)
    total_tokens = manifest.agg(F.sum("n_tokens")).first()[0]

    # 4. pruned decode: only long documents, only two columns
    back = decode_table(spark, out, columns=["doc_id", "n_tok"], filters=[("n_tok", ">", 64)])
    n_long = back.count()

    # 5. trainer shape: fixed-length sequences with EOS + doc boundaries
    from rugo_spark.ops.packing import pack_sequences

    packed = pack_sequences(tok, seq_len=512, num_partitions=4, eos_id=50256)
    n_seq = packed.count()

    # 6. contamination screen: does the corpus contain this "benchmark
    #    prompt" (a phrase from its own first doc) verbatim?
    from rugo_spark.ops.contamination import find_needle

    needle = list(tok.orderBy("doc_id").select("tokens").first()[0][:5])
    n_cont = find_needle(tok, needle).count()

    # 7. corpus mixture: deterministic per-language sampling (re-run-stable)
    from rugo_spark.ops.sampling import hash_sample

    n_mix = hash_sample(
        deduped, fractions={"en": 0.5, "fr": 0.25}, stratum_col="lang"
    ).count()

    # 8. lifecycle: compact small blocks, stats from metadata alone
    from rugo_spark.engine import compact_dataset, metadata_agg

    compact_dataset(spark, out, out + "_opt", target_bytes=64 << 20, sort_key="doc_id")
    meta = metadata_agg(spark, out + "_opt", ["doc_id", "n_tok"]).first()

    print(f"documents: {n0} → quality+lang {n1} → deduped {n2}")
    print(f"encoded {total_tokens} tokens into {manifest.count()} partitions")
    print(f"decoded (pruned to n_tok>64, 2 columns): {n_long} rows")
    print(f"packed into {n_seq} training sequences of 512 tokens")
    print(f"contamination screen: {n_cont} docs contain the probe phrase")
    print(f"mixture sample (en 50% / fr 25%): {n_mix} docs")
    print(f"compacted stats from metadata alone: rows={meta['n_rows']} "
          f"tok_mass={meta['n_tokens']} doc_id∈[{meta['min_doc_id']},{meta['max_doc_id']}]")
    spark.stop()


if __name__ == "__main__":
    main()
