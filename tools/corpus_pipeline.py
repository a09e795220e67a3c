"""End-to-end training-corpus preparation pipeline — the composition
a 100 TB corpus run executes, built entirely from the engine's
oracle-checked operators:

    documents
      → quality gate        (docs_quality + docs_repetition signals)
      → near-dup resolution (MinHash-LSH pairs → connected components,
                             keep one representative per cluster)
      → decontamination     (docs_decontaminate: eval-set 3-gram
                             overlap, broadcast eval side)
      → leakage-safe split  (docs_hash_split, identity-keyed md5)
      → sequence packing    (docs_pack_bpe: sharded greedy packing of
                             merges-table BPE token budgets)
      → packed train manifest (parquet) + one JSON summary line

Every stage is the same code path the registry entries verify against
DuckDB; this tool only composes them, so the pipeline's correctness
budget is already paid. Scale shape: the only exchanges are the
paragraph/pair shuffles inside dedup and the per-shard packing window
— no stage collects data to the driver (the cluster-resolution loop
reads one scalar per round).

Usage: python tools/corpus_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

QUALITY_MIN = 0.30       # docs_quality composite floor
UNIQ_RATIO_MIN = 0.30    # docs_repetition: drop degenerate repetition
DECON_HITS_MIN = 20      # eval-overlap hits before a train doc is dropped


def run(spark, sf_dir: str, out_dir: str) -> dict:
    from dstream_spark.fixtures.transcripts import register_tables
    from dstream_spark.queries import q_docs_quality
    from dstream_spark.queries_llm import (
        q_docs_dup_clusters,
        q_docs_hash_split,
        q_docs_pack_bpe,
        q_docs_repetition,
    )

    register_tables(spark, sf_dir, ("documents",))
    n_docs = spark.table("documents").count()

    # 1. quality gate: composite score + repetition signals
    quality = q_docs_quality(spark, sf_dir).select("doc_id", "quality")
    repetition = q_docs_repetition(spark, sf_dir).select("doc_id", "uniq_ratio")
    kept_q = (
        quality.join(repetition, "doc_id")
        .filter((F.col("quality") >= QUALITY_MIN) & (F.col("uniq_ratio") >= UNIQ_RATIO_MIN))
        .select("doc_id")
    )
    n_quality = kept_q.count()

    # 2. near-dup resolution: drop every cluster member except the
    # min-id representative (docs not in any pair are implicitly kept)
    clusters = q_docs_dup_clusters(spark, sf_dir)
    drop = clusters.filter(~F.col("keep")).select("doc_id")
    kept_qd = kept_q.join(drop, "doc_id", "left_anti")
    n_dedup = kept_qd.count()

    # 3. benchmark decontamination: drop training docs sharing 3-grams
    # with the eval set (broadcast eval side — the only map-side join)
    from dstream_spark.queries_llm import q_docs_decontaminate

    contaminated = (
        q_docs_decontaminate(spark, sf_dir)
        .filter(F.col("n_hits") >= DECON_HITS_MIN)
        .select("doc_id")
    )
    kept_qdc = kept_qd.join(contaminated, "doc_id", "left_anti")
    n_decon = kept_qdc.count()

    # 4. leakage-safe split: identity-keyed, train partition only
    split = q_docs_hash_split(spark, sf_dir)
    train = kept_qdc.join(split.filter(F.col("split") == "train"), "doc_id").select("doc_id")
    n_train = train.count()

    # 5. pack surviving train docs into token-budget sequences. The
    # packer runs on the FILTERED population (budget offsets must not
    # count dropped documents), so the window input is the semi-join.
    packed = (
        q_docs_pack_bpe(spark, sf_dir)
        .select("doc_id", "shard", "n_tokens")
        .join(train, "doc_id")
    )
    # re-derive offsets over the surviving docs only: same sharded
    # prefix-sum, now over the filtered set
    from pyspark.sql import Window

    from dstream_spark.queries_llm import PACK_BUDGET_TOKENS

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    manifest = packed.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(prev / PACK_BUDGET_TOKENS).cast("int").alias("seq_id"),
        (prev - F.floor(prev / PACK_BUDGET_TOKENS) * PACK_BUDGET_TOKENS)
        .cast("long")
        .alias("tok_offset"),
    )
    path = os.path.join(out_dir, "train_manifest.parquet")
    manifest.write.mode("overwrite").parquet(path)

    landed = spark.read.parquet(path)
    stats = landed.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").cast("long").alias("tokens"),
    ).first()
    n_sequences = (
        landed.groupBy("shard").agg((F.max("seq_id") + 1).alias("s")).agg(
            F.sum("s").cast("long")
        ).first()[0]
    )
    return {
        "sf_dir": sf_dir,
        "docs_in": n_docs,
        "kept_quality": n_quality,
        "kept_after_dedup": n_dedup,
        "kept_after_decon": n_decon,
        "train_docs": n_train,
        "packed_docs": int(stats["docs"]),
        "train_tokens": int(stats["tokens"]),
        "sequences": int(n_sequences),
        "manifest": path,
    }


def main() -> None:
    from dstream_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dstream_corpus"
    spark = get_spark(app_name="corpus_pipeline", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")
    print("PIPELINE_RESULT " + json.dumps(run(spark, sf_dir, out_dir)))


if __name__ == "__main__":
    main()
