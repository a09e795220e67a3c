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

Two ingest modes:
- batch (default): the whole corpus at once; near-dup resolution is
  MinHash-LSH pairs -> connected components, keep the global min-id
  representative per cluster.
- --streaming: documents arrive as id-ascending micro-batches through
  the INCREMENTAL LSH dedup operator (exactly-once band index + dup
  log, operators/incremental_dedup.py). The policy is necessarily
  first-writer-wins — a doc is kept iff no earlier-INGESTED doc
  shares an LSH band bucket — the only policy a streaming ingest can
  apply without re-clustering everything seen so far. (It can differ
  from CC resolution on chain-shaped clusters: CC keeps one doc per
  component; first-writer-wins keeps every doc with no earlier
  neighbor.) Downstream stages are identical.

Usage: python tools/corpus_pipeline.py [sf_dir] [out_dir] [--streaming]
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


def _quality_keep(spark, sf_dir: str):
    """Stage 1: composite quality score + repetition signals."""
    from dstream_spark.queries import q_docs_quality
    from dstream_spark.queries_llm import q_docs_repetition

    quality = q_docs_quality(spark, sf_dir).select("doc_id", "quality")
    repetition = q_docs_repetition(spark, sf_dir).select("doc_id", "uniq_ratio")
    return (
        quality.join(repetition, "doc_id")
        .filter((F.col("quality") >= QUALITY_MIN) & (F.col("uniq_ratio") >= UNIQ_RATIO_MIN))
        .select("doc_id")
    )


def run(spark, sf_dir: str, out_dir: str) -> dict:
    from dstream_spark.fixtures.transcripts import register_tables
    from dstream_spark.queries_llm import q_docs_dup_clusters

    register_tables(spark, sf_dir, ("documents",))
    n_docs = spark.table("documents").count()

    # 1. quality gate
    kept_q = _quality_keep(spark, sf_dir)
    n_quality = kept_q.count()

    # 2. near-dup resolution: drop every cluster member except the
    # min-id representative (docs not in any pair are implicitly kept)
    clusters = q_docs_dup_clusters(spark, sf_dir)
    drop = clusters.filter(~F.col("keep")).select("doc_id")
    kept_qd = kept_q.join(drop, "doc_id", "left_anti")
    n_dedup = kept_qd.count()

    tail = _decon_split_pack(spark, sf_dir, out_dir, kept_qd)
    return {
        "sf_dir": sf_dir,
        "mode": "batch",
        "docs_in": n_docs,
        "kept_quality": n_quality,
        "kept_after_dedup": n_dedup,
        **tail,
    }


def run_streaming(spark, sf_dir: str, out_dir: str, n_batches: int = 4) -> dict:
    """Streaming-ingest form: the corpus arrives as ``n_batches``
    id-ascending micro-batches fed through IncrementalLshDedup (the
    inc_dedup_log slicing — only the two scalar id bounds touch the
    driver), then the SURVIVORS (unique_docs: ingested minus dup-log)
    flow through the identical quality/decon/split/pack tail. Both
    dedup tables are exactly-once (commit markers), so a crash-replay
    of any ingest epoch cannot change the keep set."""
    from dstream_spark.fixtures.transcripts import register_tables
    from dstream_spark.operators.incremental_dedup import IncrementalLshDedup, slice_by_id

    register_tables(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select("doc_id", "text")
    n_docs = docs.count()
    sliced = slice_by_id(docs, n_batches).persist()
    dd = IncrementalLshDedup(
        os.path.join(out_dir, "dedup_idx"), os.path.join(out_dir, "dedup_dups"),
        n_partitions=8,
    )
    dd.init()
    try:
        for b in range(n_batches):
            dd.process_batch(sliced.filter(F.col("_slice") == b).drop("_slice"), b)
    finally:
        sliced.unpersist()
    n_dups = dd.read_dups(spark).count()

    kept_q = _quality_keep(spark, sf_dir)
    n_quality = kept_q.count()
    kept_qd = kept_q.join(dd.unique_docs(spark), "doc_id", "left_semi")
    n_dedup = kept_qd.count()

    tail = _decon_split_pack(spark, sf_dir, out_dir, kept_qd)
    return {
        "sf_dir": sf_dir,
        "mode": "streaming",
        "ingest_batches": n_batches,
        "docs_in": n_docs,
        "dup_log_docs": n_dups,
        "kept_quality": n_quality,
        "kept_after_dedup": n_dedup,
        **tail,
    }


def _decon_split_pack(spark, sf_dir: str, out_dir: str, kept_qd) -> dict:
    """Stages 3-5 (shared by both ingest modes): decontaminate →
    leakage-safe split → pack the surviving train docs."""
    from dstream_spark.queries_llm import (
        q_docs_decontaminate,
        q_docs_hash_split,
        q_docs_pack_bpe,
    )

    # 3. benchmark decontamination: drop training docs sharing 3-grams
    # with the eval set (broadcast eval side — the only map-side join)
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
        "kept_after_decon": n_decon,
        "train_docs": n_train,
        "packed_docs": int(stats["docs"]),
        "train_tokens": int(stats["tokens"]),
        "sequences": int(n_sequences),
        "manifest": path,
    }


def main() -> None:
    from dstream_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--streaming"]
    streaming = "--streaming" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/dstream_corpus"
    spark = get_spark(app_name="corpus_pipeline", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")
    result = (run_streaming if streaming else run)(spark, sf_dir, out_dir)
    print("PIPELINE_RESULT " + json.dumps(result))


if __name__ == "__main__":
    main()
