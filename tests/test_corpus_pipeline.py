"""End-to-end corpus-preparation pipeline (tools/corpus_pipeline.py):
the composition of quality gate -> dup-cluster resolution -> split ->
BPE packing must produce a coherent, duplicate-free train manifest."""

from __future__ import annotations


def test_corpus_pipeline_end_to_end(spark, tmp_path):
    import tools.corpus_pipeline as cp

    res = cp.run(spark, "/root/testdata/sf0.001", str(tmp_path))
    # funnel is monotone: each stage can only drop documents
    assert (
        res["docs_in"]
        >= res["kept_quality"]
        >= res["kept_after_dedup"]
        >= res["kept_after_decon"]
        >= res["train_docs"]
    )
    assert res["train_docs"] == res["packed_docs"] > 0
    assert res["train_tokens"] > 0 and res["sequences"] > 0

    m = spark.read.parquet(res["manifest"])
    # one manifest row per surviving train doc, no duplicates
    assert m.count() == m.select("doc_id").distinct().count() == res["packed_docs"]
    # offsets live inside the budget; sequence ids are dense per shard
    from pyspark.sql import functions as F

    from dstream_spark.queries_llm import PACK_BUDGET_TOKENS

    assert m.filter(
        (F.col("tok_offset") < 0) | (F.col("tok_offset") >= PACK_BUDGET_TOKENS)
    ).count() == 0
    # dedup really removed every non-representative cluster member
    from dstream_spark.queries_llm import q_docs_dup_clusters

    dropped = q_docs_dup_clusters(spark, "/root/testdata/sf0.001").filter("NOT keep")
    assert m.join(dropped, "doc_id").count() == 0


def test_corpus_pipeline_streaming_ingest(spark, tmp_path):
    """--streaming mode: the incremental LSH dedup replaces cluster
    resolution; the funnel stays monotone, the manifest excludes every
    dup-log doc, and re-running the ingest epochs (crash replay at the
    same ids) cannot change the keep set (exactly-once tables)."""
    import tools.corpus_pipeline as cp
    from dstream_spark.operators.incremental_dedup import IncrementalLshDedup

    res = cp.run_streaming(spark, "/root/testdata/sf0.001", str(tmp_path))
    assert (
        res["docs_in"]
        >= res["kept_quality"]
        >= res["kept_after_dedup"]
        >= res["kept_after_decon"]
        >= res["train_docs"]
    )
    assert res["train_docs"] == res["packed_docs"] > 0
    assert res["dup_log_docs"] > 0  # the corpus has near-dups; they were logged

    m = spark.read.parquet(res["manifest"])
    assert m.count() == m.select("doc_id").distinct().count() == res["packed_docs"]
    # every dup-log doc is excluded from the manifest
    import os

    dd = IncrementalLshDedup(
        os.path.join(str(tmp_path), "dedup_idx"), os.path.join(str(tmp_path), "dedup_dups")
    )
    dups = dd.read_dups(spark).select("doc_id")
    assert m.join(dups, "doc_id").count() == 0
    # crash-replay of every ingest epoch at its original id: no change
    before = sorted(map(tuple, dups.collect()))
    res2 = cp.run_streaming(spark, "/root/testdata/sf0.001", str(tmp_path))
    assert sorted(map(tuple, dd.read_dups(spark).select("doc_id").collect())) == before
    assert res2["kept_after_dedup"] == res["kept_after_dedup"]
