"""Behavioral contracts for the corpus-preparation operators
(queries_llm.py) beyond the DuckDB value-hash gate: determinism,
budget invariants, and leakage exclusions — the properties a training
pipeline relies on at any scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from dstream_spark.queries_llm import (
    DECON_EVAL_MAX_ID,
    PACK_BUDGET_TOKENS,
    SPLIT_TRAIN_LT,
    q_docs_decontaminate,
    q_docs_hash_split,
    q_docs_pack_greedy,
    q_docs_repetition,
)


def test_hash_split_deterministic_and_balanced(spark, sf_dir):
    a = q_docs_hash_split(spark, sf_dir)
    b = q_docs_hash_split(spark, sf_dir)
    # identity-keyed hash: two runs produce identical assignments
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    rows = dict(a.groupBy("split").count().collect())
    n = sum(rows.values())
    # md5 is uniform: train fraction tracks the 204/256 boundary
    assert abs(rows.get("train", 0) / n - SPLIT_TRAIN_LT / 256) < 0.08
    bad = a.filter((F.col("hash_bucket") < 0) | (F.col("hash_bucket") > 255)).count()
    assert bad == 0


def test_pack_greedy_offsets_inside_budget(spark, sf_dir):
    p = q_docs_pack_greedy(spark, sf_dir)
    # a document STARTS inside its sequence's budget window by
    # construction (seq_id = floor(prefix/budget))
    outside = p.filter(
        (F.col("tok_offset") < 0) | (F.col("tok_offset") >= PACK_BUDGET_TOKENS)
    ).count()
    assert outside == 0
    # seq_id is nondecreasing in doc_id within a shard (greedy order)
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("doc_id")
    regressions = (
        p.withColumn("prev_seq", F.lag("seq_id").over(w))
        .filter(F.col("prev_seq").isNotNull() & (F.col("seq_id") < F.col("prev_seq")))
        .count()
    )
    assert regressions == 0


def test_decontaminate_never_flags_eval_docs(spark, sf_dir):
    d = q_docs_decontaminate(spark, sf_dir)
    assert d.filter(F.col("doc_id") < DECON_EVAL_MAX_ID).count() == 0
    assert d.filter(F.col("n_eval_docs") > DECON_EVAL_MAX_ID).count() == 0
    assert d.filter(F.col("n_hits") < F.col("n_eval_docs")).count() == 0


def test_repetition_ratios_bounded(spark, sf_dir):
    r = q_docs_repetition(spark, sf_dir)
    bad = r.filter(
        (F.col("uniq_ratio") <= 0)
        | (F.col("uniq_ratio") > 1.0)
        | (F.col("top_tok_ratio") <= 0)
        | (F.col("top_tok_ratio") > 1.0)
        | (F.col("n_uniq") > F.col("n_tokens"))
        | (F.col("top_tok_n") > F.col("n_tokens"))
    ).count()
    assert bad == 0


def test_pack_entries_exact_at_non_default_shard_count(spark, sf_dir):
    """n_shards is a real parameter, not a literal: at a NON-default
    shard count (5) the Spark packers still match the DuckDB twin
    generated from the same value — all-integer rows, exact compare."""
    import duckdb

    from dstream_spark.queries_llm import pack_bpe_sql, pack_greedy_sql, q_docs_pack_bpe

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    for fn, sql in (
        (q_docs_pack_greedy, pack_greedy_sql(5)),
        (q_docs_pack_bpe, pack_bpe_sql(5)),
    ):
        got = sorted(map(tuple, fn(spark, sf_dir, n_shards=5).collect()))
        want = sorted(map(tuple, con.execute(sql).fetchall()))
        assert got == want and len(got) > 0
