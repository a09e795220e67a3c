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


def test_bloom_prune_is_superset_and_bounded(spark, sf_dir):
    """The Bloom prune is correctness-transparent: every
    true-matching training shingle survives (superset — no false
    negatives by construction), the bit table is bounded by BLOOM_M
    however large the eval side, and the prune actually prunes."""
    from dstream_spark.functions import dedup_text
    from dstream_spark.queries_llm import (
        BLOOM_K,
        BLOOM_M,
        _bloom_pos,
        q_docs_bloom_decontaminate,
        q_docs_decontaminate,
    )
    from dstream_spark.fixtures.transcripts import register_tables

    register_tables(spark, sf_dir, ("documents",))
    d = spark.table("documents")
    sh = dedup_text.word_shingles("text", 3)
    ev = (
        d.filter(F.col("doc_id") < DECON_EVAL_MAX_ID)
        .select(F.explode(sh).alias("g"))
        .distinct()
    )
    bits = ev.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("g"), j) for j in range(BLOOM_K)])
        ).alias("bit")
    ).distinct()
    assert bits.count() <= BLOOM_M
    tr = d.filter(F.col("doc_id") >= DECON_EVAL_MAX_ID).select(
        "doc_id", F.explode(sh).alias("g")
    )
    surv = tr
    for j in range(BLOOM_K):
        b = bits.select(F.col("bit").alias(f"b{j}"))
        surv = surv.join(
            F.broadcast(b), _bloom_pos(F.col("g"), j) == F.col(f"b{j}"), "left_semi"
        )
    # using-column joins move the key first; exceptAll is positional
    true_matching = tr.join(ev, "g", "left_semi").select("doc_id", "g")
    # superset: a true match can never be pruned
    assert true_matching.exceptAll(surv.select("doc_id", "g")).count() == 0
    # and the filter is doing real work (not pass-everything)
    assert surv.count() < tr.count()
    # end to end, the pruned pipeline gives the broadcast answer
    a = q_docs_bloom_decontaminate(spark, sf_dir)
    b = q_docs_decontaminate(spark, sf_dir)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bloom_probe_plan_is_mapside_semi(spark, sf_dir):
    """Plan contract for the 100 TB claim: the probe is BLOOM_K
    broadcast LEFT SEMI hash joins (map-side — training shingles drop
    before any key-bearing exchange), the verify is a shuffled hash
    join on survivors only, and nothing degenerates to a sort-merge
    or nested-loop join."""
    import re

    from dstream_spark.queries_llm import BLOOM_K, q_docs_bloom_decontaminate

    plan = (
        q_docs_bloom_decontaminate(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"BroadcastHashJoin.*LeftSemi", plan)) == BLOOM_K
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("ShuffledHashJoin") == 1


def test_fixlog_bit_identical_across_engines_and_accurate(spark):
    """functions/fixlog.py contract: Spark and DuckDB produce the SAME
    fixed-point log2 bit-for-bit (every op exact or correctly
    rounded), and the value is within ~1.2e-5 bits of the true log2
    (2^-19 algorithmic + Σ(1e6 >> k) integer-weight truncation) —
    hypothesis-style sweep over hand-picked + pseudo-random ints."""
    import math

    import duckdb

    from dstream_spark.functions.fixlog import fp_log2_sql, with_fp_log2

    ns = [1, 2, 3, 5, 7, 8, 9, 42, 255, 256, 999983, 2**31 - 1, 2**40 + 12345, 2**52 - 1]
    # deterministic pseudo-random extras (no RNG in tests either)
    ns += [(1103515245 * k + 12345) % (2**41) + 1 for k in range(50)]

    inner = "SELECT unnest([" + ",".join(f"CAST({n} AS BIGINT)" for n in ns) + "]) AS n"
    duck = dict(duckdb.sql("SELECT n, l2 FROM (" + fp_log2_sql(inner, "n", "l2") + ")").fetchall())

    df = spark.createDataFrame([(n,) for n in sorted(set(ns))], "n long")
    sp = {r.n: r.l2 for r in with_fp_log2(df, "n", "l2").collect()}

    for n in set(ns):
        assert duck[n] == sp[n], f"engine divergence at n={n}: {duck[n]} vs {sp[n]}"
        assert abs(duck[n] / 1e6 - math.log2(n)) < 1.2e-5, n


def test_substr_dedup_matches_bruteforce_on_synthetic(spark, tmp_path):
    """The gaps-and-islands max-run recovery equals a brute-force
    longest-shared-window scan on a corpus with a planted duplicated
    passage at different offsets."""
    from dstream_spark.queries_llm import SUBSTR_WIN, q_docs_substr_dedup

    shared = " ".join(f"s{i}" for i in range(SUBSTR_WIN + 5))  # 21-token shared passage
    docs = [
        (0, "a0 a1 a2 " + shared + " a3 a4"),
        (1, "b0 " + shared + " b1 b2 b3 b4 b5"),
        (2, " ".join(f"c{i}" for i in range(40))),  # no overlap
        (3, "short doc"),  # under the window length
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "sf")
    import os

    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": [x[0] for x in docs], "text": [x[1] for x in docs]}),
        d + "/documents.parquet",
    )
    out = {r.doc_id: r for r in q_docs_substr_dedup(spark, d).collect()}
    # the shared passage is 21 tokens -> 21-16+1 = 6 consecutive dup windows
    # -> max span 6 + 16 - 1 = 21 tokens, in both carrying docs
    assert out[0].max_dup_span == SUBSTR_WIN + 5
    assert out[1].max_dup_span == SUBSTR_WIN + 5
    assert out[0].n_dup_windows == 6 and out[1].n_dup_windows == 6
    assert out[2].n_dup_windows == 0 and out[2].max_dup_span == 0
    assert out[3].n_windows == 0 and out[3].max_dup_span == 0


def test_lm_perplexity_buckets_and_partition_invariance(spark, sf_dir):
    """Bucket semantics: 'short' iff no bigram; head docs strictly
    below middle/tail bits-per-token on (floored-mean) average; and
    the whole result is PARTITIONING-INVARIANT — integer NLL sums mean
    no float accumulation order exists to diverge."""
    from dstream_spark.queries_llm import q_docs_lm_perplexity

    out = q_docs_lm_perplexity(spark, sf_dir)
    rows = {r.doc_id: r for r in out.collect()}
    assert all((r.bucket == "short") == (r.n_trans == 0) for r in rows.values())
    assert all(r.bits_per_token is None for r in rows.values() if r.bucket == "short")
    by = {}
    for r in rows.values():
        if r.bucket != "short":
            by.setdefault(r.bucket, []).append(r.bits_per_token)
    if "head" in by and "tail" in by:
        assert max(by["head"]) < min(by["tail"])  # ±10% band separates them

    # partitioning invariance: same values after an adversarial reshuffle
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        again = {r.doc_id: r for r in q_docs_lm_perplexity(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert all(
        rows[k].nll_micro == again[k].nll_micro and rows[k].bucket == again[k].bucket
        for k in rows
    )
