"""Training-data pipeline operators beyond the dedup/similarity
families: deterministic corpus splitting, repetition-quality scoring,
context-window packing, and benchmark decontamination.

These are the corpus-preparation steps a 100 TB LLM data pipeline runs
between dedup and training, expressed Spark-first:

- hash_split: reproducible train/val/test assignment from md5(doc_id)
  — a pure projection (no .sample(), no RNG, no shuffle), so the split
  is stable under reruns, replication, and repartitioning. The same
  hex-nibble arithmetic runs on DuckDB, so the oracle is bit-exact.
- repetition: Gopher-style repetition signals (top-token ratio,
  unique-token ratio) via explode + two partial aggregations — the
  shuffle carries (doc_id, token) counts, never text.
- pack_greedy: greedy token-budget packing of documents into training
  sequences. Packing is sharded (pmod(doc_id, SHARDS)) so the
  running-sum window never becomes a single global sort — each shard
  packs independently, which is how a cluster packs 10^9 docs (shard
  count scales with executors; the reference's per-table independent
  pipelines are the same isolation shape, SURVEY.md §2 S2/D6).
- decontaminate: flag training documents sharing any word 3-gram with
  an eval/benchmark set. The eval side is BROADCAST (benchmark suites
  are MBs; the corpus is the 100 TB side), so the only shuffle is the
  final per-doc aggregation.
- dup_clusters: candidate pairs → dedup GROUPS via connected
  components (min-label propagation, O(diameter) relational rounds).
- simhash_wide_dups: the 48-bit wide-fingerprint near-dup path — the
  measured form of "widen the hash at 10^9 docs".

Reference parity: the reference has no relational layer (SURVEY.md
§2.6 — transformation is delegated to providers); these fill the
"operations a large-scale training-data pipeline would need" axis of
the brief with oracle-checked implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dstream_spark.fixtures.transcripts import register_tables
from dstream_spark.functions import dedup_text
from dstream_spark.queries_base import (
    MINHASH_BANDS_BODY,
    MINHASH_SIG_CTE,
    SHINGLES_SQL,
    Query,
    _materialize,
    _materialize_adaptive,
    fan_out,
)

# train/val/test boundaries over the 0..255 bucket space (80/10/10)
SPLIT_TRAIN_LT = 204
SPLIT_VAL_LT = 230
PACK_BUDGET_TOKENS = 512
PACK_SHARDS = 8
DECON_EVAL_MAX_ID = 20  # doc_id < 20 plays the benchmark/eval set


def _hex_nibble(c):
    # md5 hex is lowercase on both engines; instr is 1-based on both
    return F.instr(F.lit("0123456789abcdef"), c) - 1


def q_docs_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: bucket = first md5 byte of
    the document id (0..255), split by fixed boundaries. Identity-keyed
    (not text-keyed) so near-identical revisions of a document land in
    the SAME split — the leakage-safe default."""
    register_tables(spark, sf_dir, ("documents",))
    d = spark.table("documents")
    h = F.md5(F.col("doc_id").cast("string"))
    bucket = (
        _hex_nibble(F.substring(h, 1, 1)) * 16 + _hex_nibble(F.substring(h, 2, 1))
    ).cast("int")
    split = (
        F.when(F.col("hash_bucket") < SPLIT_TRAIN_LT, F.lit("train"))
        .when(F.col("hash_bucket") < SPLIT_VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return d.select("doc_id", bucket.alias("hash_bucket")).withColumn("split", split)


def q_docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-quality signals (the Gopher/C4 rules' shape): unique
    -token ratio and top-token ratio per document. explode → count per
    (doc, token) → per-doc max/sum: both aggregations partial-combine
    map-side, and the exchange carries token COUNTS, not text. Ratios
    are one double division of exact BIGINTs (cross-engine bit-exact,
    see the conventions header in queries.py)."""
    register_tables(spark, sf_dir, ("documents",))
    d = spark.table("documents")
    ex = fan_out(d).select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    cnt = ex.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_uniq"),
        F.max("c").alias("top_tok_n"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_uniq",
        "top_tok_n",
        (F.col("n_uniq").cast("double") / F.col("n_tokens").cast("double")).alias("uniq_ratio"),
        (F.col("top_tok_n").cast("double") / F.col("n_tokens").cast("double")).alias(
            "top_tok_ratio"
        ),
    )


def q_docs_pack_greedy(
    spark: SparkSession, sf_dir: str, n_shards: int | None = None
) -> DataFrame:
    """Greedy context-window packing: within a shard, documents (in
    doc_id order) accumulate into sequences of PACK_BUDGET_TOKENS;
    seq_id = floor(running_prefix / budget), tok_offset = position
    inside the sequence. The window is PARTITIONED BY SHARD — never a
    global orderBy (the single-task sort this engine bans).
    ``n_shards`` IS the parallelism knob at scale: it defaults to the
    session's defaultParallelism (each packing window sorts
    1/n_shards of the corpus in one task). The oracle-gated registry
    entry pins n_shards=PACK_SHARDS so the static DuckDB SQL —
    generated from the same value by pack_greedy_sql — stays exact;
    the gate passes at ANY fixed shard count (test_llm_ops runs a
    non-default one). floor(prev/budget) over doubles is exact for
    any corpus below 2^53 tokens per shard."""
    shards = int(n_shards) if n_shards is not None else spark.sparkContext.defaultParallelism
    register_tables(spark, sf_dir, ("documents",))
    d = spark.table("documents")
    base = d.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(shards)).cast("int").alias("shard"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(prev / PACK_BUDGET_TOKENS).cast("int").alias("seq_id"),
        (prev - F.floor(prev / PACK_BUDGET_TOKENS) * PACK_BUDGET_TOKENS)
        .cast("long")
        .alias("tok_offset"),
    )


def q_docs_pack_bpe(
    spark: SparkSession, sf_dir: str, n_shards: int | None = None
) -> DataFrame:
    """docs_pack_greedy packing REAL token budgets: the per-document
    length is docs_bpe_merged's merges-table BPE symbol count (what a
    production packer consumes), not the whitespace count. Same
    sharded-window shape — the budget source is the only change, which
    is the point: packing is composable with any upstream counter.
    ``n_shards`` as in q_docs_pack_greedy (defaults to cluster
    parallelism; the gated entry pins PACK_SHARDS)."""
    from dstream_spark.functions import text as textfn

    shards = int(n_shards) if n_shards is not None else spark.sparkContext.defaultParallelism
    register_tables(spark, sf_dir, ("documents",))
    d = spark.table("documents")
    pre = textfn.bpe_tokens("text")
    n_bpe = F.aggregate(
        F.transform(pre, textfn.merged_symbol_count),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
    base = fan_out(d).select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(shards)).cast("int").alias("shard"),
        n_bpe.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(prev / PACK_BUDGET_TOKENS).cast("int").alias("seq_id"),
        (prev - F.floor(prev / PACK_BUDGET_TOKENS) * PACK_BUDGET_TOKENS)
        .cast("long")
        .alias("tok_offset"),
    )


def q_docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (doc_id >=
    DECON_EVAL_MAX_ID) sharing at least one word 3-gram with the eval
    set (doc_id < DECON_EVAL_MAX_ID). The eval shingle table is
    broadcast — at 100 TB the benchmark suite is MBs against a
    corpus-sized training side, so candidate generation is a map-side
    hash join; the only exchange is the final per-doc aggregate.
    n_hits counts (train-shingle, eval-doc) matches; shingles are
    distinct per document on both sides."""
    register_tables(spark, sf_dir, ("documents",))
    d = spark.table("documents")
    ev = (
        d.filter(F.col("doc_id") < DECON_EVAL_MAX_ID)
        .select(
            F.col("doc_id").alias("eval_id"),
            F.explode(dedup_text.word_shingles("text", 3)).alias("g"),
        )
    )
    tr = fan_out(d.filter(F.col("doc_id") >= DECON_EVAL_MAX_ID)).select(
        "doc_id", F.explode(dedup_text.word_shingles("text", 3)).alias("g")
    )
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("eval_id").alias("n_eval_docs"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )


BLOOM_M = 16384  # filter bits — FIXED size whatever the eval corpus
BLOOM_K = 4  # hash functions per shingle


def _bloom_pos(g, j: int):
    """Bit position j of shingle ``g`` in the m-bit filter: first 8
    md5 hex digits of 'j|g' mod m. Spark-only — the oracle never needs
    positions because the Bloom prune is correctness-transparent (see
    q_docs_bloom_decontaminate)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}|"), g)), 1, 8), 16, 10)
    return (h.cast("long") % BLOOM_M).cast("int")


def q_docs_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docs_decontaminate at the scale where the eval side OUTGROWS
    the broadcast budget: a BLOOM-FILTER prune in front of the exact
    overlap join.

    q_docs_decontaminate broadcasts the eval shingle table — right
    when the benchmark suite is MBs, wrong once the "eval" side is a
    holdout corpus of its own (decontaminating 100 TB of training
    text against, say, 100 GB of eval text: the shingle table no
    longer fits an executor). The production shape is:

    1. BUILD: the eval shingles' Bloom filter as a table of DISTINCT
       set-bit positions — at most BLOOM_M rows (here 16384) however
       large the eval corpus, the same bounded-state trick as the HLL
       register table (functions/sketches.py). One exchange of ≤ m
       ints.
    2. PROBE: every training shingle checks its BLOOM_K positions via
       chained broadcast LEFT SEMI hash joins against the bit table —
       entirely map-side (the bit table is KBs), so the untouched
       99%+ of training shingles DROP before any key-bearing
       exchange. Same correctness-transparency argument as the CMS
       heavy-hitter prune (functions/sketches.py): every eval shingle
       sets all K of its bits, so a true-matching training shingle
       can never miss — survivors are a SUPERSET, false positives
       only.
    3. VERIFY: the exact join on the shingle text runs ONLY on
       survivors, as a shuffle hash join (the eval side is the
       smaller-but-not-broadcastable side by premise), and false
       positives vanish there.

    Output and oracle are therefore IDENTICAL to docs_decontaminate
    (same contract as tool_correlation_salted vs the unsalted join:
    the scale mechanism must not change the answer). Pytest proves
    the superset property and that the probe plan is broadcast-semi
    map-side (tests/test_llm_ops.py).

    Reference: the reference relay has no relational layer at all
    (docs/design/design.md:87-101); this fills the brief's
    training-data-pipeline axis."""
    register_tables(spark, sf_dir, ("documents",))
    d = spark.table("documents")
    ev_grams = (
        d.filter(F.col("doc_id") < DECON_EVAL_MAX_ID)
        .select(F.explode(dedup_text.word_shingles("text", 3)).alias("g"))
        .distinct()
    )
    bits = _materialize(
        ev_grams.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("g"), j) for j in range(BLOOM_K)])
            ).alias("bit")
        ).distinct(),
        "bloom_bits",
    )
    tr = fan_out(d.filter(F.col("doc_id") >= DECON_EVAL_MAX_ID)).select(
        "doc_id", F.explode(dedup_text.word_shingles("text", 3)).alias("g")
    )
    surv = tr
    for j in range(BLOOM_K):
        b = bits.select(F.col("bit").alias(f"b{j}"))
        surv = surv.join(
            F.broadcast(b), _bloom_pos(F.col("g"), j) == F.col(f"b{j}"), "left_semi"
        )
    ev = d.filter(F.col("doc_id") < DECON_EVAL_MAX_ID).select(
        F.col("doc_id").alias("eval_id"),
        F.explode(dedup_text.word_shingles("text", 3)).alias("g"),
    )
    return (
        surv.join(ev.hint("shuffle_hash"), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("eval_id").alias("n_eval_docs"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )


def q_docs_simhash_wide_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WIDE-fingerprint near-dup path: 48-bit simhash + pigeonhole
    banding at hamming ≤ 8. docs_simhash_dups (32-bit) documents that
    pruning power is 2^(bits/9) buckets per segment — 8-16 at 32 bits,
    32-64 at 48 bits — so widening the fingerprint is THE scale lever
    for 10^9+ corpora (Manku et al.'s permuted-table scheme). This
    query makes that claim a measured, oracle-checked fact rather than
    a docstring: same operator (simhash_table / simhash_near_dups are
    bit-parameterized), same brute-force DuckDB ground truth. 48 bits
    (12 of md5's 32 hex nibbles) keeps 2^b termwise inside BIGINT on
    both engines."""
    register_tables(spark, sf_dir, ("documents",))
    d = spark.table("documents")
    s = _materialize(dedup_text.simhash_table(fan_out(d), bits=48), "simhash48")
    return dedup_text.simhash_near_dups(s, bits=48, max_hamming=8)


def q_docs_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER RESOLUTION — the step between candidate pairs
    and 'keep one per group': connected components over the
    MinHash-LSH pair graph by min-label propagation. Each iteration is
    one relational step (labels ⋈ edges → min per node, all
    partial-aggregated); the driver loop only reads a scalar
    changed-count, so the data never leaves the cluster — this is the
    standard O(diameter)-round Spark CC (large-star/small-star's
    simple form; dup clusters have tiny diameters, so rounds ≈ 2-3).
    Output: (doc_id, cluster_id = min doc_id of the component, keep =
    doc_id == cluster_id) for every document in at least one pair.
    Oracle: DuckDB recursive-CTE reachability with min aggregation."""
    from dstream_spark.queries import q_docs_minhash_pairs

    pairs = q_docs_minhash_pairs(spark, sf_dir).select("id_a", "id_b")
    edges = _materialize(
        pairs.union(
            pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        ),
        "cc_edges",
    )
    labels = edges.select(F.col("id_a").alias("doc_id")).distinct().withColumn(
        "label", F.col("doc_id")
    )
    for _ in range(20):  # diameter bound; dup clusters converge in 2-3
        neigh = (
            edges.join(labels, edges.id_b == labels.doc_id)
            .groupBy(F.col("id_a").alias("doc_id"))
            .agg(F.min("label").alias("n_label"))
        )
        new = labels.join(neigh, "doc_id", "left").select(
            "doc_id",
            F.least(F.col("label"), F.coalesce(F.col("n_label"), F.col("label"))).alias(
                "label"
            ),
            F.col("label").alias("_old"),
        )
        # land the round once, THEN read the convergence scalar from
        # the landed table — one execution per round, not two
        mat = _materialize(new, "cc_labels")
        changed = mat.filter(F.col("label") != F.col("_old")).count()
        labels = mat.drop("_old")
        if changed == 0:
            break
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (F.col("doc_id") == F.col("label")).alias("keep"),
    )


PARA_TOKENS = 8  # paragraph convention: consecutive 8-token chunks


def q_docs_para_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUB-document (paragraph-level) dedup — the granularity that
    catches boilerplate headers/footers shared across otherwise
    distinct documents. The fixture corpus has no newlines, so the
    paragraph convention is consecutive PARA_TOKENS-token chunks
    (deterministic segmentation both engines compute identically).
    Shape: explode paragraphs → md5 → hash-groupBy (ONE shuffle on the
    16-byte hash, matching docs_exact_dedup's plan, queries.py:332) →
    join counts back → per-doc rollup. Output per document: paragraph
    count, duplicated-paragraph count (hash seen >1× corpus-wide),
    owned-representative count (this doc is the min-doc_id holder of
    the hash), and the duplication ratio (one double division of exact
    BIGINTs — the cross-engine float convention)."""
    register_tables(spark, sf_dir, ("documents",))
    d = spark.table("documents")
    # Arrow-vectorized disjoint chunks (r6, guide §4.2): exact mirror
    # of the transform(sequence, concat_ws(slice)) segmentation
    paras = dedup_text.word_chunks("text", PARA_TOKENS)
    # materialize the exploded hash table ONCE: it feeds BOTH the
    # per-hash count and the join back, and Catalyst re-derives a
    # shared subtree per consumer (the self-join lesson, _materialize)
    inst = _materialize(
        fan_out(d)
        .select("doc_id", F.explode(paras).alias("para"))
        .select("doc_id", F.md5("para").alias("para_md5")),
        "para_inst",
    )
    cnt = inst.groupBy("para_md5").agg(
        F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("rep_doc_id")
    )
    per_doc = (
        inst.join(cnt, "para_md5")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_paras"),
        )
    )
    owned = cnt.groupBy(F.col("rep_doc_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_owned")
    )
    return (
        per_doc.join(owned, "doc_id", "left")
        .select(
            "doc_id",
            "n_paras",
            "n_dup_paras",
            F.coalesce(F.col("n_owned"), F.lit(0)).cast("bigint").alias("n_owned"),
            (
                F.col("n_dup_paras").cast("double") / F.col("n_paras").cast("double")
            ).alias("dup_ratio"),
        )
    )


def q_docs_bpe_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merges-table-driven BPE token counting — the count a
    token-budget packer (docs_pack_greedy) consumes in production,
    upgrading docs_bpe_tokens' pre-token run count. Each pre-token
    (letter/digit/punct run) is spelled as delimiter-safe characters
    and the ordered merge table (functions/text.BPE_MERGES, the
    fixture's merges.txt) is applied as plain-substring replaces —
    all JVM string built-ins inside one projection, no UDF, no
    shuffle. The oracle's merge expression is GENERATED from the same
    Python constant, so operator and oracle cannot drift."""
    from dstream_spark.functions import text as textfn

    register_tables(spark, sf_dir, ("documents",))
    d = spark.table("documents")
    pre = textfn.bpe_tokens("text")
    counts = F.transform(pre, textfn.merged_symbol_count)
    n_pre = F.size(pre).cast("int")
    n_merged = F.aggregate(
        counts, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )
    return fan_out(d).select(
        "doc_id",
        n_pre.alias("n_pretokens"),
        n_merged.alias("n_bpe_tokens"),
    ).select(
        "doc_id",
        "n_pretokens",
        "n_bpe_tokens",
        (
            F.col("n_bpe_tokens").cast("double") / F.col("n_pretokens").cast("double")
        ).alias("symbols_per_pretoken"),
    )


def _simhash_sql(bits: int) -> tuple[str, str]:
    """DuckDB form of functions.dedup_text.simhash_table(bits): per-bit
    token votes from md5 hex nibbles, then the positive-vote combine
    (mirrors queries.py's 32-bit _SIMHASH_BIT_SUMS/_SIMHASH_COMBINE)."""
    bit_sums = ",\n         ".join(
        f"SUM(((instr('0123456789abcdef', substring(md5(tok), {b // 4 + 1}, 1)) - 1) >> {b % 4}) & 1) * 2 - count(*) AS v_{b}"
        for b in range(bits)
    )
    combine = " + ".join(
        f"CASE WHEN v_{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END" for b in range(bits)
    )
    return bit_sums, combine


_W_BIT_SUMS, _W_COMBINE = _simhash_sql(48)

def _bpe_merged_sql() -> str:
    from dstream_spark.functions.text import merged_symbol_count_sql

    cnt = (
        "CAST(coalesce(list_sum(list_transform(pts, t -> "
        + merged_symbol_count_sql("t")
        + ")), 0) AS BIGINT)"
    )
    return f"""
WITH pre AS (
  SELECT doc_id,
         regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+', 0) AS pts
  FROM documents
)
SELECT doc_id,
       CAST(len(pts) AS INT) AS n_pretokens,
       {cnt} AS n_bpe_tokens,
       CAST({cnt} AS DOUBLE) / CAST(len(pts) AS DOUBLE) AS symbols_per_pretoken
FROM pre"""


SUBSTR_WIN = 16  # rolling window length in tokens (overlapping, stride 1)


def q_docs_substr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SUBSTRING dedup signals (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): overlapping
    SUBSTR_WIN-token rolling windows (stride 1) hashed and counted
    corpus-wide; a window held by >= 2 DISTINCT documents marks a
    cross-document duplicated span. Unlike docs_para_dedup's disjoint
    chunks, overlapping windows catch duplicated passages at ANY
    offset — the ExactSubstr property — at the cost of ~1 hash per
    token instead of 1 per PARA_TOKENS.

    Per document: window count, duplicated-window count, and
    max_dup_span — the LONGEST duplicated run in tokens, recovered
    from consecutive duplicated window starts by the gaps-and-islands
    trick (win_idx − row_number() is constant within a run; max run
    length + SUBSTR_WIN − 1 = span length). That is the per-doc
    "longest shared substring" statistic the ExactSubstr cut step
    consumes, without suffix arrays: the shuffle carries 16-byte
    hashes keyed first by hash (ONE corpus-wide exchange, the
    docs_exact_dedup plan) then by doc_id for the island scan —
    both linear in tokens, both partial-aggregated."""
    register_tables(spark, sf_dir, ("documents",))
    d = spark.table("documents")
    # Arrow-vectorized rolling windows (r6, guide §4.2): the
    # transform(sequence, concat_ws(slice)) expression ran interpreted
    # per window; dedup_text.word_windows is its exact mirror
    wins = dedup_text.word_windows("text", SUBSTR_WIN)
    # materialized once: feeds the per-hash count, the join-back, and
    # the per-doc window count (the para_dedup / self-join lesson)
    inst = _materialize(
        fan_out(d)
        .select("doc_id", F.posexplode(wins).alias("pos", "wtext"))
        .select(
            "doc_id", (F.col("pos") + 1).alias("win_idx"), F.md5("wtext").alias("h")
        ),
        "substr_inst",
    )
    cnt = inst.groupBy("h").agg(F.countDistinct("doc_id").alias("n_docs"))
    dup = inst.join(cnt.filter(F.col("n_docs") >= 2), "h").select("doc_id", "win_idx")
    w = Window.partitionBy("doc_id").orderBy("win_idx")
    island = (
        dup.withColumn("grp", F.col("win_idx") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    pdd = island.groupBy("doc_id").agg(
        F.sum("run_len").alias("n_dup_windows"), F.max("run_len").alias("max_run")
    )
    nwin = inst.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_windows"))
    return (
        d.select("doc_id")
        .join(nwin, "doc_id", "left")
        .join(pdd, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_windows"), F.lit(0)).cast("bigint").alias("n_windows"),
            F.coalesce(F.col("n_dup_windows"), F.lit(0))
            .cast("bigint")
            .alias("n_dup_windows"),
            F.when(F.col("max_run").isNull(), F.lit(0))
            .otherwise(F.col("max_run") + F.lit(SUBSTR_WIN - 1))
            .cast("bigint")
            .alias("max_dup_span"),
        )
    )


def q_docs_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM QUALITY SCORING (Wenzek et al. 2020): score every
    document by bits-per-token under an add-one-smoothed bigram model
    trained on the corpus itself, then bucket head/middle/tail around
    the corpus mean — the perplexity-filtering step real pretraining
    pipelines run between dedup and packing.

    The engine discipline is the point: NO transcendental functions.
    log2 runs in exact FIXED-POINT micro-bits via the IEEE squaring
    algorithm (functions/fixlog.py — every op exact or correctly
    rounded, so Spark and DuckDB agree bit-for-bit; ln/exp would flake
    a hash gate at the last ulp). Per-transition NLL_micro =
    log2_micro(c(w1)+V) − log2_micro(c(w1,w2)+1) is a BIGINT, per-doc
    totals are integer sums (no float accumulation order), and the
    head/middle/tail cut compares floored integer means at ±10%
    around the corpus mean.

    Plan: bigram instances materialized ONCE (they feed the bigram
    counts, the context counts, and the score join-back); counts are
    partial-aggregated keyed exchanges; the 39-step log2 chain runs on
    the bigram TYPE table (vocab², not corpus-sized) entirely inside
    one codegen span; V and the corpus mean ride 1-row broadcasts.
    Docs with < 2 tokens surface as bucket='short' with NULL bits."""
    from dstream_spark.functions.fixlog import with_fp_log2

    register_tables(spark, sf_dir, ("documents",))
    d = spark.table("documents")
    tk = F.split(F.col("text"), " ")
    bigrams = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.struct(
                F.element_at(tk, i).alias("w1"), F.element_at(tk, i + 1).alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    binst = _materialize(
        fan_out(d)
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")),
        "lm_binst",
    )
    big = binst.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = binst.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    # r6 (guide §1.2 "don't compute things you throw away" + §3.1):
    # lb = log2(c1 + V) depends only on w1, so its 19-step chain runs
    # on the VOCAB-sized context table, not once per (w1, w2) bigram
    # type; la's chain runs on the bigram-type table before the join,
    # so the join carries two final BIGINTs instead of feeding both
    # chains. Same integer inputs through the same chain → the scored
    # values are bit-identical (the frozen DuckDB oracle text still
    # computes both chains post-join; equal by construction).
    uni_l = with_fp_log2(
        uni.crossJoin(F.broadcast(vocab)).select(
            "w1", (F.col("c1") + F.col("v")).alias("bv")
        ),
        "bv",
        "lb",
    )
    big_l = with_fp_log2(
        big.select("w1", "w2", (F.col("c12") + 1).alias("a")), "a", "la"
    )
    nllt = big_l.join(uni_l, "w1").select(
        "w1", "w2", (F.col("lb") - F.col("la")).alias("nll_micro")
    )
    # landed + broadcast-when-actually-small (_materialize_adaptive,
    # guide §3.1): under the cap the instance join is map-side — binst
    # is never exchanged on (w1, w2), the fixlog chains run exactly
    # once (inside the landed build, truncating 2×19 projection steps
    # out of the main plan — planning alone cost ~1 s per run before),
    # and past the cap (web-scale vocab²) the planner's shuffle
    # strategy stands. Measured at sf0.1: plan 1.5→0.05 s, exec
    # 3.7→0.9 s, total ~7→5.5 s.
    nllt = _materialize_adaptive(nllt, "lm_nllt")
    perdoc = (
        binst.join(nllt, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trans"),
            F.sum("nll_micro").alias("nll_micro"),
        )
    )
    tot = perdoc.agg(
        F.sum("nll_micro").alias("tn"), F.sum("n_trans").alias("tt")
    )
    doc_mean = F.floor(
        F.col("nll_micro").cast("double") / F.col("n_trans").cast("double")
    )
    corpus_mean = F.floor(F.col("tn").cast("double") / F.col("tt").cast("double"))
    return (
        d.select("doc_id")
        .join(perdoc, "doc_id", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.coalesce(F.col("n_trans"), F.lit(0)).cast("bigint").alias("n_trans"),
            F.coalesce(F.col("nll_micro"), F.lit(0)).cast("bigint").alias("nll_micro"),
            F.when(F.col("n_trans").isNull(), F.lit(None).cast("double"))
            .otherwise(
                F.col("nll_micro").cast("double")
                / (F.col("n_trans").cast("double") * 1000000.0)
            )
            .alias("bits_per_token"),
            F.when(F.col("n_trans").isNull(), F.lit("short"))
            .when(doc_mean * 10 <= corpus_mean * 9, F.lit("head"))
            .when(doc_mean * 10 >= corpus_mean * 11, F.lit("tail"))
            .otherwise(F.lit("middle"))
            .alias("bucket"),
        )
    )


def q_docs_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INVERTED-INDEX construction — the original MapReduce workload
    and the retrieval-side counterpart of the corpus operators: one
    row per (term, doc_id) carrying tf and the sorted 1-based
    in-document position list (a POSITIONAL posting, what phrase and
    proximity queries need). Scale shape: posexplode is map-side; the
    single exchange is keyed (term, doc_id) with object-hash partial
    aggregation, and emitting posting ROWS (not one giant array per
    term) keeps row size bounded even for stopwords — the posting-
    file layout, where a (term) range partition makes per-term
    segments contiguous on disk. docs_phrase_hits consumes this index
    and is oracle-checked against a DIFFERENT algorithm (the lead()
    adjacency scan), proving index lookups equal the full scan."""
    register_tables(spark, sf_dir, ("documents",))
    d = spark.table("documents")
    toks = (
        fan_out(d)
        .select(
            "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term")
        )
        .filter(F.col("term") != "")
    )
    return toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"),
        F.sort_array(F.collect_list((F.col("pos") + 1).cast("int"))).alias(
            "positions"
        ),
    )


def q_docs_phrase_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHRASE QUERY over the positional inverted index: find every
    document containing the corpus's most frequent word bigram as an
    adjacent phrase, with its hit count — computed by POSITION-LIST
    INTERSECTION (join the two terms' postings per doc, intersect
    positions(w1)+1 with positions(w2)), the way a search engine
    answers "w1 w2". The oracle computes the same answer by a
    completely different algorithm — the lead() adjacency scan over
    the raw text — so the gate proves index == scan, the property an
    index build must ship with. The phrase itself is data-derived
    (max count, then lexicographic (w1, w2)) and read as ONE driver
    scalar; the posting join is (doc_id)-keyed on two broadcast-sized
    slices of the index."""
    register_tables(spark, sf_dir, ("documents",))
    idx = q_docs_inverted_index(spark, sf_dir)
    d = spark.table("documents")
    tk = F.split(F.col("text"), " ")
    bigrams = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.struct(
                F.element_at(tk, i).alias("w1"), F.element_at(tk, i + 1).alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    top = (
        d.select(F.explode(bigrams).alias("bg"))
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w1").asc(), F.col("w2").asc())
        .first()
    )
    # r6 (guide §2.4, §1.2): ONE consumption of the index instead of
    # two. The old shape filtered the index per term in two self-join
    # branches — Catalyst re-derives the subtree per branch, so the
    # whole posexplode+aggregate index build ran TWICE, then joined on
    # doc_id. Now the term filter (the per-term posting-segment read a
    # (term)-partitioned index serves at scale) is applied once, and
    # the two position lists pivot onto one row per doc in the same
    # aggregate: a posting is unique per (term, doc), so
    # first(ignorenulls) over the two term-cases is deterministic, and
    # non-null-both == the old inner join (incl. the w1 == w2 edge,
    # where both cases select the same posting — exactly p1 == p2
    # before). The intersection expression is unchanged.
    p = idx.filter(F.col("term").isin(top["w1"], top["w2"]))
    both = (
        p.groupBy("doc_id")
        .agg(
            F.first(
                F.when(F.col("term") == top["w1"], F.col("positions")), True
            ).alias("pos1"),
            F.first(
                F.when(F.col("term") == top["w2"], F.col("positions")), True
            ).alias("pos2"),
        )
        .filter(F.col("pos1").isNotNull() & F.col("pos2").isNotNull())
    )
    hits = (
        both.select(
            "doc_id",
            F.size(
                F.array_intersect(
                    F.transform(F.col("pos1"), lambda x: x + 1), F.col("pos2")
                )
            )
            .cast("bigint")
            .alias("n_hits"),
        )
        .filter(F.col("n_hits") >= 1)
    )
    return hits.select(
        "doc_id",
        F.lit(top["w1"]).alias("w1"),
        F.lit(top["w2"]).alias("w2"),
        "n_hits",
    )


# phrase-hits oracle: a DIFFERENT algorithm on purpose — the lead()
# adjacency scan, no index involved; same deterministic phrase pick
_PHRASE_HITS_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
), adj0 AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1),
         i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS bg
  FROM toks
), adj AS (
  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM adj0
), top AS (
  SELECT w1, w2 FROM (
    SELECT w1, w2, count(*) AS n,
           row_number() OVER (ORDER BY count(*) DESC, w1 ASC, w2 ASC) AS rn
    FROM adj GROUP BY 1, 2
  ) WHERE rn = 1
)
SELECT a.doc_id, t.w1 AS w1, t.w2 AS w2, CAST(count(*) AS BIGINT) AS n_hits
FROM adj a JOIN top t ON a.w1 = t.w1 AND a.w2 = t.w2
GROUP BY 1, 2, 3"""


def _lm_ppl_sql() -> str:
    """Oracle for q_docs_lm_perplexity: the same counts, the same
    fixed-point log2 chain (fixlog.fp_log2_sql generates the DuckDB
    twin of the Spark withColumn chain), the same floored-mean bucket
    cut — bit-identical by construction, not by rounding."""
    from dstream_spark.functions.fixlog import fp_log2_sql

    types_inner = (
        "SELECT b.w1, b.w2, b.c12 + 1 AS a, u.c1 + vv.v AS bv "
        "FROM big b JOIN uni u USING (w1) CROSS JOIN vv"
    )
    chain = fp_log2_sql(fp_log2_sql(types_inner, "a", "la"), "bv", "lb")
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
), binst0 AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1),
         i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS bg
  FROM toks
), binst AS (
  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM binst0
), big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM binst GROUP BY 1, 2
), uni AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM binst GROUP BY 1
), vv AS (
  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
), nllt AS (
  SELECT w1, w2, lb - la AS nll_micro FROM ({chain})
), perdoc AS (
  SELECT i.doc_id, CAST(count(*) AS BIGINT) AS n_trans,
         CAST(SUM(n.nll_micro) AS BIGINT) AS nll_micro
  FROM binst i JOIN nllt n USING (w1, w2) GROUP BY 1
), tot AS (
  SELECT CAST(SUM(nll_micro) AS BIGINT) AS tn,
         CAST(SUM(n_trans) AS BIGINT) AS tt FROM perdoc
)
SELECT d.doc_id,
       CAST(coalesce(p.n_trans, 0) AS BIGINT) AS n_trans,
       CAST(coalesce(p.nll_micro, 0) AS BIGINT) AS nll_micro,
       CASE WHEN p.doc_id IS NULL THEN NULL
            ELSE CAST(p.nll_micro AS DOUBLE) / (CAST(p.n_trans AS DOUBLE) * 1000000.0)
       END AS bits_per_token,
       CASE WHEN p.doc_id IS NULL THEN 'short'
            WHEN FLOOR(CAST(p.nll_micro AS DOUBLE) / CAST(p.n_trans AS DOUBLE)) * 10
                 <= (SELECT FLOOR(CAST(tn AS DOUBLE) / CAST(tt AS DOUBLE)) FROM tot) * 9 THEN 'head'
            WHEN FLOOR(CAST(p.nll_micro AS DOUBLE) / CAST(p.n_trans AS DOUBLE)) * 10
                 >= (SELECT FLOOR(CAST(tn AS DOUBLE) / CAST(tt AS DOUBLE)) FROM tot) * 11 THEN 'tail'
            ELSE 'middle'
       END AS bucket
FROM documents d LEFT JOIN perdoc p USING (doc_id)"""


LLM_ORACLES: dict[str, str] = {
    "docs_substr_dedup": f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
), inst0 AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - {SUBSTR_WIN - 1}),
         i -> struct_pack(w := i, h := md5(array_to_string(tk[i:i+{SUBSTR_WIN - 1}], ' '))))) AS s
  FROM toks
), inst AS (
  SELECT doc_id, s.w AS win_idx, s.h AS h FROM inst0
), cnt AS (
  SELECT h, count(DISTINCT doc_id) AS n_docs FROM inst GROUP BY 1
), dup AS (
  SELECT i.doc_id, i.win_idx FROM inst i JOIN cnt c USING (h) WHERE c.n_docs >= 2
), island AS (
  SELECT doc_id, grp, count(*) AS run_len FROM (
    SELECT doc_id, win_idx,
           win_idx - row_number() OVER (PARTITION BY doc_id ORDER BY win_idx) AS grp
    FROM dup
  ) GROUP BY 1, 2
), pdd AS (
  SELECT doc_id, CAST(SUM(run_len) AS BIGINT) AS n_dup_windows,
         CAST(MAX(run_len) AS BIGINT) AS max_run
  FROM island GROUP BY 1
), nwin AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows FROM inst GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(nw.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CAST(CASE WHEN p.max_run IS NULL THEN 0
                 ELSE p.max_run + {SUBSTR_WIN - 1} END AS BIGINT) AS max_dup_span
FROM documents d LEFT JOIN nwin nw USING (doc_id) LEFT JOIN pdd p USING (doc_id)""",
    "docs_para_dedup": f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
), inst AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, CAST(ceil(len(tk) / {PARA_TOKENS}.0) AS BIGINT)),
           i -> md5(array_to_string(tk[(i-1)*{PARA_TOKENS}+1 : (i-1)*{PARA_TOKENS}+{PARA_TOKENS}], ' '))
         )) AS para_md5
  FROM toks
), cnt AS (
  SELECT para_md5, count(*) AS n_copies, min(doc_id) AS rep_doc_id
  FROM inst GROUP BY 1
), pd AS (
  SELECT i.doc_id, count(*) AS n_paras,
         CAST(sum(CASE WHEN c.n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras
  FROM inst i JOIN cnt c USING (para_md5) GROUP BY 1
), ow AS (
  SELECT rep_doc_id AS doc_id, count(*) AS n_owned FROM cnt GROUP BY 1
)
SELECT pd.doc_id, pd.n_paras, pd.n_dup_paras,
       CAST(coalesce(ow.n_owned, 0) AS BIGINT) AS n_owned,
       CAST(pd.n_dup_paras AS DOUBLE) / CAST(pd.n_paras AS DOUBLE) AS dup_ratio
FROM pd LEFT JOIN ow USING (doc_id)""",
    "docs_bpe_merged": _bpe_merged_sql(),
    "docs_pack_bpe": None,  # filled below (needs the merge expression)
    # cluster_id = min reachable doc over the undirected pair graph —
    # exactly what min-label propagation converges to
    "docs_dup_clusters": f"""
WITH RECURSIVE {MINHASH_SIG_CTE}, bands AS (
{MINHASH_BANDS_BODY}
), pairs AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b
  FROM bands l
  JOIN bands r
    ON l.band = r.band AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
  GROUP BY 1, 2
), edges AS (
  SELECT id_a, id_b FROM pairs UNION ALL SELECT id_b, id_a FROM pairs
), reach(src, dst) AS (
  SELECT DISTINCT id_a, id_a FROM edges
  UNION
  SELECT r.src, e.id_b FROM reach r JOIN edges e ON r.dst = e.id_a
)
SELECT src AS doc_id, min(dst) AS cluster_id, (src = min(dst)) AS keep
FROM reach GROUP BY 1""",
    "docs_simhash_wide_dups": f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), votes AS (
  SELECT doc_id,
         {_W_BIT_SUMS}
  FROM toks GROUP BY doc_id
), sh AS (
  SELECT doc_id, {_W_COMBINE} AS simhash FROM votes
)
SELECT l.doc_id AS id_a, r.doc_id AS id_b,
       CAST(bit_count(xor(l.simhash, r.simhash)) AS INT) AS hamming
FROM sh l JOIN sh r ON l.doc_id < r.doc_id
WHERE bit_count(xor(l.simhash, r.simhash)) <= 8""",
    "docs_hash_split": f"""
WITH b AS (
  SELECT doc_id,
         CAST((instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
              + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
              AS INT) AS hash_bucket
  FROM documents
)
SELECT doc_id, hash_bucket,
       CASE WHEN hash_bucket < {SPLIT_TRAIN_LT} THEN 'train'
            WHEN hash_bucket < {SPLIT_VAL_LT} THEN 'val'
            ELSE 'test' END AS split
FROM b""",
    "docs_repetition": """
WITH ex AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), cnt AS (
  SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       count(*) AS n_uniq,
       CAST(max(c) AS BIGINT) AS top_tok_n,
       CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS uniq_ratio,
       CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_tok_ratio
FROM cnt GROUP BY doc_id""",
    "docs_pack_greedy": None,  # filled below (shard-parameterized)
    "docs_decontaminate": f"""
WITH sh AS (
  SELECT doc_id, unnest({SHINGLES_SQL}) AS g FROM documents
)
SELECT t.doc_id AS doc_id,
       count(DISTINCT e.doc_id) AS n_eval_docs,
       count(*) AS n_hits
FROM sh t
JOIN sh e ON t.g = e.g AND t.doc_id >= {DECON_EVAL_MAX_ID} AND e.doc_id < {DECON_EVAL_MAX_ID}
GROUP BY 1""",
}

def pack_greedy_sql(n_shards: int) -> str:
    """DuckDB twin of q_docs_pack_greedy at a GIVEN shard count — the
    oracle is generated from the same parameter as the Spark query, so
    the gate is exact at any fixed n_shards."""
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(doc_id % {n_shards} AS INT) AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), pre AS (
  SELECT doc_id, shard, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev
  FROM base
)
SELECT doc_id, shard, n_tokens,
       CAST(FLOOR(prev / {PACK_BUDGET_TOKENS}.0) AS INT) AS seq_id,
       CAST(prev - CAST(FLOOR(prev / {PACK_BUDGET_TOKENS}.0) AS BIGINT) * {PACK_BUDGET_TOKENS} AS BIGINT) AS tok_offset
FROM pre"""


def pack_bpe_sql(n_shards: int) -> str:
    """DuckDB twin of q_docs_pack_bpe at a GIVEN shard count."""
    from dstream_spark.functions.text import merged_symbol_count_sql

    cnt = (
        "CAST(coalesce(list_sum(list_transform(pts, t -> "
        + merged_symbol_count_sql("t")
        + ")), 0) AS BIGINT)"
    )
    return f"""
WITH pre AS (
  SELECT doc_id,
         regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+', 0) AS pts
  FROM documents
), base AS (
  SELECT doc_id,
         CAST(doc_id % {n_shards} AS INT) AS shard,
         {cnt} AS n_tokens
  FROM pre
), p AS (
  SELECT doc_id, shard, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev
  FROM base
)
SELECT doc_id, shard, n_tokens,
       CAST(FLOOR(prev / {PACK_BUDGET_TOKENS}.0) AS INT) AS seq_id,
       CAST(prev - CAST(FLOOR(prev / {PACK_BUDGET_TOKENS}.0) AS BIGINT) * {PACK_BUDGET_TOKENS} AS BIGINT) AS tok_offset
FROM p"""


# gated entries pin n_shards=PACK_SHARDS on BOTH sides (the driver's
# cluster parallelism is unknown, so the static oracle can't track a
# runtime default); library callers get the parallelism-tracking default
LLM_ORACLES["docs_pack_greedy"] = pack_greedy_sql(PACK_SHARDS)
LLM_ORACLES["docs_pack_bpe"] = pack_bpe_sql(PACK_SHARDS)


def _pack_greedy_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_docs_pack_greedy(spark, sf_dir, n_shards=PACK_SHARDS)


def _pack_bpe_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_docs_pack_bpe(spark, sf_dir, n_shards=PACK_SHARDS)

def q_docs_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by TF-IDF — the canonical text-
    weighting shape: token explode → per-(doc, term) tf → per-term
    document frequency DERIVED FROM THE TF TABLE (no second corpus
    scan) → idf join → windowed top-k partitioned by doc. Exactness:
    tf/df/n_docs are exact BIGINTs and idf runs in fixed-point
    micro-bits (functions/fixlog.py — log2 via IEEE squaring,
    bit-identical on both engines; this entry originally shipped
    round(ln, 4), which is ~1-ulp engine-dependent — the LAST
    transcendental in the registry, now gone). The rank orders on the
    exact-integer score tf·(log2µ(N) − log2µ(df)) with a term
    tiebreak; the reported double is one exact division of it. At
    10^12 tokens: two keyed exchanges (tf, df) + one per-doc window;
    the fixlog chain runs on the |vocab|-row df table, broadcastable
    when the vocabulary is bounded."""
    from dstream_spark.functions.fixlog import with_fp_log2

    register_tables(spark, sf_dir, ("documents",))
    d = spark.table("documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = with_fp_log2(
        tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")), "df", "l2df"
    )
    n = with_fp_log2(d.agg(F.count(F.lit(1)).alias("n_docs")), "n_docs", "l2n")
    scored = (
        tf.join(dfq, "term")
        .join(F.broadcast(n))
        .withColumn("tfidf_micro", F.col("tf") * (F.col("l2n") - F.col("l2df")))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id",
            "term",
            (F.col("tfidf_micro").cast("double") / 1000000.0).alias("tfidf"),
            "rn",
        )
    )


def _tfidf_sql() -> str:
    from dstream_spark.functions.fixlog import fp_log2_sql

    idf_inner = (
        "SELECT dfq.term AS term, dfq.df AS df, n.n_docs AS n_docs "
        "FROM dfq CROSS JOIN n"
    )
    chain = fp_log2_sql(fp_log2_sql(idf_inner, "df", "l2df"), "n_docs", "l2n")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term
), dfq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term AS term, tf.tf * (c.l2n - c.l2df) AS tfidf_micro
  FROM tf JOIN ({chain}) c ON tf.term = c.term
)
SELECT doc_id, term, CAST(tfidf_micro AS DOUBLE) / 1000000.0 AS tfidf,
       CAST(rn AS INT) AS rn FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf_micro DESC, term ASC) AS rn
  FROM scored
) WHERE rn <= 3"""


LLM_ORACLES_TFIDF = _tfidf_sql()


SAMPLE_K = 5  # docs kept per language

# A-ES (exponential-sort / Efraimidis-Spirakis) key as SHARED SQL
# text: u = 48 md5 bits mapped into (0,1) strictly (the +0.5 keeps it
# off both endpoints), key = -ln(u) / weight. Smaller key == more
# likely pick for larger weight; deterministic given doc_id, exact on
# both engines (hex digits -> exact integer, one ln, one division).
from dstream_spark.functions.sketches import hex_pair_expr as _hp  # noqa: E402


def _aes_key_expr(hcol: str, wcol: str) -> str:
    # leading CAST promotes the whole fold to BIGINT (Spark's INT
    # arithmetic overflows at 2^31 under ANSI; DuckDB instr is
    # already BIGINT — the cast is a no-op there)
    v = f"((((CAST(({_hp(hcol, 1)}) AS BIGINT) * 256 + ({_hp(hcol, 3)})) * 256 + ({_hp(hcol, 5)})) * 256 "
    v += f"+ ({_hp(hcol, 7)})) * 256 + ({_hp(hcol, 9)})) * 256 + ({_hp(hcol, 11)})"
    return f"-ln((({v}) + 0.5) / 281474976710656.0) / {wcol}"


def q_docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED reservoir sample: SAMPLE_K docs per
    language, inclusion probability proportional to n_chars — the
    Efraimidis-Spirakis A-ES scheme with the randomness derived from
    md5(doc_id), so the sample is stable under reruns, replication,
    and partitioning (the property a distributed curation pipeline
    needs; true rand() would re-draw per attempt). Scale shape: the
    per-language top-k runs as a TWO-LEVEL tree — first a window over
    (lang, salt-bucket%16) keeping k per shard, then the final window
    over the ≤16k survivors — so no single task ever sorts a whole
    language (the hot-partition trap quota_sample documents). Exact:
    top-k of a group == top-k of the union of its shards' top-ks.
    Oracle: the flat per-language rank over the same key formula."""
    register_tables(spark, sf_dir, ("documents",))
    d = spark.table("documents").filter(F.col("n_chars") > 0)
    keyed = d.select(
        "doc_id", "lang", "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("_h"),
    ).select(
        "doc_id", "lang", "n_chars",
        F.expr(_aes_key_expr("_h", "n_chars")).alias("_key"),
        (F.col("doc_id") % 16).cast("int").alias("_salt"),
    )
    w1 = Window.partitionBy("lang", "_salt").orderBy(
        F.col("_key").asc(), F.col("doc_id").asc()
    )
    shard_top = keyed.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= SAMPLE_K
    )
    w2 = Window.partitionBy("lang").orderBy(F.col("_key").asc(), F.col("doc_id").asc())
    return (
        shard_top.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= SAMPLE_K)
        .select(
            "lang", "doc_id", "n_chars",
            F.round(F.col("_key"), 6).alias("samp_key"), "rn",
        )
    )


_WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         {_aes_key_expr("md5(CAST(doc_id AS VARCHAR))", "n_chars")} AS _key
  FROM documents WHERE n_chars > 0
), ranked AS (
  SELECT lang, doc_id, n_chars, round(_key, 6) AS samp_key,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY _key ASC, doc_id ASC) AS INT) AS rn
  FROM keyed
)
SELECT lang, doc_id, n_chars, samp_key, rn FROM ranked WHERE rn <= {SAMPLE_K}"""


# one SQL text, run verbatim by BOTH engines (Spark spark.sql ==
# DuckDB): multi-dimensional aggregate over explicit GROUPING SETS —
# per-type, per-user, and the grand total in ONE pass (Spark expands
# to a single Expand + partial-aggregated HashAggregate, not three
# scans)
_GROUPING_SETS_SQL = """
SELECT event_type, user_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / CAST(100 AS DOUBLE) AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type), (user_id), ())"""


def q_events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form rollup/cube specialize: three
    disjoint aggregation shapes (per event type, per user, grand
    total) in one pass over the fact. The SQL text is shared verbatim
    with the oracle; Catalyst plans one Expand + one partial-aggregated
    exchange, so at 10^12 rows the fact is read once, not three
    times."""
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_GROUPING_SETS_SQL)


LLM_QUERIES: dict[str, Query] = {
    "docs_weighted_sample": Query(
        q_docs_weighted_sample, _WEIGHTED_SAMPLE_SQL,
        "Efraimidis-Spirakis weighted reservoir sample (k per lang, "
        "md5-derived randomness, stable under reruns); two-level "
        "salted top-k so no task sorts a whole language",
    ),
    "events_grouping_sets": Query(
        q_events_grouping_sets, _GROUPING_SETS_SQL,
        "GROUPING SETS in one pass (Expand + partial agg): per-type, "
        "per-user, grand total; SQL text shared verbatim with the oracle",
    ),
    "docs_tfidf": Query(
        q_docs_tfidf, LLM_ORACLES_TFIDF,
        "top-3 TF-IDF terms per doc: tf/df exact BIGINTs, df derived "
        "from the tf table, rank on the rounded score with term "
        "tiebreak; two keyed exchanges + per-doc window",
    ),
    "docs_para_dedup": Query(
        q_docs_para_dedup, LLM_ORACLES["docs_para_dedup"],
        "sub-document (8-token paragraph) dedup: one shuffle on the "
        "16-byte hash; per-doc dup ratio + representative ownership",
    ),
    "docs_inverted_index": Query(
        q_docs_inverted_index,
        """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
  FROM documents
)
SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
       list(CAST(pos AS INT) ORDER BY pos) AS positions
FROM toks WHERE term <> '' GROUP BY 1, 2""",
        "positional inverted index (term, doc_id, tf, positions): the "
        "MapReduce-heritage retrieval build; one keyed exchange, "
        "posting rows bound row size for stopwords",
    ),
    "docs_phrase_hits": Query(
        q_docs_phrase_hits, _PHRASE_HITS_SQL,
        "phrase query via posting-position intersection, oracle = the "
        "lead() adjacency scan — a cross-ALGORITHM gate proving "
        "index == scan",
    ),
    "docs_substr_dedup": Query(
        q_docs_substr_dedup, LLM_ORACLES["docs_substr_dedup"],
        "ExactSubstr signals (Lee et al.): overlapping 16-token rolling "
        "windows, cross-doc duplicated spans, longest-run recovery via "
        "gaps-and-islands — suffix-array semantics, hash-join cost",
    ),
    "docs_lm_perplexity": Query(
        q_docs_lm_perplexity, _lm_ppl_sql(),
        "CCNet-style bigram-LM bits-per-token + head/middle/tail "
        "bucketing; log2 in exact fixed-point micro-bits (IEEE "
        "squaring, functions/fixlog.py) — zero transcendentals, "
        "integer sums, engine-invariant by construction",
    ),
    "docs_bpe_merged": Query(
        q_docs_bpe_merged, LLM_ORACLES["docs_bpe_merged"],
        "merges-table BPE token count (ordered merge ranks applied as "
        "delimiter-safe replaces, JVM-side); oracle generated from the "
        "same merge table",
    ),
    "docs_hash_split": Query(
        q_docs_hash_split, LLM_ORACLES["docs_hash_split"],
        "deterministic 80/10/10 split from md5(doc_id); shuffle-free projection",
    ),
    "docs_repetition": Query(
        q_docs_repetition, LLM_ORACLES["docs_repetition"],
        "Gopher-style repetition signals; partial-agg token counts",
    ),
    "docs_pack_greedy": Query(
        _pack_greedy_pinned, LLM_ORACLES["docs_pack_greedy"],
        "sharded greedy packing into token-budget sequences; no global sort",
    ),
    "docs_pack_bpe": Query(
        _pack_bpe_pinned, LLM_ORACLES["docs_pack_bpe"],
        "the packer consuming docs_bpe_merged's merges-table token "
        "counts — real token budgets, same sharded-window shape",
    ),
    "docs_decontaminate": Query(
        q_docs_decontaminate, LLM_ORACLES["docs_decontaminate"],
        "eval-set n-gram overlap; broadcast eval side",
    ),
    "docs_bloom_decontaminate": Query(
        q_docs_bloom_decontaminate, LLM_ORACLES["docs_decontaminate"],
        "Bloom-pruned decontamination — bounded bit table, map-side semi "
        "probe, exact verify on survivors only; same answer as the "
        "broadcast form by construction",
    ),
    "docs_simhash_wide_dups": Query(
        q_docs_simhash_wide_dups, LLM_ORACLES["docs_simhash_wide_dups"],
        "48-bit simhash banding — the wide-fingerprint scale path, measured",
    ),
    "docs_dup_clusters": Query(
        q_docs_dup_clusters, LLM_ORACLES["docs_dup_clusters"],
        "connected components over the LSH pair graph (min-label "
        "propagation); keep-one-per-cluster resolution",
    ),
}
