"""Deterministic sketch properties (functions/sketches.py): register
bounds, mergeability/idempotence, estimate accuracy on known
cardinalities, and the count-min overestimate guarantee."""

from pyspark.sql import functions as F

from dstream_spark.functions.sketches import (
    HIST_BINS,
    cms_build,
    cms_build_raw,
    cms_lookup,
    cms_probe_rows,
    hist_bins,
    hist_quantiles,
    hll_estimate,
    hll_registers,
)


def _items(spark, n, group="g"):
    return spark.range(n).select(
        F.lit(group).alias("grp"), F.concat(F.lit("item_"), F.col("id")).alias("item")
    )


def test_hll_register_table_is_bounded(spark):
    regs = hll_registers(_items(spark, 20_000), ["grp"], "item")
    assert regs.count() <= 256  # the whole sketch, at any cardinality
    assert regs.filter((F.col("bucket") < 0) | (F.col("bucket") > 255)).count() == 0
    assert regs.filter((F.col("r") < 1) | (F.col("r") > 63)).count() == 0


def test_hll_merge_of_partials_equals_whole_and_is_idempotent(spark):
    """Registers over A∪B == max-merge of registers(A), registers(B);
    merging the same partial twice changes nothing (the at-least-once
    safety property)."""
    a = _items(spark, 3_000)
    b = spark.range(2_000, 6_000).select(
        F.lit("g").alias("grp"), F.concat(F.lit("item_"), F.col("id")).alias("item")
    )
    whole = hll_registers(a.union(b), ["grp"], "item")
    ra, rb = hll_registers(a, ["grp"], "item"), hll_registers(b, ["grp"], "item")
    merged = (
        ra.union(rb).union(rb)  # rb twice: idempotence under replay
        .groupBy("grp", "bucket")
        .agg(F.max("r").alias("r"))
    )
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_estimate_accuracy_raw_branch(spark):
    """5000 distinct items: m=256 gives ~6.5% standard error; accept
    3 sigma."""
    est = hll_estimate(
        hll_registers(_items(spark, 5_000), ["grp"], "item"), ["grp"]
    ).first()["est_distinct"]
    assert abs(est - 5_000) / 5_000 < 0.20, est


def test_hll_estimate_linear_counting_branch(spark):
    """30 distinct items: well under 2.5m with empty registers, so the
    linear-counting branch fires — near-exact at this range."""
    est = hll_estimate(
        hll_registers(_items(spark, 30), ["grp"], "item"), ["grp"]
    ).first()["est_distinct"]
    assert abs(est - 30) / 30 < 0.15, est


def test_hll_estimate_deterministic_across_partitionings(spark):
    df = _items(spark, 4_000)
    e1 = hll_estimate(hll_registers(df, ["grp"], "item"), ["grp"]).first()["est_distinct"]
    e2 = hll_estimate(
        hll_registers(df.repartition(17), ["grp"], "item"), ["grp"]
    ).first()["est_distinct"]
    assert e1 == e2  # bit-identical, not approximately equal


def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    df = spark.range(500).select(
        (F.col("id") % 20).alias("k"),  # 20 keys, 25 rows each
    )
    truth = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    table = cms_build(df, "k")
    est = cms_lookup(truth, table, "k")
    j = truth.join(est, "k")
    assert j.filter(F.col("cms_est") < F.col("n")).count() == 0  # overestimate only
    # d=4 rows of w=64 cells vs 20 keys: at least one collision-free
    # row per key is overwhelmingly likely -> min is exact
    assert j.filter(F.col("cms_est") != F.col("n")).count() == 0


def test_hist_bin_table_is_bounded_and_merges_by_sum(spark):
    """Bin table ≤HIST_BINS rows per group at any input size, and
    bins(A∪B) == per-(group,bin) SUM of bins(A)+bins(B) — the same
    mergeable algebra the CMS cells use, so the streaming deposit
    path is a plain keyed MERGE."""
    a = spark.range(5_000).select(F.lit("g").alias("grp"), (F.col("id") % 997).cast("double").alias("v"))
    b = spark.range(5_000, 9_000).select(F.lit("g").alias("grp"), (F.col("id") % 997).cast("double").alias("v"))
    whole = hist_bins(a.union(b), ["grp"], "v", 0.0, 997.0)
    assert whole.count() <= HIST_BINS
    merged = (
        hist_bins(a, ["grp"], "v", 0.0, 997.0)
        .union(hist_bins(b, ["grp"], "v", 0.0, 997.0))
        .groupBy("grp", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hist_quantile_accuracy_uniform(spark):
    """Uniform 0..9999: equi-width bins are exact up to in-bin
    interpolation error, i.e. within one bin width (10000/128 ≈ 78)."""
    df = spark.range(10_000).select(
        F.lit("g").alias("grp"), F.col("id").cast("double").alias("v")
    )
    bins = hist_bins(df, ["grp"], "v", 0.0, 10_000.0)
    row = hist_quantiles(bins, ["grp"], 0.0, 10_000.0, (0.5, 0.95)).first()
    assert abs(row["est_p50"] - 5_000) <= 10_000 / HIST_BINS, row
    assert abs(row["est_p95"] - 9_500) <= 10_000 / HIST_BINS, row


def test_hist_quantile_deterministic_across_partitionings(spark):
    df = spark.range(7_321).select(
        F.lit("g").alias("grp"), ((F.col("id") * 37) % 1000).cast("double").alias("v")
    )
    q1 = hist_quantiles(hist_bins(df, ["grp"], "v", 0.0, 1000.0), ["grp"], 0.0, 1000.0).first()
    q2 = hist_quantiles(
        hist_bins(df.repartition(13), ["grp"], "v", 0.0, 1000.0), ["grp"], 0.0, 1000.0
    ).first()
    assert q1 == q2  # bit-identical: integer cnt/cum, scalar double math


def test_cms_prune_never_drops_a_true_heavy_hitter(spark):
    """The heavy-hitters contract: because CMS never underestimates,
    filtering candidates by the ESTIMATE keeps every key whose TRUE
    count clears the threshold — the prune is correctness-transparent
    and only ever lets extra candidates through to the exact verify.
    Adversarial shape: one hot key among many colliding cold keys."""
    df = spark.range(2_000).select(
        F.when(F.col("id") < 500, F.lit(9999)).otherwise(F.col("id")).alias("k")
    )
    truth = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    table = cms_build(df, "k")
    est = cms_lookup(truth, table, "k")
    j = truth.join(est, "k")
    threshold = 100  # true heavy hitter: k=9999 with 500 rows
    dropped = j.filter(
        (F.col("n") >= threshold) & (F.col("cms_est") < threshold)
    ).count()
    assert dropped == 0


def test_cms_probe_rows_matches_cms_lookup_and_raw_build_matches_weighted(spark):
    """The shuffle-free pair (cms_build_raw + cms_probe_rows) computes
    the SAME cells and the SAME per-key estimates as the key-shuffling
    pair (cms_build + cms_lookup) — the scale path is a plan change,
    not an algorithm change."""
    df = spark.range(800).select((F.col("id") % 23).alias("k"))
    t_raw, t_agg = cms_build_raw(df, "k"), cms_build(df, "k")
    assert t_raw.exceptAll(t_agg).count() == 0
    assert t_agg.exceptAll(t_raw).count() == 0
    keys = df.select("k").distinct()
    via_lookup = cms_lookup(keys, t_raw, "k")
    via_probe = cms_probe_rows(keys, "k", t_raw)
    assert via_lookup.exceptAll(via_probe).count() == 0
    assert via_probe.exceptAll(via_lookup).count() == 0


def test_cms_merge_of_partials_equals_whole(spark):
    """cms(A∪B) == cellwise SUM of cms(A) + cms(B) — the mergeable-
    sketch contract for the streaming deposit path."""
    a = spark.range(300).select((F.col("id") % 7).alias("k"))
    b = spark.range(300, 900).select((F.col("id") % 11).alias("k"))
    whole = cms_build(a.union(b), "k")
    merged = (
        cms_build(a, "k").union(cms_build(b, "k"))
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0
