"""Storage-layout scale patterns: bucketed co-located joins (the
shuffle-free fact-fact join at 100 TB) and partition-pruned scans.
These are layout contracts, not operators — asserted on the physical
plan, with results checked against the plain layout."""

from __future__ import annotations

import contextlib
import io


def _final_plan(df) -> str:
    df.collect()  # let AQE finalize
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path, sf_dir):
    """Both fact tables bucketed+sorted on the join key: the sort-merge
    join consumes bucket files directly — NO Exchange on either side.
    This is the layout that makes the 100-TB lineitem⋈orders join a
    map-side merge instead of a full shuffle of both tables."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        li.write.format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(tmp_path / "li_b")).mode("overwrite").saveAsTable("li_b")
    )
    (
        o.write.format("parquet").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(tmp_path / "o_b")).mode("overwrite").saveAsTable("o_b")
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        j = spark.table("li_b").join(
            spark.table("o_b"), spark.table("li_b").l_orderkey == spark.table("o_b").o_orderkey
        ).select("l_orderkey", "o_orderdate", "l_quantity")
        plan = _final_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "Bucketed: true" in plan
        # same answer as the unbucketed join
        plain = li.join(o, li.l_orderkey == o.o_orderkey)
        assert j.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_partitioned_write_prunes_scan(spark, tmp_path, sf_dir):
    """Events laid out by day partition: a day-filtered read must list
    only that day's directory (PartitionFilters on the scan, row count
    == the unpartitioned filter)."""
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    part_dir = str(tmp_path / "events_by_day")
    e.withColumn("day", F.to_date("ts")).write.mode("overwrite").partitionBy("day").parquet(
        part_dir
    )
    some_day = e.select(F.to_date("ts").alias("d")).first().d
    filtered = spark.read.parquet(part_dir).filter(F.col("day") == F.lit(some_day))
    plan = _final_plan(filtered)
    assert "PartitionFilters" in plan and "isnotnull(day" in plan
    assert filtered.count() == e.filter(F.to_date("ts") == F.lit(some_day)).count()
