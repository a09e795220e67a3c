"""The driver-facing contract: entry() smoke + a DuckDB-oracle spot
check of representative queries (the full sweep runs via
tools/check_oracle.py; the driver repeats it at sf0.01)."""

from __future__ import annotations

import os

import duckdb
import pytest

from tools.check_oracle import hash_rows

SPOT = [
    "relay_identity",
    "cdc_dedup",
    "session_windows",
    "tumbling_counts",
    "tool_correlation",
    "skew_salted_agg",
    "docs_fingerprint",
    "emb_cosine_topk",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    from dstream_spark.queries import ALL_TABLES

    con = duckdb.connect()
    for t in ALL_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def test_entry_smoke(spark):
    import __spark_entry__ as ep

    df = ep.entry(spark)
    assert df.count() > 0


def test_queries_and_oracles_align():
    import __spark_entry__ as ep

    qs, os_ = ep.queries(), ep.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30

@pytest.mark.parametrize("name", SPOT)
def test_oracle_spot(spark, sf_dir, duck, name):
    from dstream_spark.queries import QUERIES

    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = duck.sql(q.oracle)
    d_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(res.columns)
    assert len(s_rows) == len(d_rows)
    assert hash_rows(sdf.columns, s_rows) == hash_rows(list(res.columns), d_rows)


def test_pyds_partitions_mirror_commit_files(spark, sf_dir):
    """The Python DataSource plans one InputPartition per commit file
    — the feed's commit structure IS the scan parallelism (a 10^5-file
    feed fans out to 10^5 tasks, no driver-side rows)."""
    from dstream_spark.sources.pyds import FeedDataSource
    from dstream_spark.streaming_queries import _scratch, _write_feed

    feed = _scratch("pyds_parts")
    _write_feed(spark, sf_dir, feed, n_batches=5)
    spark.dataSource.register(FeedDataSource)
    df = spark.read.format("dstream_feed").option("path", feed).load()
    assert df.rdd.getNumPartitions() == 5
    # per-partition commit versions are homogeneous: partition == file
    vers = df.select("_commit_version").distinct().collect()
    assert {r._commit_version for r in vers} == {0, 1, 2, 3, 4}
