"""SparkSession factory with scale-appropriate defaults.

Every knob here is chosen for the 100 TB target, then scaled down for
local[N] testing:

- AQE on: runtime coalescing + skew-join splitting replaces hand-tuned
  shuffle partition counts at real scale.
- Arrow on: all Python crossings are vectorized (the reference's
  "providers in any language" surface maps to pandas UDFs — SURVEY.md
  §2.6); per-row Python UDFs are banned (tests enforce it).
- Session timezone pinned to UTC so event-time windows are stable and
  DuckDB-oracle comparisons are exact.
- shuffle.partitions defaults to 2× local cores; on a real cluster this
  is overridden by AQE's coalescing from
  spark.sql.adaptive.coalescePartitions.initialPartitionNum.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dstream_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for this engine.

    ``cores`` controls local parallelism (``local[cores]``); ``None``
    uses $SPARK_GRAFT_CPUS or all cores. On a real cluster the master
    is supplied by spark-submit and this just applies engine conf.
    """
    if cores is None:
        cores_s = os.environ.get("SPARK_GRAFT_CPUS", "*")
    else:
        cores_s = str(cores)
    if shuffle_partitions is None:
        n = os.cpu_count() or 8 if cores_s == "*" else int(cores_s)
        shuffle_partitions = max(8, 2 * n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores_s}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
        # RocksDB state store + changelog checkpointing: state lives
        # off-heap (no JVM version-map bloat / GC stalls — see
        # BENCH/NOTES.md) and commits append a changelog instead of
        # snapshotting; the right default for large state at scale
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
        # keep micro-batch planning cheap in local tests
        .config("spark.sql.streaming.metricsEnabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _prewarm_python_workers(spark)
    return spark


def _prewarm_python_workers(spark: SparkSession) -> None:
    """Spawn the Python worker pool once, at session creation.

    The engine's vectorized kernels (minhash/simhash/similarity) are
    pandas UDFs; the FIRST Arrow job in a session pays daemon+worker
    fork plus pandas/numpy/hashlib imports in every worker — measured
    ~2-4 s at local[32], all of it landing on whichever query happens
    to run first. Heavyweight init belongs at session init, once
    (guide §4.5), not inside an arbitrary query. One tiny job (4 rows
    per core, workers are reused afterwards —
    spark.python.worker.reuse default) moves that cost out of every
    query path; it reads no tables and computes nothing any query
    consumes. No-op when Python workers are already warm (replays a
    128-row identity through the pool)."""
    if getattr(spark, "_dstream_prewarmed", False):
        return
    try:
        import pandas as pd  # noqa: F401
        from pyspark.sql import functions as F

        @F.pandas_udf("double")
        def _warm(s):  # imports below mirror the kernels' worker-side deps
            import hashlib  # noqa: F401

            import numpy as np  # noqa: F401

            return s * 1.0

        n = spark.sparkContext.defaultParallelism
        spark.range(4 * n, numPartitions=n).select(
            _warm(F.col("id").cast("double"))
        ).write.format("noop").mode("overwrite").save()
    except Exception:
        pass  # prewarm is best-effort; never block session creation
    spark._dstream_prewarmed = True
