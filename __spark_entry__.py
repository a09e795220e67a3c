"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship pipeline on sf0.001 (smoke, rows > 0)
queries()      — every implemented operator from SURVEY.md §2 + the
                 training-data-pipeline ops, ALL with DuckDB oracles,
                 incl. THIRTY-EIGHT real Structured Streaming runs
                 (tumbling/sliding aggs, exactly-once sink under
                 replay incl. the full insert/update/DELETE envelope
                 replayed at its ORIGINAL epoch id, stateful cursor,
                 session windows, stream-stream inner + LEFT OUTER
                 interval joins, watermark dedup, THREE parameterized
                 CEP patterns incl. non-consecutive skip-till-next-
                 match, update-mode windowed agg → keyed exactly-once
                 MERGE, stream-static enrichment, two-destination
                 fanout, and two MULTI-stateful chains: dedup →
                 session windows and hourly → daily window rollup)
                 plus the micro-batch-fed incremental LSH dedup
                 (inc_dedup_log: growing exactly-once band index under
                 an original-epoch replay), mergeable-sketch deposits
                 (HLL max-merge global + per-hour, histogram sum-merge
                 global + per-hour under original-epoch crash-replay),
                 driver-gated contract runs of checkpoint RESUME,
                 the multi-table Monitor, and adaptive batch sizing,
                 a stream-stream AS-OF join (interval join chained
                 into an event-time-windowed struct-max pick — two
                 stateful operators, one plan), and an incremental
                 SCD-2 dimension build (retroactive closes as
                 versioned upserts through the exactly-once sink) —
                 all checked against batch SQL. Batch families: TPC-H
                 (18 of 22), the dedup suite (exact/paragraph/
                 rolling-window ExactSubstr/MinHash-LSH/SimHash/
                 n-gram-Jaccard/embedding), the ANN suite (brute,
                 trained + multi-probe IVF, PQ, composed IVF-PQ),
                 graph (connected components, fixed-point PageRank,
                 triangle counting), corpus preparation (split/pack/
                 decontaminate incl. Bloom-pruned, quota + weighted
                 sampling, CCNet perplexity bucketing on an exact
                 fixed-point log2 — zero transcendentals), sketches
                 (HLL/CMS/histogram, global + windowed), SCD-2
                 build/snapshot/temporal joins, and the full window/
                 agg/join/set-op/UDF surface,
                 a positional inverted index with a cross-
                 algorithm phrase-query gate (index == scan), and the
                 Spark 4 extension surfaces: Python UDTF, Python
                 DataSource (partition-per-commit-file plugin scan
                 AND a streaming reader with checkpointed offsets),
                 and VARIANT schema-on-read over the CDC envelope,
                 plus snapshot reads on the exactly-once sink:
                 time travel (read-as-of) and incremental scans
                 with oracle-checked closed-form epoch content
oracle_sql()   — matching DuckDB SQL per query
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dstream_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the CDC pipeline's batch spine on sf0.001 —
    transcripts (change feed) → dual-key dedup → 30-min-gap session
    windows per conversation."""
    from pyspark.sql import functions as F

    from dstream_spark.fixtures.transcripts import transcripts_from_events
    from dstream_spark.operators.dedup import dedup_keys
    from dstream_spark.operators.windows import sessionize_batch

    t = transcripts_from_events(spark, "/root/testdata/sf0.001")
    return sessionize_batch(dedup_keys(t), gap_seconds=1800).orderBy(
        F.col("conv_id"), F.col("session_idx")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
