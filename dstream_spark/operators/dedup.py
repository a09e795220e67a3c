"""(conv_id, turn_idx) dual-key deduplication — the reference's D1.

The reference prevents cross- and within-transaction duplicates with an
(LSN, seqval) pair (docs/capability-inventory.md:133). Here the dual
key is (conv_id, turn_idx); the engine provides:

- batch dedup (``dedup_keys``) — used in the foreachBatch MERGE sink
  and the oracle-checked batch queries;
- streaming dedup (``dedup_stream``) — dropDuplicatesWithinWatermark,
  state bounded by the watermark (state size ∝ in-flight keys, not
  history — the property that survives a 10^12-turn stream);
- a stateful per-conversation cursor (``cursor_dedup_stream``) in
  operators/cdc.py reproducing dstream's checkpoint-cursor semantics
  exactly (emit only unseen turn_idx, in order).

Scale note: both paths shuffle once on the key. dropDuplicates uses a
hash aggregate with partial (map-side) dedup before the exchange, so
duplicate-heavy streams shrink before they shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DUAL_KEY = ("conv_id", "turn_idx")


def dedup_keys(df: DataFrame, keys: Sequence[str] = DUAL_KEY) -> DataFrame:
    """Keep exactly one row per key (any duplicate is byte-identical in
    the CDC replay scenario, so dropDuplicates is sufficient and cheaper
    than a row_number sort)."""
    return df.dropDuplicates(list(keys))


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str] = DUAL_KEY,
    order_col: str = "_commit_version",
) -> DataFrame:
    """Keep the newest version per key (insert/update capture — the
    OperationType=update apply path). Deterministic: ties on
    ``order_col`` are broken by the full key ordering upstream, so
    callers must pass a monotonic version column (the LSN analog)."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_stream(
    df: DataFrame,
    keys: Sequence[str] = DUAL_KEY,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup with bounded state: a key's dedup record is
    dropped from the state store once the watermark passes it, which is
    what makes this viable on an unbounded stream."""
    from dstream_spark.operators.event_time import restore_ntz, with_event_time

    out = (
        with_event_time(df, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )
    return restore_ntz(out, (ts_col,))
