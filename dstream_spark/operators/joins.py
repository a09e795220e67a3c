"""Stream-stream / interval joins: correlate agent turns with tool
invocations (the north rule's join requirement; the reference composes
tasks through a durable queue instead — docs/design/design.md:87-101).

``interval_join`` is one function for both modes:
- batch: an equi-join on conv_id + a time-range predicate. Catalyst
  plans the equi-key as a shuffled hash/sort-merge join (or broadcast
  if one side is small) and applies the range as a post-filter.
- streaming: both sides watermarked; the range predicate bounds how
  long each side is retained in the state store — without it, stream-
  stream join state grows forever. This is the Spark-native form of
  the reference's bounded in-flight buffering (pipe backpressure,
  docs/performance-baseline.md:41).

Skew: the equi-key is conv_id; a hot conversation skews the join. AQE
skew-join splitting handles the batch path (enabled in session.py);
the streaming path bounds per-key state by the time interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    lower_s: int = 600,
    upper_s: int = 600,
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``left`` to rows of ``right`` with the same ``key``
    whose event times are within [-lower_s, +upper_s] seconds.

    Right-side columns are suffixed ``_r``. Works on batch and
    streaming DataFrames; streaming requires watermarks on both sides
    (applied here) so state is evicted once the interval has passed.
    """
    from dstream_spark.operators.event_time import restore_ntz, with_event_time

    streaming = left.isStreaming or right.isStreaming
    if left.isStreaming:
        left = with_event_time(left, ts_col).withWatermark(ts_col, watermark)
    if right.isStreaming:
        right = with_event_time(right, ts_col).withWatermark(ts_col, watermark)
    r = right.select([F.col(c).alias(f"{c}_r") for c in right.columns])
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (F.col(f"{ts_col}_r") >= F.col(ts_col) - F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (F.col(f"{ts_col}_r") <= F.col(ts_col) + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    out = left.join(r, cond, how)
    return restore_ntz(out, (ts_col, f"{ts_col}_r")) if streaming else out


def interval_join_salted(
    left: DataFrame,
    right: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    lower_s: int = 600,
    upper_s: int = 600,
    buckets: int = 8,
) -> DataFrame:
    """Skew-bounded batch interval join, identical output to
    ``interval_join``. A hot key (one conversation with millions of
    turns) makes the per-key pair count quadratic AND lands the whole
    key on one task; AQE skew-split only re-chunks the left side. This
    variant salts the LEFT rows into ``buckets`` sub-keys and
    replicates the RIGHT side once per bucket, so a hot key's work is
    spread across ``buckets`` tasks — at the cost of a buckets× right
    shuffle. Use when right ≪ left (here: tool turns ≪ agent turns);
    pick buckets ≈ the observed skew factor.

    The salt hashes EVERY left column, not just the timestamp: a bulk
    backfill that stamps one ts on millions of a hot key's rows would
    otherwise put the whole key in one bucket — defeating the guard in
    exactly the adversarial case it exists for."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(buckets)).cast("int")
    l = left.withColumn("_salt", salt)
    r = right.select(
        [F.col(c).alias(f"{c}_r") for c in right.columns]
    ).withColumn("_salt_r", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (F.col("_salt") == F.col("_salt_r"))
        & (F.col(f"{ts_col}_r") >= F.col(ts_col) - F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (F.col(f"{ts_col}_r") <= F.col(ts_col) + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    return l.join(r, cond).drop("_salt", "_salt_r")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    max_lookback_s: int = 3600,
    left_id: str = "turn_idx",
    right_tiebreak: str = "turn_idx",
) -> DataFrame:
    """Batch as-of join: for each left row, the latest right row at or
    before it (within a bounded lookback so the join stays an interval
    equi-join, not a cross product). Composition of existing ops per
    the brief: interval join → row_number pick — no custom physical
    operator needed.

    The pick window partitions on the LEFT ROW'S identity (key +
    ``left_id``), not on (key, ts): two distinct left rows sharing a
    timestamp each keep their own match. Ties on the right timestamp
    break deterministically on ``right_tiebreak`` (descending) so the
    output is stable under any partitioning.
    """
    from pyspark.sql import Window

    j = interval_join(left, right, key, ts_col, lower_s=max_lookback_s, upper_s=0)
    w = Window.partitionBy(key, left_id).orderBy(
        F.col(f"{ts_col}_r").desc(), F.col(f"{right_tiebreak}_r").desc()
    )
    return j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
