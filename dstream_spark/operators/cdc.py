"""Change-event semantics: insert/update apply, per-conversation
cursor, lineage summaries — dstream's core contracts (SURVEY.md §2.3).

- ``apply_changes``: fold a change feed (insert/update rows with a
  monotonic _commit_version ← LSN analog) into current state: newest
  version per (conv_id, turn_idx) wins, deletes removed. This is the
  reference's OperationType handling
  (docs/capability-inventory.md:166-167) as a relational operator.

- ``lineage_summary``: per-conversation high-water mark — the
  reference's ``cdc_offsets`` table shape (table_name→conv_id,
  last_lsn/last_seq→max turn_idx, docs/capability-inventory.md:179-183).

- ``cursor_dedup_stream``: the per-table cursor loop
  (docs/plugins/mssql-ingester.md:64-73) as a stateful streaming
  operator: state per conv_id = max turn_idx seen; each micro-batch
  emits only unseen turns, in turn order. applyInPandasWithState =
  grouped, Arrow-batched, state-store-backed — the idiomatic Spark
  form of "one goroutine per table with a persisted (LSN, Seq) cursor".
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dstream_spark.fixtures.transcripts import TRANSCRIPT_SCHEMA


def apply_changes(
    changes: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    version_col: str = "_commit_version",
    change_type_col: str = "_change_type",
) -> DataFrame:
    """Materialize current state from a change feed: latest version per
    key; rows whose latest change is a delete are dropped. Tolerates
    feeds without a change-type column (insert/update only)."""
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    out = changes.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    if change_type_col in changes.columns:
        out = out.filter(F.col(change_type_col) != F.lit("delete"))
    return out.drop("_rn")


def lineage_summary(df: DataFrame, key: str = "conv_id") -> DataFrame:
    """Per-conversation cursor snapshot (cdc_offsets analog)."""
    return df.groupBy(key).agg(
        F.max("turn_idx").alias("max_turn_idx"),
        F.count(F.lit(1)).alias("n_turns"),
        F.max("ts").alias("updated_at"),
    )


# ---------------------------------------------------------------- #
# Stateful cursor operator (streaming)                               #
# ---------------------------------------------------------------- #

_CURSOR_STATE_SCHEMA = T.StructType([T.StructField("max_turn_idx", T.IntegerType())])
# TTL form additionally tracks the cursor's event-time high-water mark
# so the eviction deadline is data-derived, not wall-clock
_CURSOR_STATE_SCHEMA_TTL = T.StructType(
    [
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("max_ts_s", T.LongType()),
    ]
)


def make_cursor_fn(ttl_s: int | None = None):
    """Build the cursor state body. ``ttl_s`` (requires
    EventTimeTimeout + a watermark): a conversation's cursor is
    evicted once the watermark passes its newest turn's event time +
    ttl_s. Safe under the same contract dropDuplicatesWithinWatermark
    relies on — any replay of an old turn carries an event time below
    the watermark and is filtered before the operator ever sees it, so
    a dropped cursor can no longer be regressed. State is O(tables ×
    ACTIVE conversations), the reference's cursor bound
    (docs/capability-inventory.md:179-183), instead of O(all
    conversations ever seen)."""

    def cursor_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Emit only turns beyond the conversation's cursor, in order,
        and advance the cursor — exactly-once per turn_idx within the
        stream.

        Mirrors the ingester loop docs/plugins/mssql-ingester.md:64-73:
        load cursor → filter (seq > cursor) → emit ordered → advance.
        The 'publish-then-advance' property is supplied by Spark's
        epoch commit: state updates and sink output commit atomically
        per batch."""
        if getattr(state, "hasTimedOut", False):
            state.remove()  # idle conversation: watermark bounds any replay
            return
        if not state.exists:
            max_seen, max_ts_s = -1, 0
        elif ttl_s is None:
            (max_seen,), max_ts_s = state.get, 0
        else:
            max_seen, max_ts_s = state.get
        cols = [f.name for f in TRANSCRIPT_SCHEMA.fields]
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch[batch["turn_idx"] > max_seen]
        if len(batch):
            batch = batch.sort_values(["turn_idx"]).drop_duplicates(
                subset=["turn_idx"], keep="first"
            )
            if ttl_s is None:
                state.update((int(batch["turn_idx"].max()),))
            else:
                # ts is NTZ wall time denoting UTC: int64 ns // 1e9 is
                # the true instant, independent of session timezone
                max_ts_s = max(
                    int(max_ts_s), int(batch["ts"].astype("int64").max()) // 10**9
                )
                state.update((int(batch["turn_idx"].max()), max_ts_s))
            yield batch[cols]
        if ttl_s is not None and state.exists:
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(max_ts_s * 1000 + ttl_s * 1000, wm_ms + 1))

    return cursor_fn


# backward-compatible name: the NoTimeout body
_cursor_fn = make_cursor_fn(None)


def cursor_dedup_stream(df: DataFrame, ttl_s: int | None = None,
                        wm_delay_s: int = 1800) -> DataFrame:
    """Per-conv_id monotonic cursor dedup over a streaming transcript
    feed. Input must carry the transcript columns; output is the same
    schema, each (conv_id, turn_idx) emitted at most once and only in
    increasing turn_idx order.

    Note the semantic difference vs dropDuplicatesWithinWatermark: the
    cursor REJECTS regressions (a replayed turn below the high-water
    mark), matching dstream's LSN cursor, not just duplicate keys.

    ``ttl_s`` bounds state to ACTIVE conversations: the cursor is
    evicted once the event-time watermark (``wm_delay_s`` behind max
    event time) passes the conversation's newest turn + ttl_s — see
    make_cursor_fn for why that loses no replay protection."""
    cols = [f.name for f in TRANSCRIPT_SCHEMA.fields]
    if ttl_s is None:
        return (
            df.select(*cols)
            .groupBy("conv_id")
            .applyInPandasWithState(
                _cursor_fn,
                outputStructType=TRANSCRIPT_SCHEMA,
                stateStructType=_CURSOR_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
    from dstream_spark.operators.event_time import to_instant

    evt = (
        df.select(*cols)
        .withColumn("_evt", to_instant("ts"))
        .withWatermark("_evt", f"{wm_delay_s} seconds")
    )
    return evt.groupBy("conv_id").applyInPandasWithState(
        make_cursor_fn(ttl_s),
        outputStructType=TRANSCRIPT_SCHEMA,
        stateStructType=_CURSOR_STATE_SCHEMA_TTL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
