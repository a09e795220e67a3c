"""Streaming CEP (complex-event-processing) pattern detection.

The batch form (queries_ext.q_cep_user_agent_tool) is a lead()-window
scan; this is the STREAMING form of the same pattern — user → agent →
tool-call in three consecutive turns within a time bound — detected
across micro-batch boundaries with applyInPandasWithState. Per
conversation the state holds the last TWO turns plus the cursor
high-water mark, so:

- a triple split across micro-batches is still detected (the pending
  turns bridge the boundary);
- each match is emitted exactly once (a triple fires when its THIRD
  turn arrives, and replayed turns are rejected by the cursor —
  dstream's LSN-regression rule, docs/plugins/mssql-ingester.md:84-87);
- state is O(1) per conversation: two turns + one int, regardless of
  stream length — the property that holds at 10^12 turns.

The reference's polling loop has no pattern language at all; this is
the engine's CEP surface named by the north rule, oracle-checked
against the batch lead()-window SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

CEP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("user_turn", T.IntegerType()),
        T.StructField("tool", T.StringType()),
        T.StructField("span_s", T.LongType()),
    ]
)

# last two turns (a = older, b = latest) + span bound; idx_b doubles as
# the cursor high-water mark
_CEP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("role_a", T.StringType()),
        T.StructField("tool_a", T.StringType()),
        T.StructField("t_a", T.LongType()),
        T.StructField("idx_a", T.IntegerType()),
        T.StructField("role_b", T.StringType()),
        T.StructField("tool_b", T.StringType()),
        T.StructField("t_b", T.LongType()),
        T.StructField("idx_b", T.IntegerType()),
    ]
)

PATTERN_SPAN_S = 64800  # whole triple inside 18 h (fixture cadence is hours)


def _cep_fn(key, pdfs, state):
    import pandas as pd

    conv_id = key[0]
    if state.exists:
        role_a, tool_a, t_a, idx_a, role_b, tool_b, t_b, idx_b = state.get
    else:
        role_a = tool_a = t_a = idx_a = role_b = tool_b = t_b = idx_b = None

    batch = pd.concat(list(pdfs), ignore_index=True)
    if idx_b is not None:
        batch = batch[batch["turn_idx"] > idx_b]  # cursor: reject replays
    if not len(batch):
        return
    batch = batch.sort_values("turn_idx").drop_duplicates(subset=["turn_idx"], keep="first")

    roles = batch["role"].tolist()
    tools = batch["tool"].tolist()
    ts = (batch["ts"].astype("int64") // 10**9).tolist()
    idxs = batch["turn_idx"].astype("int64").tolist()
    # bridge the micro-batch boundary with the two pending turns
    for r, tl, t, i in ((role_b, tool_b, t_b, idx_b), (role_a, tool_a, t_a, idx_a)):
        if i is not None:
            roles.insert(0, r)
            tools.insert(0, tl)
            ts.insert(0, t)
            idxs.insert(0, i)

    n_pending = len(roles) - len(batch)
    out = []
    # a triple fires when its third element arrives in THIS batch
    for k in range(max(2, n_pending), len(roles)):
        if (
            roles[k - 2] == "user"
            and roles[k - 1] == "agent"
            and isinstance(tools[k], str)  # None arrives as None OR NaN
            and ts[k] - ts[k - 2] <= PATTERN_SPAN_S
        ):
            out.append((conv_id, int(idxs[k - 2]), tools[k], int(ts[k] - ts[k - 2])))

    last, prev = len(roles) - 1, len(roles) - 2
    state.update(
        (
            roles[prev] if prev >= 0 else None,
            tools[prev] if prev >= 0 else None,
            int(ts[prev]) if prev >= 0 else None,
            int(idxs[prev]) if prev >= 0 else None,
            roles[last],
            tools[last],
            int(ts[last]),
            int(idxs[last]),
        )
    )
    if out:
        yield pd.DataFrame(out, columns=[f.name for f in CEP_OUT_SCHEMA.fields])


def cep_pattern_stream(df: DataFrame) -> DataFrame:
    """user → agent → tool-call triples over a streaming transcript
    feed (in turn order per conversation, as the changefeed delivers
    them); each match emitted exactly once, across batch boundaries."""
    return (
        df.select("conv_id", "turn_idx", "role", "tool", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _cep_fn,
            outputStructType=CEP_OUT_SCHEMA,
            stateStructType=_CEP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
