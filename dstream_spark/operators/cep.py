"""Streaming CEP (complex-event-processing) pattern detection,
parameterized over the pattern.

A pattern is a fixed-length sequence of per-turn predicates
(``Step``), matched against CONSECUTIVE turns of one conversation
within a time bound. The batch form of each pattern is a lead()-window
scan (queries_ext.q_cep_user_agent_tool / q_cep_tool_retry); this is
the STREAMING form — the same match semantics detected across
micro-batch boundaries with applyInPandasWithState. Per conversation
the state holds the last k-1 turns plus the cursor high-water mark
(k = pattern length), so:

- a match split across micro-batches is still detected (the pending
  turns bridge the boundary);
- each match is emitted exactly once (a k-tuple fires when its LAST
  turn arrives, and replayed turns are rejected by the cursor —
  dstream's LSN-regression rule, docs/plugins/mssql-ingester.md:84-87);
- state is O(k) per conversation — constant for a fixed pattern,
  regardless of stream length: the property that holds at 10^12 turns.

The reference's polling loop has no pattern language at all; the
nearest analog is provider-composable tasks (docs/design/design.md:
87-101) — a config-declared sequence the engine executes. Each shipped
pattern is oracle-checked against its batch lead()-window SQL.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

CEP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("first_turn", T.IntegerType()),
        T.StructField("tool", T.StringType()),
        T.StructField("span_s", T.LongType()),
    ]
)

# state = one JSON document: {"c": cursor high-water mark,
# "p": [[role, tool, epoch_s, turn_idx] × (k-1) pending turns]}.
# A single string field keeps the schema independent of pattern
# length, so every pattern shares one state layout.
CEP_STATE_SCHEMA = T.StructType([T.StructField("js", T.StringType())])

PATTERN_SPAN_S = 64800  # whole sequence inside 18 h (fixture cadence is hours)


@dataclass(frozen=True)
class Step:
    """One turn-level predicate of a CEP pattern: required role (None =
    any), whether a tool call must be present, and optionally a
    CROSS-STEP constraint — the tool must equal the tool captured at
    an earlier step (``tool_equals_step``, 0-based index into the
    pattern), e.g. 'the SAME tool retried'."""

    role: str | None = None
    tool_required: bool = False
    tool_equals_step: int | None = None
    # greedy zero-or-one step (regex '?' / MATCH_RECOGNIZE B?):
    # only make_optional_fn interprets this flag
    optional: bool = False
    # ALTERNATION (regex '(x|y)' / MATCH_RECOGNIZE pattern variables
    # sharing a position): role must be one of these. Orthogonal to
    # ``role`` (set one or the other); every pattern form gets the
    # semantics for free because they all test via matches().
    role_in: tuple[str, ...] | None = None

    def matches(self, role, tool, window_tools=None) -> bool:
        if self.role is not None and role != self.role:
            return False
        if self.role_in is not None and role not in self.role_in:
            return False
        if self.tool_required and not isinstance(tool, str):
            return False  # null arrives as None OR NaN
        if self.tool_equals_step is not None:
            # NULL-safe, matching the batch lead()-window twin's
            # `tool2 = tool` predicate: SQL equality over NULL is never
            # true, so two NULL tools must NOT count as "the same tool"
            other = None if window_tools is None else window_tools[self.tool_equals_step]
            if not (isinstance(tool, str) and isinstance(other, str) and tool == other):
                return False
        return True


# the shipped patterns (each has a batch lead()-window twin + oracle)
USER_AGENT_TOOL = (
    Step(role="user"),
    Step(role="agent"),
    Step(tool_required=True),
)  # "agent acted on a user request with a tool"
USER_OPT_AGENT_TOOL = (
    Step(role="user"),
    Step(role="agent", optional=True),
    Step(tool_required=True),
)  # "user -> (agent)? -> tool call": greedy zero-or-one middle step
TOOL_AGENT_TOOL = (
    Step(role="tool", tool_required=True),
    Step(role="agent"),
    Step(role="tool", tool_required=True),
)  # "tool error -> agent intervention -> tool retry"
TOOL_RETRY_SAME = (
    Step(role="tool", tool_required=True),
    Step(role="agent"),
    Step(role="tool", tool_required=True, tool_equals_step=0),
)  # "... and the retry is the SAME tool" (cross-step constraint)
USER_ALT_TOOL = (
    Step(role="user"),
    Step(role_in=("agent", "tool")),
    Step(tool_required=True),
)  # "user -> (agent reply | tool turn) -> tool call": ALTERNATION step


def make_cep_fn(pattern: tuple[Step, ...], span_s: int = PATTERN_SPAN_S,
                ttl_s: int | None = None):
    """Build the applyInPandasWithState body for ``pattern``: emits
    (conv_id, first_turn, tool-of-last-step, span_s) once per match of
    len(pattern) CONSECUTIVE turns whose first→last gap <= span_s.

    ``ttl_s`` (requires EventTimeTimeout + a watermark on the stream):
    a conversation's state is EVICTED once the watermark passes its
    last pending turn + ttl_s. With ttl_s >= span_s this is exact — a
    window containing any pending turn would need its last step to
    arrive with event time beyond watermark > last_pending + span_s,
    so first→last would already exceed span_s and the pattern can
    never complete; the pending turns are dead state. Without it
    (NoTimeout), per-conversation state lives forever — the unbounded
    conv_id universe at 10^12 turns grows the state store
    monotonically (the r4 review's scale-killer)."""
    k = len(pattern)
    if k < 2:
        raise ValueError("a CEP pattern needs at least 2 steps")

    def cep_fn(key, pdfs, state):
        import pandas as pd

        if getattr(state, "hasTimedOut", False):
            # watermark passed last_pending + ttl: the pattern can
            # never complete from this state — drop it. The cursor is
            # safe to lose too: any replayed turn is older than the
            # watermark and is filtered before the operator.
            state.remove()
            return

        conv_id = key[0]
        cursor, pending = -1, []
        if state.exists:
            meta = json.loads(state.get[0])
            cursor, pending = meta["c"], meta["p"]

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch[batch["turn_idx"] > cursor]  # cursor: reject replays
        if not len(batch):
            return
        batch = batch.sort_values("turn_idx").drop_duplicates(
            subset=["turn_idx"], keep="first"
        )

        rows = list(pending) + [
            [r, (tl if isinstance(tl, str) else None), int(t), int(i)]
            for r, tl, t, i in zip(
                batch["role"],
                batch["tool"],
                batch["ts"].astype("int64") // 10**9,
                batch["turn_idx"].astype("int64"),
            )
        ]
        n_pending = len(pending)
        out = []
        # a match fires when its LAST step arrives in THIS batch
        for e in range(max(k - 1, n_pending), len(rows)):
            window = rows[e - k + 1 : e + 1]
            window_tools = [w[1] for w in window]
            if (
                all(
                    s.matches(w[0], w[1], window_tools)
                    for s, w in zip(pattern, window)
                )
                and window[-1][2] - window[0][2] <= span_s
            ):
                out.append(
                    (
                        conv_id,
                        int(window[0][3]),
                        window[-1][1],
                        int(window[-1][2] - window[0][2]),
                    )
                )

        state.update(
            (json.dumps({"c": int(rows[-1][3]), "p": rows[-(k - 1):]}),)
        )
        if ttl_s is not None:
            # timeout must stay ahead of the current watermark
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(int(rows[-1][2]) * 1000 + ttl_s * 1000, wm_ms + 1)
            )
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in CEP_OUT_SCHEMA.fields])

    return cep_fn


# backward-compatible name: the default-pattern body (unit tests drive
# it directly with a fake state)
_cep_fn = make_cep_fn(USER_AGENT_TOOL)


def make_optional_fn(pattern: tuple[Step, ...], span_s: int = PATTERN_SPAN_S,
                     ttl_s: int = PATTERN_SPAN_S):
    """OPTIONAL-step pattern (regex ``A B? C`` / MATCH_RECOGNIZE's
    zero-or-one quantifier), GREEDY: for each start turn, prefer the
    LONG form (all k steps over k consecutive turns); fall back to the
    SHORT form (the k-1 non-optional steps over k-1 consecutive turns)
    only when the long window fails. Exactly one ``Step.optional``
    must be set; both forms share the span_s first→last time bound.

    Greediness makes a short match non-final until the NEXT turn is
    seen — the long window ending one turn later shares its start and
    would supersede it — so a short candidate is DEFERRED one turn:

    - the next turn arrives → emit the long match if that window
      matches, else emit the deferred short (in-data resolution);
    - no next turn ever arrives → the event-time timeout flush emits
      the deferred short once the watermark passes the conversation's
      last turn + ttl_s. ``ttl_s >= span_s`` is required for exactly
      the reason the negation body states it: any turn admitted after
      the flush is > span_s past the window start, so the long window
      it would complete is span-dead and the short decision was final
      — the flush provably equals the batch twin's null-lead
      semantics.

    State per conversation: cursor + last k-1 turns + at most ONE
    deferred candidate (each row resolves the previous row's deferral
    before creating its own) — still O(k), flush-evicted."""
    k = len(pattern)
    opt_at = [i for i, s in enumerate(pattern) if s.optional]
    if len(opt_at) != 1:
        raise ValueError("optional patterns need exactly one Step.optional")
    if any(s.tool_equals_step is not None for s in pattern):
        # cross-step capture indexes into a fixed window; with an
        # optional step the indices shift between the two forms
        raise ValueError("optional patterns cannot use tool_equals_step")
    if k < 3:
        raise ValueError("an optional pattern needs at least 3 steps")
    if ttl_s < span_s:
        raise ValueError(
            "ttl_s must be >= span_s: the flush finalizes a deferred "
            "short match only once no in-span upgrade turn can arrive"
        )
    short = tuple(s for i, s in enumerate(pattern) if i != opt_at[0])
    cols = [f.name for f in CEP_OUT_SCHEMA.fields]

    def opt_fn(key, pdfs, state):
        import pandas as pd

        conv_id = key[0]
        if getattr(state, "hasTimedOut", False):
            # watermark > last turn + ttl_s: the deferred short (if
            # any) is final — no admissible turn can upgrade it — and
            # the pending window is span-dead. Emit, then evict.
            meta = json.loads(state.get[0]) if state.exists else {"d": None}
            state.remove()
            d = meta.get("d")
            if d:
                yield pd.DataFrame(
                    [(conv_id, int(d[0]), d[1], int(d[2]))], columns=cols
                )
            return

        cursor, pending, deferred = -1, [], None
        if state.exists:
            meta = json.loads(state.get[0])
            cursor, pending, deferred = meta["c"], meta["p"], meta.get("d")

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch[batch["turn_idx"] > cursor]  # cursor: reject replays
        if not len(batch):
            return
        batch = batch.sort_values("turn_idx").drop_duplicates(
            subset=["turn_idx"], keep="first"
        )

        rows = list(pending) + [
            [r, (tl if isinstance(tl, str) else None), int(t), int(i)]
            for r, tl, t, i in zip(
                batch["role"],
                batch["tool"],
                batch["ts"].astype("int64") // 10**9,
                batch["turn_idx"].astype("int64"),
            )
        ]
        out = []
        for e in range(len(pending), len(rows)):
            # 1. the long window ending at e (start e-k+1 — the SAME
            #    start as any deferral set at row e-1)
            long_hit = None
            if e >= k - 1:
                win = rows[e - k + 1 : e + 1]
                if (
                    all(s.matches(w[0], w[1]) for s, w in zip(pattern, win))
                    and win[-1][2] - win[0][2] <= span_s
                ):
                    long_hit = (
                        conv_id,
                        int(win[0][3]),
                        win[-1][1],
                        int(win[-1][2] - win[0][2]),
                    )
            # 2. greedy resolution: long supersedes the deferred short
            if deferred is not None:
                out.append(
                    long_hit
                    if long_hit
                    else (conv_id, int(deferred[0]), deferred[1], int(deferred[2]))
                )
                deferred = None
            elif long_hit:
                out.append(long_hit)
            # 3. new short candidate ending at e — deferred one turn
            if e >= k - 2:
                swin = rows[e - k + 2 : e + 1]
                if (
                    all(s.matches(w[0], w[1]) for s, w in zip(short, swin))
                    and swin[-1][2] - swin[0][2] <= span_s
                ):
                    deferred = [
                        int(swin[0][3]),
                        swin[-1][1],
                        int(swin[-1][2] - swin[0][2]),
                    ]

        state.update(
            (
                json.dumps(
                    {"c": int(rows[-1][3]), "p": rows[-(k - 1):], "d": deferred}
                ),
            )
        )
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max(int(rows[-1][2]) * 1000 + ttl_s * 1000, wm_ms + 1)
        )
        if out:
            yield pd.DataFrame(out, columns=cols)

    return opt_fn


def cep_optional_stream(
    df: DataFrame,
    pattern: tuple[Step, ...] = USER_OPT_AGENT_TOOL,
    span_s: int = PATTERN_SPAN_S,
    ttl_s: int | None = None,
    wm_delay_s: int = 1800,
) -> DataFrame:
    """Streaming greedy optional-step pattern (see make_optional_fn).
    Like the negation operator — and unlike the all-required patterns
    — the timeout is NOT optional: a deferred short match at a
    conversation's tail is only decidable once the watermark closes
    the book, so ttl_s defaults to span_s (its minimum) and the
    operator always runs under EventTimeTimeout. Feed contract:
    time-ordered delivery (split_by_time), so replays land below the
    watermark and are absorbed by the late filter."""
    if ttl_s is None:
        ttl_s = span_s
    from dstream_spark.operators.event_time import to_instant

    cols = df.select("conv_id", "turn_idx", "role", "tool", "ts")
    evt = cols.withColumn("_evt", to_instant("ts")).withWatermark(
        "_evt", f"{wm_delay_s} seconds"
    )
    return evt.groupBy("conv_id").applyInPandasWithState(
        make_optional_fn(pattern, span_s, ttl_s),
        outputStructType=CEP_OUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def make_followed_by_fn(a: Step, b: Step, n_turns: int,
                        span_s: int = PATTERN_SPAN_S,
                        ttl_s: int | None = None):
    """NON-CONSECUTIVE pattern: 'A followed by B within n_turns turns'
    with skip-till-next-match semantics (Flink CEP / MATCH_RECOGNIZE's
    relaxed contiguity): each A-turn matches the FIRST later B-turn
    whose turn distance is <= n_turns and time gap <= span_s,
    skipping any non-B turns between them. One match per A-turn.

    State per conversation: the cursor plus the UNMATCHED A-turns of
    the last n_turns turns — O(n_turns), constant for a fixed window,
    because an A older than n_turns behind the newest turn can never
    match (the next B is farther than n_turns away) and is pruned.
    Emits (conv_id, first_turn = the A-turn, tool = the B-turn's tool,
    span_s = B.ts - A.ts). ``ttl_s`` as in make_cep_fn: with the
    span_s time bound, state older than last_turn + span_s is dead and
    EventTimeTimeout-evictable."""
    if a.tool_equals_step is not None or b.tool_equals_step is not None:
        # cross-step capture indexes into a consecutive window; the
        # followed-by form has no such window to index
        raise ValueError("followed-by steps cannot use tool_equals_step")

    def fb_fn(key, pdfs, state):
        import pandas as pd

        if getattr(state, "hasTimedOut", False):
            state.remove()
            return

        conv_id = key[0]
        cursor, pending_a = -1, []  # pending_a: [turn_idx, epoch_s]
        if state.exists:
            meta = json.loads(state.get[0])
            cursor, pending_a = meta["c"], meta["p"]

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch[batch["turn_idx"] > cursor]
        if not len(batch):
            return
        batch = batch.sort_values("turn_idx").drop_duplicates(
            subset=["turn_idx"], keep="first"
        )

        out = []
        last_idx = cursor
        for role, tool, t_s, idx in zip(
            batch["role"],
            batch["tool"],
            batch["ts"].astype("int64") // 10**9,
            batch["turn_idx"].astype("int64"),
        ):
            tool = tool if isinstance(tool, str) else None
            t_s, idx = int(t_s), int(idx)
            if b.matches(role, tool):
                matched, keep = [], []
                for a_idx, a_t in pending_a:
                    if idx - a_idx <= n_turns and t_s - a_t <= span_s:
                        matched.append((a_idx, a_t))
                    else:
                        keep.append([a_idx, a_t])
                for a_idx, a_t in matched:  # first B for each pending A
                    out.append((conv_id, int(a_idx), tool, int(t_s - a_t)))
                pending_a = keep
            if a.matches(role, tool):
                pending_a.append([idx, t_s])
            # prune: an A more than n_turns behind can never match
            pending_a = [p for p in pending_a if idx - p[0] < n_turns]
            last_idx, last_t = idx, t_s

        state.update((json.dumps({"c": int(last_idx), "p": pending_a}),))
        if ttl_s is not None:
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(last_t * 1000 + ttl_s * 1000, wm_ms + 1))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in CEP_OUT_SCHEMA.fields])

    return fb_fn


def followed_by_stream(
    df: DataFrame,
    a: Step,
    b: Step,
    n_turns: int,
    span_s: int = PATTERN_SPAN_S,
    ttl_s: int | None = None,
    wm_delay_s: int = 1800,
) -> DataFrame:
    """Streaming skip-till-next-match 'A followed by B within N turns'
    (see make_followed_by_fn); same exactly-once/cross-batch contract
    as cep_pattern_stream, same optional TTL eviction."""
    cols = df.select("conv_id", "turn_idx", "role", "tool", "ts")
    if ttl_s is None:
        return cols.groupBy("conv_id").applyInPandasWithState(
            make_followed_by_fn(a, b, n_turns, span_s),
            outputStructType=CEP_OUT_SCHEMA,
            stateStructType=CEP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    from dstream_spark.operators.event_time import to_instant

    evt = cols.withColumn("_evt", to_instant("ts")).withWatermark(
        "_evt", f"{wm_delay_s} seconds"
    )
    return evt.groupBy("conv_id").applyInPandasWithState(
        make_followed_by_fn(a, b, n_turns, span_s, ttl_s),
        outputStructType=CEP_OUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


NOT_FOLLOWED_OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("first_turn", T.IntegerType()),
    ]
)


ONE_OR_MORE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("first_turn", T.IntegerType()),
        T.StructField("n_reps", T.IntegerType()),
        T.StructField("tool", T.StringType()),
        T.StructField("span_s", T.LongType()),
    ]
)


def make_one_or_more_fn(a: Step, b: Step, c: Step,
                        span_s: int = PATTERN_SPAN_S,
                        ttl_s: int | None = None,
                        min_reps: int = 1):
    """KLEENE-PLUS pattern (regex ``A B+ C`` / MATCH_RECOGNIZE's
    one-or-more quantifier), POSSESSIVE: an A-turn opens a candidate,
    every consecutive B-matching turn extends its run (B consumes
    first — no backtracking), and the FIRST non-B turn closes the run:
    it either completes the match (it satisfies C, the run is
    non-empty, and first→last is within span_s) or kills the
    candidate. The run is UNBOUNDED — no max-repeat cap — yet state is
    O(1) per conversation: the candidate (start turn, start time, run
    length) plus the cursor.

    ``min_reps=0`` turns the plus into KLEENE-STAR (``A B* C``, the
    zero-or-more quantifier): the ONLY semantic change is that an
    empty run may complete — an A-turn directly followed by a C-turn
    matches with n_reps = 0. The state machine, the possessive
    consumption rule, and the batch lag-over-non-B-turns twin are
    otherwise identical (the twin's run-length predicate relaxes from
    ``>= 1`` to ``>= 0``).

    Possessive == declarative-greedy only when no turn can match both
    A and B (otherwise an A inside another candidate's run would need
    a second candidate slot), and the batch lag-over-non-B-turns twin
    relies on "non-B" being a pure role complement — so the factory
    REQUIRES a.role and b.role set and distinct, and b role-only.

    Unlike the optional/negation forms, emission never depends on a
    timeout: a match completes on the arrival of its C-turn, and a
    candidate at the stream's tail (run never closed) matches the
    batch twin's behavior — no C row, no match. ``ttl_s`` is therefore
    pure state HYGIENE (EventTimeTimeout eviction of idle
    conversations, exact for ttl_s >= span_s: any later admissible
    C-turn would exceed span_s anyway); the flush emits nothing."""
    if b.role is None or b.tool_required or b.tool_equals_step is not None:
        raise ValueError("the repeated step must be role-only (b.role set, "
                         "no tool constraints)")
    if a.role is None or a.role == b.role:
        raise ValueError("a.role must be set and distinct from b.role "
                         "(possessive == greedy only for disjoint A/B)")
    if c.tool_equals_step is not None:
        raise ValueError("one-or-more steps cannot use tool_equals_step")
    if min_reps not in (0, 1):
        raise ValueError("min_reps must be 0 (Kleene star) or 1 (plus)")
    if ttl_s is not None and ttl_s < span_s:
        raise ValueError("ttl_s must be >= span_s: eviction is exact only "
                         "once no in-span C-turn can arrive")
    cols = [f.name for f in ONE_OR_MORE_OUT_SCHEMA.fields]

    def oom_fn(key, pdfs, state):
        import pandas as pd

        if getattr(state, "hasTimedOut", False):
            # pure eviction — a candidate here can never complete
            # in-span (see docstring); nothing to emit
            state.remove()
            return

        conv_id = key[0]
        cursor, cand = -1, None  # cand: [a_idx, a_ts, run_len]
        if state.exists:
            meta = json.loads(state.get[0])
            cursor, cand = meta["c"], meta.get("a")

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch[batch["turn_idx"] > cursor]  # cursor: reject replays
        if not len(batch):
            return
        batch = batch.sort_values("turn_idx").drop_duplicates(
            subset=["turn_idx"], keep="first"
        )

        out = []
        last_idx, last_t = cursor, None
        for role, tool, t_s, idx in zip(
            batch["role"],
            batch["tool"],
            batch["ts"].astype("int64") // 10**9,
            batch["turn_idx"].astype("int64"),
        ):
            tool = tool if isinstance(tool, str) else None
            t_s, idx = int(t_s), int(idx)
            if cand is not None and b.matches(role, tool):
                cand[2] += 1  # possessive: B consumes first
            else:
                if (
                    cand is not None
                    and cand[2] >= min_reps
                    and c.matches(role, tool)
                    and t_s - cand[1] <= span_s
                ):
                    out.append(
                        (conv_id, int(cand[0]), int(cand[2]), tool,
                         int(t_s - cand[1]))
                    )
                # the run closed (matched or not) — candidate is spent
                cand = [idx, t_s, 0] if a.matches(role, tool) else None
            last_idx, last_t = idx, t_s

        state.update((json.dumps({"c": int(last_idx), "a": cand}),))
        if ttl_s is not None:
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(last_t * 1000 + ttl_s * 1000, wm_ms + 1)
            )
        if out:
            yield pd.DataFrame(out, columns=cols)

    return oom_fn


def one_or_more_stream(
    df: DataFrame,
    a: Step,
    b: Step,
    c: Step,
    span_s: int = PATTERN_SPAN_S,
    ttl_s: int | None = None,
    wm_delay_s: int = 1800,
    min_reps: int = 1,
) -> DataFrame:
    """Streaming possessive 'A B+ C' (see make_one_or_more_fn); same
    exactly-once/cross-batch contract as cep_pattern_stream. Without
    ttl_s the operator needs no watermark at all (emission is purely
    in-data); with it, idle conversations are EventTimeTimeout-evicted
    exactly like the other pattern forms. ``min_reps=0`` is the
    Kleene-star form (prefer the zero_or_more_stream alias)."""
    cols = df.select("conv_id", "turn_idx", "role", "tool", "ts")
    if ttl_s is None:
        return cols.groupBy("conv_id").applyInPandasWithState(
            make_one_or_more_fn(a, b, c, span_s, min_reps=min_reps),
            outputStructType=ONE_OR_MORE_OUT_SCHEMA,
            stateStructType=CEP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    from dstream_spark.operators.event_time import to_instant

    evt = cols.withColumn("_evt", to_instant("ts")).withWatermark(
        "_evt", f"{wm_delay_s} seconds"
    )
    return evt.groupBy("conv_id").applyInPandasWithState(
        make_one_or_more_fn(a, b, c, span_s, ttl_s, min_reps=min_reps),
        outputStructType=ONE_OR_MORE_OUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def zero_or_more_stream(
    df: DataFrame,
    a: Step,
    b: Step,
    c: Step,
    span_s: int = PATTERN_SPAN_S,
    ttl_s: int | None = None,
    wm_delay_s: int = 1800,
) -> DataFrame:
    """Streaming possessive 'A B* C' (Kleene STAR / MATCH_RECOGNIZE's
    zero-or-more quantifier): one_or_more_stream with an empty run
    admitted — an A-turn directly followed by an in-span C-turn
    matches with n_reps = 0. Same O(1) candidate state, exactly-once
    cursor, and purely-in-data emission."""
    return one_or_more_stream(
        df, a, b, c, span_s, ttl_s, wm_delay_s, min_reps=0
    )


def make_not_followed_by_fn(a: Step, b: Step, n_turns: int,
                            span_s: int = PATTERN_SPAN_S,
                            ttl_s: int = PATTERN_SPAN_S):
    """NEGATION pattern (Flink CEP notFollowedBy / MATCH_RECOGNIZE
    absence): emit each A-turn with NO qualifying B-turn within
    ``n_turns`` turns and ``span_s`` seconds.

    Absence over an append stream is only decidable once no qualifying
    B can still arrive, so a pending A is emitted when either

    - a later turn of the same conversation crosses a bound (turn
      distance >= n_turns, or time gap > span_s) — event time is
      non-decreasing in turn order (the changefeed's CDC order), so
      every later turn is at least as far on both axes; or
    - the event-time timeout fires: the watermark passed the
      conversation's last turn + ttl_s >= span_s, so nothing the late
      filter would still admit can match any pending A.

    ``ttl_s >= span_s`` is required for exactly that reason. The
    streaming oracle encodes the same two confirmation clauses — the
    treatment the LEFT OUTER stream-stream join's null emission got.
    State per conversation: cursor + unmatched pending A-turns,
    self-pruning via confirmation — O(n_turns), and removed entirely
    at the timeout flush.
    """
    if a.tool_equals_step is not None or b.tool_equals_step is not None:
        raise ValueError("followed-by steps cannot use tool_equals_step")
    if ttl_s < span_s:
        raise ValueError(
            "ttl_s must be >= span_s: a pending A is only confirmable "
            "absent once no in-span B can arrive"
        )

    def nf_fn(key, pdfs, state):
        import pandas as pd

        conv_id = key[0]
        if getattr(state, "hasTimedOut", False):
            # watermark > last_turn + ttl_s >= every pending A + span_s:
            # all pending A-turns are confirmed not-followed — flush
            # them and drop the state (O(active convs) store)
            meta = json.loads(state.get[0]) if state.exists else {"p": []}
            state.remove()
            if meta["p"]:
                yield pd.DataFrame(
                    [(conv_id, int(idx)) for idx, _ in meta["p"]],
                    columns=["conv_id", "first_turn"],
                )
            return

        cursor, pending = -1, []  # pending: [turn_idx, epoch_s]
        if state.exists:
            meta = json.loads(state.get[0])
            cursor, pending = meta["c"], meta["p"]

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch[batch["turn_idx"] > cursor]
        if not len(batch):
            return
        batch = batch.sort_values("turn_idx").drop_duplicates(
            subset=["turn_idx"], keep="first"
        )

        out = []
        last_idx, last_t = cursor, None
        for role, tool, t_s, idx in zip(
            batch["role"],
            batch["tool"],
            batch["ts"].astype("int64") // 10**9,
            batch["turn_idx"].astype("int64"),
        ):
            tool = tool if isinstance(tool, str) else None
            t_s, idx = int(t_s), int(idx)
            # a B at exactly the turn bound still matches (<=), so
            # match BEFORE confirming on the strict complement (>=)
            if b.matches(role, tool):
                pending = [
                    p for p in pending
                    if not (idx - p[0] <= n_turns and t_s - p[1] <= span_s)
                ]
            confirmed = [
                p for p in pending if idx - p[0] >= n_turns or t_s - p[1] > span_s
            ]
            if confirmed:
                out.extend((conv_id, int(p[0])) for p in confirmed)
                pending = [
                    p for p in pending
                    if not (idx - p[0] >= n_turns or t_s - p[1] > span_s)
                ]
            if a.matches(role, tool):
                pending.append([idx, t_s])
            last_idx, last_t = idx, t_s

        state.update((json.dumps({"c": int(last_idx), "p": pending}),))
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_t * 1000 + ttl_s * 1000, wm_ms + 1))
        if out:
            yield pd.DataFrame(out, columns=["conv_id", "first_turn"])

    return nf_fn


def not_followed_by_stream(
    df: DataFrame,
    a: Step,
    b: Step,
    n_turns: int,
    span_s: int = PATTERN_SPAN_S,
    ttl_s: int | None = None,
    wm_delay_s: int = 1800,
) -> DataFrame:
    """Streaming 'A NOT followed by B within N turns / span_s seconds'
    (see make_not_followed_by_fn). Unlike the positive patterns the
    timeout is not optional — absence needs the watermark to close the
    book on a conversation — so ttl_s defaults to span_s (its minimum)
    and the operator always runs under EventTimeTimeout. Feed contract:
    time-ordered (split_by_time) delivery, so the watermark late filter
    never drops a legitimate turn and replays land below it."""
    if ttl_s is None:
        ttl_s = span_s
    from dstream_spark.operators.event_time import to_instant

    cols = df.select("conv_id", "turn_idx", "role", "tool", "ts")
    evt = cols.withColumn("_evt", to_instant("ts")).withWatermark(
        "_evt", f"{wm_delay_s} seconds"
    )
    return evt.groupBy("conv_id").applyInPandasWithState(
        make_not_followed_by_fn(a, b, n_turns, span_s, ttl_s),
        outputStructType=NOT_FOLLOWED_OUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def cep_pattern_stream(
    df: DataFrame,
    pattern: tuple[Step, ...] = USER_AGENT_TOOL,
    span_s: int = PATTERN_SPAN_S,
    ttl_s: int | None = None,
    wm_delay_s: int = 1800,
) -> DataFrame:
    """Pattern matches over a streaming transcript feed (in turn order
    per conversation, as the changefeed delivers them); each match
    emitted exactly once, across batch boundaries.

    ``ttl_s`` bounds state: an idle conversation's pending window is
    evicted once the event-time watermark (``wm_delay_s`` behind the
    stream's max event time) passes its last pending turn + ttl_s —
    exact for ttl_s >= span_s (see make_cep_fn). The watermark rides a
    derived ``_evt`` instant column so the at-rest NTZ ``ts`` is never
    session-timezone-shifted through Arrow."""
    cols = df.select("conv_id", "turn_idx", "role", "tool", "ts")
    if ttl_s is None:
        return cols.groupBy("conv_id").applyInPandasWithState(
            make_cep_fn(pattern, span_s),
            outputStructType=CEP_OUT_SCHEMA,
            stateStructType=CEP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    from dstream_spark.operators.event_time import to_instant

    evt = cols.withColumn("_evt", to_instant("ts")).withWatermark(
        "_evt", f"{wm_delay_s} seconds"
    )
    return evt.groupBy("conv_id").applyInPandasWithState(
        make_cep_fn(pattern, span_s, ttl_s),
        outputStructType=CEP_OUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
