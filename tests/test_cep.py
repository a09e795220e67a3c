"""Unit contract for the streaming CEP state function: triples that
straddle a micro-batch boundary fire exactly once, replays are
rejected by the cursor, and state stays O(1) (two turns)."""

from __future__ import annotations

import pandas as pd


class FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _batch(rows):
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "tool", "ts"]
    ).astype({"ts": "datetime64[ns]"})


def _run(state, rows):
    from dstream_spark.operators.cep import _cep_fn

    out = list(_cep_fn(("c1",), iter([_batch(rows)]), state))
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


T0 = pd.Timestamp("2024-01-01 00:00:00")


def _t(minutes):
    return T0 + pd.Timedelta(minutes=minutes)


def test_triple_across_batch_boundary_fires_once():
    st = FakeState()
    # batch 1 ends mid-pattern: user then agent
    out1 = _run(st, [("c1", 0, "user", None, _t(0)), ("c1", 1, "agent", None, _t(1))])
    assert len(out1) == 0
    # batch 2 delivers the tool turn — the pending state bridges it
    out2 = _run(st, [("c1", 2, "tool", "search", _t(2))])
    assert len(out2) == 1
    r = out2.iloc[0]
    assert (r.conv_id, r.user_turn, r.tool, r.span_s) == ("c1", 0, "search", 120)


def test_replayed_turns_do_not_duplicate_matches():
    st = FakeState()
    rows = [
        ("c1", 0, "user", None, _t(0)),
        ("c1", 1, "agent", None, _t(1)),
        ("c1", 2, "tool", "search", _t(2)),
    ]
    assert len(_run(st, rows)) == 1
    # crash-replay of the same batch: cursor rejects every turn
    assert len(_run(st, rows)) == 0


def test_span_bound_excludes_slow_triples():
    from dstream_spark.operators.cep import PATTERN_SPAN_S

    st = FakeState()
    out = _run(
        st,
        [
            ("c1", 0, "user", None, _t(0)),
            ("c1", 1, "agent", None, _t(1)),
            ("c1", 2, "tool", "search", _t(PATTERN_SPAN_S // 60 + 1)),
        ],
    )
    assert len(out) == 0


def test_state_is_last_two_turns_only():
    st = FakeState()
    _run(st, [("c1", i, "user", None, _t(i)) for i in range(50)])
    role_a, _, _, idx_a, role_b, _, _, idx_b = st.get
    assert (idx_a, idx_b) == (48, 49)
    assert role_a == role_b == "user"
