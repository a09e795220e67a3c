"""Property-based exactly-once: for ANY sequence of batches — arbitrary
key overlap, arbitrary replays of committed epochs — the MergeSink
table equals the deduped union of each epoch's FIRST submission.
The reference has no property-based tests (SURVEY.md §5.4); this is
the invariant its publish-then-advance contract wants but can't state.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dstream_spark.sinks.merge import MergeSink

# a batch: (batch_id 0-3, rows as (conv 0-3, turn 0-5)); sequences may
# repeat batch ids (replays) and keys (cross-batch duplicates)
_batches = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 5)), min_size=1, max_size=6
        ),
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_batches)
def test_exactly_once_under_arbitrary_replay(spark, tmp_path_factory, batches):
    sink = MergeSink(str(tmp_path_factory.mktemp("tbl")), n_partitions=2)
    t0 = dt.datetime(2024, 3, 1)
    first_submission: dict[int, list] = {}
    for batch_id, rows in batches:
        df = spark.createDataFrame(
            [(f"c{c}", t, "user", f"text {c}/{t}", None, t0) for c, t in rows],
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp_ntz",
        )
        if batch_id not in first_submission:
            first_submission[batch_id] = rows
        sink.process_batch(df, batch_id)  # replays must be no-ops

    expected_keys = {
        (f"c{c}", t) for rows in first_submission.values() for c, t in rows
    }
    got = {(r.conv_id, r.turn_idx) for r in sink.read_table(spark).collect()}
    assert got == expected_keys
    # and exactly once: no key appears twice
    assert sink.read_table(spark).count() == len(expected_keys)
