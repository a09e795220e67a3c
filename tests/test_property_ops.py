"""Property-based operator invariants (the reference has none —
SURVEY.md §5.4):

1. apply_changes == a sequential python fold of the change log
   (latest version wins, delete removes) for ANY interleaving of
   insert/update/delete across keys and versions.
2. simhash_near_dups (pigeonhole banding) == brute force for random
   hash sets at random hamming thresholds.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# --- 1. change-feed fold ------------------------------------------------

_changes = st.lists(
    st.tuples(
        st.integers(0, 2),  # conv
        st.integers(0, 3),  # turn
        st.integers(1, 5),  # version
        st.sampled_from(["insert", "update", "delete"]),
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changes=_changes)
def test_apply_changes_matches_sequential_fold(spark, changes):
    from dstream_spark.operators.cdc import apply_changes

    # a CDC log has one change per (key, version): dedup the generated
    # list (last wins) so the version tiebreak never has to choose
    # between two different ops at the same version
    log: dict[tuple, str] = {}
    for c, t, v, op in changes:
        log[(f"c{c}", t, v)] = op
    rows = [(c, t, v, op) for (c, t, v), op in log.items()]

    model: dict[tuple, tuple] = {}
    for c, t, v, op in rows:
        key = (c, t)
        if key not in model or v > model[key][0]:
            model[key] = (v, op)
    expected = {
        (k[0], k[1], f"p{v}") for k, (v, op) in model.items() if op != "delete"
    }

    df = spark.createDataFrame(
        [(c, t, f"p{v}", v, op) for c, t, v, op in rows],
        "conv_id string, turn_idx int, payload string, _commit_version long, _change_type string",
    )
    got = {
        (r.conv_id, r.turn_idx, r.payload)
        for r in apply_changes(df).select("conv_id", "turn_idx", "payload").collect()
    }
    assert got == expected


# --- 2. banding equivalence ----------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    hashes=st.lists(st.integers(0, 2**32 - 1), min_size=2, max_size=25, unique=True),
    max_hamming=st.integers(1, 12),
)
def test_banded_near_dups_equal_brute_force_any_threshold(spark, hashes, max_hamming):
    from pyspark.sql import functions as F

    from dstream_spark.functions.dedup_text import hamming_distance, simhash_near_dups

    sig = spark.createDataFrame(
        [(i, int(h)) for i, h in enumerate(hashes)], "doc_id long, simhash long"
    )
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dups(sig, bits=32, max_hamming=max_hamming).collect()
    }
    l, r_ = sig.alias("l"), sig.alias("r")
    brute = {
        (row.id_a, row.id_b, row.hamming)
        for row in (
            l.join(r_, F.col("l.doc_id") < F.col("r.doc_id"))
            .select(
                F.col("l.doc_id").alias("id_a"),
                F.col("r.doc_id").alias("id_b"),
                hamming_distance(F.col("l.simhash"), F.col("r.simhash")).alias("hamming"),
            )
            .filter(F.col("hamming") <= max_hamming)
        ).collect()
    }
    assert banded == brute
