"""Lock contract (D5: acquire / held-reject / stale-break,
docs/capability-inventory.md:185-192) + lifecycle verbs (K6:
init/plan/status/destroy, cmd/*.go) + graceful shutdown (K7)."""

from __future__ import annotations

import time

import pytest

from dstream_spark.sinks.merge import MergeSink
from dstream_spark.streaming.pipeline import Lock, LockHeldError, Pipeline


def test_lock_acquire_reject_stale_break(tmp_path):
    lock = Lock(str(tmp_path / "x.lock"), ttl_s=0.5)
    lock.acquire("writer-a")
    with pytest.raises(LockHeldError):
        lock.acquire("writer-b")  # held → second writer rejected
    lock.acquire("writer-a")  # re-entrant for the owner (heartbeat)
    time.sleep(0.6)
    lock.acquire("writer-b")  # stale (>TTL) → broken, like the 2-min lease
    lock.release("writer-b")
    assert not (tmp_path / "x.lock").exists()


def test_lock_race_exactly_one_winner(tmp_path):
    """TOCTOU contract: N threads racing acquire() on an ABSENT lock →
    exactly one winner (the atomic O_CREAT|O_EXCL claim; the reference's
    blob lease is likewise atomic, docs/capability-inventory.md:185-192)."""
    import threading

    lock = Lock(str(tmp_path / "race.lock"), ttl_s=60)
    results: dict[str, bool] = {}
    barrier = threading.Barrier(8)

    def contend(owner: str) -> None:
        barrier.wait()
        try:
            lock.acquire(owner)
            results[owner] = True
        except LockHeldError:
            results[owner] = False

    threads = [threading.Thread(target=contend, args=(f"w{i}",)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [o for o, won in results.items() if won]
    assert len(winners) == 1
    import json

    assert json.load(open(lock.path))["owner"] == winners[0]


def test_lock_race_on_stale_exactly_one_winner(tmp_path):
    """Two processes racing an EXPIRED lock: the stale break is an
    atomic rename-aside, so exactly one wins and the loser sees the
    winner's fresh (non-stale) lock."""
    import threading

    lock = Lock(str(tmp_path / "stale.lock"), ttl_s=0.2)
    lock.acquire("dead-writer")
    time.sleep(0.3)  # now provably stale
    results: dict[str, bool] = {}
    barrier = threading.Barrier(8)

    def contend(owner: str) -> None:
        barrier.wait()
        try:
            lock.acquire(owner)
            results[owner] = True
        except LockHeldError:
            results[owner] = False

    threads = [threading.Thread(target=contend, args=(f"b{i}",)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sum(results.values()) == 1


def test_renewal_is_cas_not_clobber(tmp_path):
    """The renewal TOCTOU: a holder whose lease expired may race a
    successor that broke the stale lock and re-claimed it. Renewal is
    a CAS (ownership re-verified under the same .cas flock as the
    stale break), so the lapsed holder gets LockHeldError and the
    successor's lock survives untouched."""
    import json

    lock = Lock(str(tmp_path / "renew.lock"), ttl_s=60)
    lock.acquire("a")
    # simulate the interleaving: after A's optimistic owner read, a
    # successor broke A's (expired) lock and claimed the slot
    with open(lock.path, "w") as f:
        json.dump({"owner": "b", "ts": time.time()}, f)
    with pytest.raises(LockHeldError):
        lock._cas_renew("a")
    assert json.load(open(lock.path))["owner"] == "b"  # never clobbered
    # the acquire() renewal path surfaces the same loss
    with pytest.raises(LockHeldError):
        lock.acquire("a")

    # lock vanished between read and CAS → not an error, claim retried
    import os

    os.unlink(lock.path)
    assert lock._cas_renew("b") is False
    lock.acquire("b")  # re-claim succeeds
    t_before = json.load(open(lock.path))["ts"]
    time.sleep(0.01)
    assert lock._cas_renew("b") is True  # happy-path renewal refreshes ts
    assert json.load(open(lock.path))["ts"] > t_before


def test_release_wrong_owner_is_noop(tmp_path):
    lock = Lock(str(tmp_path / "y.lock"), ttl_s=10)
    lock.acquire("a")
    lock.release("b")
    assert (tmp_path / "y.lock").exists()


def test_lifecycle_verbs(spark, tmp_path):
    sink = MergeSink(str(tmp_path / "tbl"))
    pipe = Pipeline(
        spark,
        {
            "name": "lc",
            "source": {"type": "rate"},
            "sink": {"type": "merge", "sink": sink},
            "checkpoint_dir": str(tmp_path / "ckpt"),
        },
    )
    plan = pipe.plan()
    assert plan["status"] == "success"
    init = pipe.init()
    assert init["status"] == "success" and str(tmp_path / "ckpt") in init["resources"]
    st = pipe.status()
    assert st["active"] is False and st["sink"]["committed_batches"] == 0
    destroyed = pipe.destroy()
    assert destroyed["status"] == "success"
    assert not (tmp_path / "tbl").exists()


def test_graceful_shutdown_rate_stream(spark, tmp_path):
    """run → stop within the grace window → lock released (SIGTERM +
    10s grace analog, pkg/executor/providers.go:441-487)."""
    sink = MergeSink(str(tmp_path / "tbl"), keys=("timestamp", "value"),
                     partition_key="value", order_cols=("value",))
    pipe = Pipeline(
        spark,
        {
            "name": "shutdown_test",
            "source": {"type": "rate", "rows_per_second": 5},
            "sink": {"type": "merge", "sink": sink},
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "trigger": {"processingTime": "200 milliseconds"},
        },
    )
    pipe.init()
    q = pipe.run()
    assert q.isActive
    time.sleep(2.0)
    t0 = time.time()
    pipe.stop(grace_s=10.0)
    assert time.time() - t0 < 10.0
    assert not q.isActive
    assert not (tmp_path / "ckpt" / "_dstream.lock").exists()


def test_second_writer_rejected_while_running(spark, tmp_path):
    sink = MergeSink(str(tmp_path / "tbl"), keys=("timestamp", "value"),
                     partition_key="value", order_cols=("value",))
    conf = {
        "name": "single_writer",
        "source": {"type": "rate", "rows_per_second": 1},
        "sink": {"type": "merge", "sink": sink},
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "trigger": {"processingTime": "1 second"},
    }
    p1 = Pipeline(spark, conf)
    p1.init()
    p1.run(owner="proc-1")
    try:
        p2 = Pipeline(spark, conf)
        with pytest.raises(LockHeldError):
            p2.run(owner="proc-2")
    finally:
        p1.stop(owner="proc-1")


def test_heartbeat_keeps_lock_past_ttl(spark, tmp_path):
    """D5 lease renewal: a query that RUNS LONGER than the stale TTL
    must still reject a second writer — the heartbeat thread renews
    the lease, so 'stale' means abandoned, not long-running."""
    sink = MergeSink(str(tmp_path / "tbl"), keys=("timestamp", "value"),
                     partition_key="value", order_cols=("value",))
    conf = {
        "name": "hb_writer",
        "source": {"type": "rate", "rows_per_second": 1},
        "sink": {"type": "merge", "sink": sink},
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "trigger": {"processingTime": "200 milliseconds"},
        "lock_ttl_s": 1.0,  # heartbeat every ~0.33s
    }
    p1 = Pipeline(spark, conf)
    p1.init()
    p1.run(owner="proc-1")
    try:
        time.sleep(2.5)  # well past the 1s TTL
        p2 = Pipeline(spark, conf)
        with pytest.raises(LockHeldError):
            p2.run(owner="proc-2")  # still held: lease was renewed
    finally:
        p1.stop(owner="proc-1")
    # after release + TTL, a new writer may proceed
    time.sleep(1.1)
    p3 = Pipeline(spark, conf)
    q3 = p3.run(owner="proc-3")
    assert q3.isActive
    p3.stop(owner="proc-3")


def test_failed_start_releases_lock_and_heartbeat(spark, tmp_path):
    """A run() that fails BEFORE the query starts must not leak the
    lease: without cleanup the heartbeat daemon renews the lock forever
    and a self-healing stale lock becomes a permanent lock-out."""
    conf = {
        "name": "leaky",
        "source": {"type": "rate"},
        "sink": {"type": "no_such_sink"},
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "lock_ttl_s": 0.5,
    }
    p1 = Pipeline(spark, conf)
    with pytest.raises(KeyError):
        p1.run(owner="proc-1")
    # lock released immediately (not merely stale-broken later)
    assert not (tmp_path / "ckpt" / "_dstream.lock").exists()
    time.sleep(0.7)  # a leaked heartbeat would have recreated it by now
    assert not (tmp_path / "ckpt" / "_dstream.lock").exists()
    # a second writer proceeds without waiting out any TTL
    good = dict(conf, sink={"type": "memory", "name": "leak_check"},
                source={"type": "rate", "rows_per_second": 1},
                trigger={"processingTime": "1 second"})
    p2 = Pipeline(spark, good)
    q = p2.run(owner="proc-2")
    assert q.isActive
    p2.stop(owner="proc-2")
