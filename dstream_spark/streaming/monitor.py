"""S2 multi-table monitor: independent per-table pipelines.

The reference's router monitors many tables from one process, one
polling loop per table, each with its own cursor, lock and failure
domain (docs/capability-inventory.md:130-135; a broken table must not
stop the others — D6). The Spark-native form: one StreamingQuery per
table — each with its OWN source path, checkpoint dir (hence offsets +
lock) and sink — sharing a single SparkSession/cluster. Queries run
concurrently on the scheduler; an exception in one terminates only
that query.

This is deliberately NOT a union-then-partitionBy single query: a
shared query couples the tables' failure domains and checkpoints,
which is exactly what the reference avoids.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from dstream_spark.streaming.pipeline import Pipeline


class Monitor:
    """Run N table pipelines side by side; track each independently."""

    def __init__(self, spark: SparkSession, table_confs: list[dict]):
        self.pipelines: dict[str, Pipeline] = {
            conf["name"]: Pipeline(spark, conf) for conf in table_confs
        }

    def init_all(self) -> dict:
        return {name: p.init() for name, p in self.pipelines.items()}

    def run_all(self, owner: str = "driver") -> dict:
        """Start every table's query; a table that fails to START is
        recorded (not raised) so the rest keep going — per-table
        failure isolation from the first moment."""
        started: dict[str, object] = {}
        for name, p in self.pipelines.items():
            try:
                started[name] = p.run(owner=owner)
            except Exception as e:  # noqa: BLE001 — isolate, report in status
                started[name] = e
        return started

    def await_all(self, timeout_s: float | None = None) -> None:
        for p in self.pipelines.values():
            if p.query is not None:
                if timeout_s is None:
                    try:
                        p.query.awaitTermination()
                    except Exception:  # surfaced via status()/crash_monitor
                        pass
                else:
                    try:
                        p.query.awaitTermination(timeout=timeout_s)
                    except Exception:
                        pass

    def status(self) -> dict:
        return {name: p.status() for name, p in self.pipelines.items()}

    def stop_all(self, owner: str = "driver") -> None:
        for p in self.pipelines.values():
            p.stop(owner=owner)
