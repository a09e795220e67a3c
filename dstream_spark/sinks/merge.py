"""Exactly-once idempotent MERGE sink with per-partition lineage.

Upgrades the reference's at-least-once publish-then-advance contract
(docs/plugins/mssql-ingester.md:72,84-87 — "exactly-once requires
downstream idempotency") to exactly-once, using Spark's epoch model
plus a commit-marker protocol:

1. foreachBatch gives (batch_df, batch_id); batch_id is stable across
   replays of the same epoch.
2. If this batch_id already has a lineage commit marker → replay →
   skip entirely (idempotent).
3. Batch rows are deduped on (conv_id, turn_idx), hash-partitioned on
   conv_id and sorted within partitions by (conv_id, turn_idx) — the
   ordered-delivery contract (reference relay order,
   pkg/executor/providers.go:234-261) restated for a parallel engine:
   stable order WITHIN each conversation.
4. Data files land under data/batch_id=<id>/ first; the per-partition
   lineage file (partition_id, batch_id, max_conv_id, max_turn_idx,
   updated_at — the cdc_offsets shape, docs/capability-inventory.md:
   179-183) is renamed into _lineage/ LAST. The lineage marker IS the
   commit: readers only see batches with markers, so a crash between
   data write and marker write leaves invisible orphans, not dups.

This is merge-on-read: appends + read-side latest-version resolution
(apply_changes), the same strategy as Iceberg MoR MERGE. On a real
cluster with Iceberg jars, swap process_batch for a single
``MERGE INTO tgt USING batch ON tgt.conv_id=s.conv_id AND
tgt.turn_idx=s.turn_idx`` — the protocol (skip-committed-batch,
sort-within-partition, lineage in the same transaction) is unchanged.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dstream_spark.operators.cdc import apply_changes
from dstream_spark.operators.dedup import dedup_latest


class MergeSink:
    """Parquet-backed exactly-once keyed sink."""

    def __init__(
        self,
        table_dir: str,
        keys: tuple[str, ...] = ("conv_id", "turn_idx"),
        partition_key: str = "conv_id",
        order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
        version_col: str | None = None,
        n_partitions: int = 8,
    ):
        self.table_dir = table_dir
        self.data_dir = os.path.join(table_dir, "data")
        self.lineage_dir = os.path.join(table_dir, "_lineage")
        self.keys = keys
        self.partition_key = partition_key
        self.order_cols = order_cols
        self.version_col = version_col
        self.n_partitions = n_partitions
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.lineage_dir, exist_ok=True)

    # -- commit log -------------------------------------------------
    def committed_batches(self) -> set[int]:
        return {
            int(d.split("=", 1)[1])
            for d in os.listdir(self.lineage_dir)
            if d.startswith("batch_id=") and d.split("=", 1)[1].isdigit()
        }

    # -- the foreachBatch body ---------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) in self.committed_batches():
            return  # replayed epoch — already committed, exactly-once
        if self.version_col and self.version_col not in batch_df.columns:
            # update-mode upserts: later epochs supersede earlier rows
            # for the same key, so stamp the epoch as the version
            batch_df = batch_df.withColumn(
                self.version_col, F.lit(int(batch_id)).cast("long")
            )
        if self.version_col and self.version_col in batch_df.columns:
            bdf = dedup_latest(batch_df, self.keys, self.version_col)
        else:
            bdf = batch_df.dropDuplicates(list(self.keys))
        bdf = bdf.repartition(self.n_partitions, self.partition_key).sortWithinPartitions(
            *self.order_cols
        )
        bdf = bdf.withColumn("_partition_id", F.spark_partition_id())
        bdf.persist()
        try:
            data_path = os.path.join(self.data_dir, f"batch_id={int(batch_id)}")
            tmp_data = data_path + f".tmp-{uuid.uuid4().hex[:8]}"
            bdf.drop("_partition_id").write.mode("overwrite").parquet(tmp_data)
            # lineage BEFORE exposing data: build it from the same cached batch
            lineage = bdf.groupBy("_partition_id").agg(
                F.max(self.partition_key).alias("max_conv_id"),
                F.max(self.keys[-1]).alias("max_turn_idx"),
                F.count(F.lit(1)).alias("n_rows"),
                F.current_timestamp().alias("updated_at"),
            ).withColumnsRenamed({"_partition_id": "partition_id"}).withColumn(
                "batch_id", F.lit(int(batch_id)).cast("long")
            )
            lineage_path = os.path.join(self.lineage_dir, f"batch_id={int(batch_id)}")
            tmp_lin = lineage_path + f".tmp-{uuid.uuid4().hex[:8]}"
            lineage.coalesce(1).write.mode("overwrite").parquet(tmp_lin)
            # two renames; marker (lineage) rename LAST = the commit point
            if os.path.exists(data_path):
                shutil.rmtree(data_path)
            os.rename(tmp_data, data_path)
            os.rename(tmp_lin, lineage_path)
        finally:
            bdf.unpersist()

    # -- readers ------------------------------------------------------
    def read_table(self, spark: SparkSession) -> DataFrame:
        """Committed rows only, latest version per key. A marker whose
        data dir is mid-swap (compact crashed between the aside rename
        and the snapshot rename) resolves to its ``.old`` aside — a
        marker therefore never points at nothing."""
        committed = self.committed_batches()
        if not committed:
            return spark.createDataFrame([], schema="conv_id string")
        paths = []
        for b in sorted(committed):
            p = os.path.join(self.data_dir, f"batch_id={b}")
            paths.append(p if os.path.exists(p) else p + ".old")
        df = spark.read.option("basePath", self.data_dir).parquet(*paths)
        if self.version_col and self.version_col in df.columns:
            return apply_changes(df, self.keys, self.version_col).drop("batch_id")
        w_cols = list(self.keys)
        return df.dropDuplicates(w_cols).drop("batch_id")

    def read_lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self.lineage_dir).parquet(self.lineage_dir)

    # -- maintenance ---------------------------------------------------
    def compact(self, spark: SparkSession) -> int:
        """Fold all committed batches into one base batch (latest
        version per key), then drop the originals. Bounds read_table's
        file listing on a long-running stream — the analog of Iceberg
        snapshot expiration / rewrite_data_files. Must run under the
        pipeline's single-writer lock (streaming/pipeline.py): the
        commit-marker protocol makes a crash mid-compaction safe (the
        new base's marker is renamed in before the old markers are
        removed; a reader sees either the old set or old+new, and
        latest-version dedup makes old+new harmless).

        Returns the id of the new base batch.
        """
        committed = sorted(self.committed_batches())
        if len(committed) <= 1:
            return committed[0] if committed else -1
        base_id = max(committed)  # reuse the max id: replays of it stay no-ops
        snapshot = self.read_table(spark)
        snapshot = snapshot.repartition(self.n_partitions, self.partition_key).sortWithinPartitions(
            *self.order_cols
        )
        tmp_data = os.path.join(self.data_dir, f".compact-{uuid.uuid4().hex[:8]}")
        snapshot.write.mode("overwrite").parquet(tmp_data)
        lineage = (
            spark.read.parquet(tmp_data)
            .groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.max(self.partition_key).alias("max_conv_id"),
                F.max(self.keys[-1]).alias("max_turn_idx"),
                F.count(F.lit(1)).alias("n_rows"),
                F.current_timestamp().alias("updated_at"),
            )
            .withColumn("batch_id", F.lit(int(base_id)).cast("long"))
        )
        tmp_lin = os.path.join(self.lineage_dir, f".compact-{uuid.uuid4().hex[:8]}")
        lineage.coalesce(1).write.mode("overwrite").parquet(tmp_lin)
        # safe swap order — at every step a reader sees a consistent
        # set (new base is a superset; latest-version dedup absorbs the
        # temporary overlap with old batches):
        base_data = os.path.join(self.data_dir, f"batch_id={base_id}")
        aside = base_data + ".old"
        # 1. move old base data aside (read_table serves the aside while
        #    the base dir is absent, so the mid-swap window is readable;
        #    existence guards make a re-run after a crash in that window
        #    idempotent)
        if os.path.exists(base_data):
            shutil.rmtree(aside, ignore_errors=True)  # stale aside from a crashed run
            os.rename(base_data, aside)
        os.rename(tmp_data, base_data)  # 2. new full snapshot in place
        base_marker = os.path.join(self.lineage_dir, f"batch_id={base_id}")
        old_marker_aside = base_marker + ".old"
        if os.path.exists(base_marker):
            shutil.rmtree(old_marker_aside, ignore_errors=True)
            os.rename(base_marker, old_marker_aside)
        os.rename(tmp_lin, base_marker)  # 3. marker now describes the snapshot
        for b in committed:  # 4. retire superseded markers, THEN their data
            if b != base_id:
                shutil.rmtree(os.path.join(self.lineage_dir, f"batch_id={b}"), ignore_errors=True)
        for b in committed:
            if b != base_id:
                shutil.rmtree(os.path.join(self.data_dir, f"batch_id={b}"), ignore_errors=True)
        shutil.rmtree(aside, ignore_errors=True)
        shutil.rmtree(old_marker_aside, ignore_errors=True)
        return int(base_id)

    # -- lifecycle verbs (K6 analog: init/plan/status/destroy) --------
    def init(self) -> None:
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.lineage_dir, exist_ok=True)

    def status(self) -> dict:
        committed = self.committed_batches()
        return {
            "table_dir": self.table_dir,
            "committed_batches": len(committed),
            "max_batch_id": max(committed) if committed else None,
        }

    def destroy(self) -> None:
        shutil.rmtree(self.table_dir, ignore_errors=True)
