"""Checkpoint/resume + exactly-once — the reference's D2-D4 contracts
(docs/capability-inventory.md:179-183, docs/plugins/mssql-ingester.md:
84-87): stop mid-stream, restart from checkpoint, no loss and no dups;
replayed epochs are harmless."""

from __future__ import annotations

import os

import numpy as np

from dstream_spark.fixtures.transcripts import CHANGEFEED_SCHEMA, generate_transcripts
from dstream_spark.sinks.merge import MergeSink
from dstream_spark.sources.registry import changefeed


def _write_one(spark, pdf, path: str, version: int, mtime: int) -> None:
    part = pdf.copy()
    part["_change_type"] = "insert"
    part["_commit_version"] = np.int64(version)
    sdf = spark.createDataFrame(part, schema=CHANGEFEED_SCHEMA)
    tmp = path + ".tmp"
    sdf.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.rename(os.path.join(tmp, src), path)
    import shutil

    shutil.rmtree(tmp)
    os.utime(path, (mtime, mtime))


def test_resume_from_checkpoint_no_loss_no_dup(spark, tmp_path):
    pdf = generate_transcripts(n_convs=6, turns_per_conv=10)
    half = len(pdf) // 2
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    ckpt = str(tmp_path / "ckpt")
    sink = MergeSink(str(tmp_path / "table"), n_partitions=4)

    # phase 1: only the first half of the stream exists; drain it
    _write_one(spark, pdf.iloc[:half], f"{feed}/b0.parquet", 0, 1_700_000_000)
    src = changefeed(spark, {"path": feed})
    q = (
        src.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # "crash": query fully stopped mid-stream
    n_phase1 = sink.read_table(spark).count()
    assert n_phase1 == half

    # phase 2: rest of the stream arrives; RESTART from same checkpoint
    _write_one(spark, pdf.iloc[half:], f"{feed}/b1.parquet", 1, 1_700_000_010)
    src2 = changefeed(spark, {"path": feed})
    q2 = (
        src2.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    out = sink.read_table(spark)
    assert out.count() == len(pdf)  # no loss
    assert out.select("conv_id", "turn_idx").distinct().count() == len(pdf)  # no dup


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    """Crash between sink write and offset commit ⇒ same (batch_df,
    batch_id) delivered again. The commit marker makes it a no-op."""
    pdf = generate_transcripts(n_convs=3, turns_per_conv=5)
    sink = MergeSink(str(tmp_path / "table"), n_partitions=2)
    sdf = spark.createDataFrame(pdf[["conv_id", "turn_idx", "role", "text", "tool", "ts"]])
    sink.process_batch(sdf, 7)
    first = sink.read_table(spark).toPandas().sort_values(["conv_id", "turn_idx"])
    sink.process_batch(sdf, 7)  # replay
    second = sink.read_table(spark).toPandas().sort_values(["conv_id", "turn_idx"])
    assert len(first) == len(pdf)
    assert first.reset_index(drop=True).equals(second.reset_index(drop=True))
    assert sink.status()["committed_batches"] == 1


def test_uncommitted_data_is_invisible(spark, tmp_path):
    """Crash AFTER data files, BEFORE the lineage marker: reader must
    not see the orphaned batch (commit-by-marker protocol)."""
    import shutil

    pdf = generate_transcripts(n_convs=2, turns_per_conv=4)
    sink = MergeSink(str(tmp_path / "table"), n_partitions=2)
    sdf = spark.createDataFrame(pdf[["conv_id", "turn_idx", "role", "text", "tool", "ts"]])
    sink.process_batch(sdf, 0)
    # simulate the torn write: batch 1 data present, marker missing
    sink.process_batch(sdf.withColumn("turn_idx", sdf.turn_idx + 1000), 1)
    shutil.rmtree(os.path.join(sink.lineage_dir, "batch_id=1"))
    out = sink.read_table(spark)
    assert out.count() == len(pdf)
    assert out.filter("turn_idx >= 1000").count() == 0
    # the replayed epoch then commits it for real
    sink.process_batch(sdf.withColumn("turn_idx", sdf.turn_idx + 1000), 1)
    assert sink.read_table(spark).count() == 2 * len(pdf)
