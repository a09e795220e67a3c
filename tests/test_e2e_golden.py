"""SURVEY §5.5 item 8 — the reference's e2e golden-count scenario
(test/e2e/e2e_test.go:224-259: insert 3 Persons + 3 Cars, expect
exactly 6 CDC events): two conversations x three turns streamed
through the full pipeline land EXACTLY 6 rows in the sink, 3 per
conversation, in turn order."""

from __future__ import annotations

import datetime as dt

from dstream_spark.fixtures.transcripts import write_changefeed_batches
from dstream_spark.sinks.merge import MergeSink
from dstream_spark.streaming.pipeline import Pipeline


def test_e2e_golden_six_rows(spark, tmp_path):
    import pandas as pd

    t0 = dt.datetime(2024, 3, 1, 9, 0, 0)
    rows = [
        ("person", i, "user", f"person turn {i}", None, t0 + dt.timedelta(seconds=30 * i))
        for i in range(3)
    ] + [
        ("car", i, "agent", f"car turn {i}", None, t0 + dt.timedelta(seconds=30 * i + 5))
        for i in range(3)
    ]
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    feed = str(tmp_path / "feed")
    write_changefeed_batches(spark, pdf, feed, n_batches=2)

    sink = MergeSink(str(tmp_path / "tbl"), n_partitions=2)
    pipe = Pipeline(
        spark,
        {
            "name": "golden6",
            "source": {"type": "changefeed", "path": feed, "max_files_per_trigger": 1},
            "sink": {"type": "merge", "sink": sink},
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "trigger": {"availableNow": True},
        },
    )
    pipe.init()
    q = pipe.run()
    q.awaitTermination()
    pipe.stop()

    out = sink.read_table(spark)
    assert out.count() == 6  # the golden count
    per_conv = {r.conv_id: r.n for r in out.groupBy("conv_id").count().withColumnRenamed("count", "n").collect()}
    assert per_conv == {"person": 3, "car": 3}
    # ordered delivery: per-turn text equality under (conv_id, turn_idx)
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in out.select("conv_id", "turn_idx", "text").collect()
    }
    for conv_id, turn_idx, _role, text, _tool, _ts in rows:
        assert got[(conv_id, turn_idx)] == text
