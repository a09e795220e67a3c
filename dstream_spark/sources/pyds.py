"""Spark 4 Python DataSource: the reference's ingester micro-interface
certified at the PLUGIN-API level.

The reference defines ingesters as out-of-process plugins speaking a
micro-interface (SURVEY.md §2 C6; the engine's source registry is the
config-level analog). Spark 4 added the same extension point INSIDE
the engine: `pyspark.sql.datasource.DataSource`, a user-provided
source that plugs into `spark.read.format(...)` with its own schema,
partition planning, and per-partition reader — so a provider can be
written in pure Python and still get distributed, partitioned scans.

`FeedDataSource` reads the engine's ordered change-feed directory
(the `batch_*.parquet` commit files `_write_feed` lands,
streaming_queries.py): one InputPartition PER COMMIT FILE — partition
planning mirrors the feed's commit structure, so a 10^5-file feed
fans out to 10^5 tasks with no driver-side row handling — and each
task yields pyarrow RecordBatches (the Arrow fast path; never
per-row Python object conversion).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FEED_SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp_ntz, _change_type string, _commit_version bigint"
)
_COLS = [c.split()[0] for c in FEED_SCHEMA_DDL.split(", ")]


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _FeedReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self):
        import glob
        import os

        files = sorted(glob.glob(os.path.join(self.path, "batch_*.parquet")))
        if not files:
            raise FileNotFoundError(f"no commit files under {self.path}")
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        import pyarrow.parquet as pq

        f = pq.ParquetFile(partition.path)
        for batch in f.iter_batches():
            # project to the declared column order; the Arrow types
            # (int32, timestamp[us] no-tz) line up with the DDL
            yield batch.select(_COLS)


class FeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "dstream_feed"

    def schema(self) -> str:
        return FEED_SCHEMA_DDL

    def reader(self, schema) -> _FeedReader:
        return _FeedReader(self.options)
