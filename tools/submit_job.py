"""spark-submit entrypoint for the north-star CDC pipeline.

Cluster deployment path (north rule: "run via spark-submit --py-files
on a multi-executor cluster"):

    cd /root/repo && zip -r /tmp/dstream_spark.zip dstream_spark
    spark-submit --master <cluster> --py-files /tmp/dstream_spark.zip \
        tools/submit_job.py --feed <dir> --work <dir> [--cores-hint N]

Runs changefeed → text transforms → stateful dedup → exactly-once
MergeSink and prints one JSON result line.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--feed", required=True)
    ap.add_argument("--work", required=True)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--files-per-trigger", type=int, default=4)
    args = ap.parse_args()

    # session comes from spark-submit's conf; we only attach engine code
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from dstream_spark.bench_pipeline import run_dedup_sink

    res = run_dedup_sink(
        spark,
        args.feed,
        args.work,
        n_partitions=args.partitions,
        files_per_trigger=args.files_per_trigger,
    )
    print("SUBMIT_RESULT " + json.dumps(res))


if __name__ == "__main__":
    main()
