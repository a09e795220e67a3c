"""Name the cause of the r1→r2 docs_minhash_bands regression
(3.58 s → 5.05 s at sf0.1, VERDICT r2 perf finding #3).

Two hypotheses, isolated:
  A. JVM pollution — r2's bench runs the streaming pipelines (feed
     build + 4.4M-event persists) BEFORE the batch queries; r1 ran
     batch first in a clean JVM.
  B. Conf leak — r2's batch queries accidentally ran at
     spark.sql.shuffle.partitions=cores (32) instead of the session
     default (64); fixed in bench.py this round.

Protocol: fresh JVM → time the query 3× under the session default →
optionally replay the r2 ordering (streams first) in the same JVM and
time again. Usage:

    python tools/minhash_regression_probe.py [--streams-first]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_query(spark, name: str, sf_dir: str, n: int = 3) -> list[float]:
    from dstream_spark.queries import QUERIES

    times = []
    for _ in range(n):
        t0 = time.time()
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams-first", action="store_true")
    ap.add_argument("--shuffle", type=int, default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    cores = 32
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{cores * 3 // 2}g")
    from dstream_spark.session import get_spark

    spark = get_spark(app_name="mh_probe", cores=cores, shuffle_partitions=args.shuffle)
    spark.sparkContext.setLogLevel("ERROR")

    result = {"shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions")}
    if args.streams_first:
        from dstream_spark.bench_pipeline import build_feed, run_dedup_sink

        feed = "/tmp/dstream_bench_feed_0.1_r40"
        build_feed(spark, args.sf_dir, feed, replicas=40, n_slices=16)
        run_dedup_sink(spark, feed, "/tmp/mh_probe_warm", n_partitions=cores)
        run_dedup_sink(spark, feed, "/tmp/mh_probe_run", n_partitions=cores)
        spark.conf.set("spark.sql.shuffle.partitions", result["shuffle_partitions"])
        result["streams_ran_first"] = True
    # warm the file cache / JIT once like bench.py does
    from dstream_spark.queries import QUERIES

    QUERIES["relay_identity"].fn(spark, args.sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    result["docs_minhash_bands"] = time_query(spark, "docs_minhash_bands", args.sf_dir)
    result["docs_minhash_pairs"] = time_query(spark, "docs_minhash_pairs", args.sf_dir, n=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
