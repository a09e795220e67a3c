"""Per-query isolation bench (guide §1.4) — NOT the frozen driver bench.

Times individual declared queries to a noop sink, optionally dumping
.explain("formatted") per query. Used by OPTIMIZATION_r06.md for
before/after evidence; bench.py stays the frozen measurement contract.

Usage:
    python bench_extra.py [--reps N] [--plans DIR] query [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dstream_spark.queries import QUERIES  # noqa: E402
from dstream_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir to write <query>.txt explain output")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{max(8, cores * 3 // 2)}g")
    spark = get_spark(app_name="dstream_bench_extra", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    # warm JVM / file cache so the first measured rep is not a cold outlier
    QUERIES["relay_identity"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in args.queries:
        q = QUERIES[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = q.fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(txt)
        samples = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}#{i}")
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "samples": samples,
            "min": min(samples),
            "median": round(statistics.median(samples), 3),
        }
        print(f"# {name}: min={out[name]['min']} median={out[name]['median']} {samples}",
              file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "cores": cores, "queries": out}))


if __name__ == "__main__":
    main()
