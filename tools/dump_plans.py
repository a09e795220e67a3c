"""Dump .explain("formatted") for declared queries (no execution).

Used for the plans/r06/<query>_{before,after}.txt deliverables: run it
once in a worktree pinned at the round-start commit (suffix=before)
and once on the final tree (suffix=after).

Usage:
    python tools/dump_plans.py OUT_DIR SUFFIX query [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default 32).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dstream_spark.queries import QUERIES  # noqa: E402
from dstream_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dstream_dump_plans", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
