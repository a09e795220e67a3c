"""Incremental LSH dedup ingest benchmark (the r4 protocol, now a
committed tool) with a bucket-pruning A/B.

Two regimes, matching how a 100-TB dedup index is actually exercised:

- **bulk**: N docs derived from the sf0.1 documents table ingested in
  M equal micro-batches; reports overall docs/s and per-epoch seconds
  (the r4 ad-hoc number: 591 -> 798 docs/s after the raw-read fix).
  A big batch touches every bucket, so pruning is neutral here by
  design — the equi-join on (band, band_hash) dominates.
- **trickle**: single-document batches probed against the ALREADY
  ingested index — the streaming steady state. This is where the hive
  bucket layout pays: a 1-doc batch touches <= BANDS(=4) of the 256
  bucket directories, so the pruned lookup's IO is constant in index
  size while the unpruned baseline (prune=False) re-reads the full
  index every probe.

Usage:
  python tools/inc_dedup_bench.py [--docs 100000] [--batches 10]
                                  [--trickle 12] [--cores 32]

Prints one JSON line with both regimes' numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dstream_spark.operators.incremental_dedup import (  # noqa: E402
    IncrementalLshDedup,
    slice_by_id,
)
from dstream_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpus(spark, n_docs: int, scratch: str) -> str:
    """Replicate the sf0.1 documents table to ``n_docs`` mostly-unique
    docs: every token of replica j is suffixed _rj (regexp, JVM-side),
    so replicas share no shingles and the index genuinely grows. Lands
    as parquet sorted by the new monotone doc_id (arrival order)."""
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_base = base.count()
    reps = max(1, (n_docs + n_base - 1) // n_base)
    out = os.path.join(scratch, "corpus")
    tag = F.concat(F.lit("_r"), F.col("rep").cast("string"))
    (
        base.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            # suffix EVERY token with _r<j>: replicas share no shingles,
            # so the index genuinely grows (pure JVM string expressions)
            F.concat(
                F.replace(F.col("text"), F.lit(" "), F.concat(tag, F.lit(" "))), tag
            ).alias("text"),
        )
        .filter(F.col("doc_id") < n_docs)
        .repartition(32)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--trickle", type=int, default=12)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark(app_name="inc_dedup_bench", cores=args.cores,
                      shuffle_partitions=args.cores)
    scratch = tempfile.mkdtemp(prefix="incbench_")
    sliced = None
    try:
        corpus_path = build_corpus(spark, args.docs, scratch)
        corpus = spark.read.parquet(corpus_path)
        n = corpus.count()
        hi = corpus.agg(F.max("doc_id")).first()[0]
        sliced = slice_by_id(corpus, args.batches).persist()
        sliced.count()

        d = IncrementalLshDedup(
            os.path.join(scratch, "idx"), os.path.join(scratch, "dups"),
            n_partitions=args.cores,
        )
        d.init()
        epoch_s = []
        t0 = time.monotonic()
        for b in range(args.batches):
            te = time.monotonic()
            d.process_batch(sliced.filter(F.col("_slice") == b).drop("_slice"), b)
            epoch_s.append(round(time.monotonic() - te, 2))
        bulk_s = time.monotonic() - t0
        n_dups = d.read_dups(spark).count()

        # trickle: 1-doc probes against the grown index, pruned vs not.
        # Probe docs are copies of indexed docs (a hit per probe).
        probes = [
            r["text"] for r in
            corpus.filter(F.col("doc_id") % (n // args.trickle) == 0)
            .orderBy("doc_id").limit(args.trickle).collect()
        ]

        def probe(prune: bool, id0: int, batch0: int) -> list[float]:
            dd = IncrementalLshDedup(
                os.path.join(scratch, "idx"), os.path.join(scratch, "dups"),
                n_partitions=args.cores, prune=prune,
            )
            times = []
            for j, text in enumerate(probes):
                tp = time.monotonic()
                dd.process_batch(
                    spark.createDataFrame([(id0 + j, text)],
                                          schema="doc_id long, text string"),
                    batch0 + j,
                )
                times.append(round(time.monotonic() - tp, 3))
            return times

        pruned_t = probe(True, int(hi) + 1, args.batches)
        unpruned_t = probe(False, int(hi) + 1000, args.batches + 1000)
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731

        print(json.dumps({
            "sf_dir": SF_DIR, "cores": args.cores, "docs": n,
            "bulk": {
                "batches": args.batches, "sec": round(bulk_s, 1),
                "docs_per_s": round(n / bulk_s, 1), "dups": n_dups,
                "epoch_s": epoch_s,
            },
            "trickle": {
                "probes": args.trickle,
                "pruned_s": pruned_t, "pruned_median_s": med(pruned_t),
                "unpruned_s": unpruned_t, "unpruned_median_s": med(unpruned_t),
            },
        }))
    finally:
        if sliced is not None:
            sliced.unpersist()
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
