"""Physical-plan audit: assert the plans we want at 100 TB, not just
the ones that pass. Writes PLANS.md with the formatted plan per
headline query plus PASS/FAIL checks:

- filtered parquet scans carry PushedFilters (predicate pushdown)
- projected scans read only needed columns (ReadSchema pruning)
- dimension joins broadcast the small side (BroadcastHashJoin)
- aggregations are partial (two HashAggregate levels around the
  exchange — map-side combine)
- hot paths run inside WholeStageCodegen

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dstream_spark.queries import QUERIES  # noqa: E402
from dstream_spark.session import get_spark  # noqa: E402

# query → (must-contain substrings, explanation)
CHECKS: dict[str, list[tuple[str, str]]] = {
    "tpch_q1": [
        ("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate", "shipdate predicate reaches the scan"),
        ("codegen id", "agg pipeline is codegen'd (final AQE plan)"),
        ("HashAggregate", "hash aggregation with partial/final split"),
    ],
    "tpch_q3": [
        ("BroadcastHashJoin", "customer side broadcast"),
        ("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)", "segment filter pushed down"),
    ],
    "tpch_q5": [
        ("BroadcastHashJoin", "nation/region broadcast"),
    ],
    "tpch_q6": [
        ("PushedFilters:", "all four predicates pushed"),
        ("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate", "column pruning: 4 of 11 columns read"),
    ],
    "tumbling_counts": [
        ("HashAggregate", "partial aggregation before exchange"),
        # all six event columns are genuinely consumed by the derivation
        # (text uses value+props), so "pruned" = exactly the full set,
        # via one scan (no re-read)
        ("Scan parquet", "single parquet scan feeds the window"),
    ],
    "tool_correlation": [
        (("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"),
         "equi-key join on conv_id (strategy picked by size) with range post-filter"),
    ],
    "skew_salted_agg": [
        ("HashAggregate", "two-phase aggregate"),
    ],
    "docs_token_stats": [
        ("ReadSchema: struct<doc_id:bigint,text:string>", "only doc_id+text read"),
        ("codegen id", "string expressions codegen'd (final AQE plan)"),
    ],
    "emb_cosine_topk": [
        ("BroadcastNestedLoopJoin", "query side broadcast (non-equi condition)"),
    ],
    # the similarity pair queries — the verify must be the vectorized
    # block compare, never a row-at-a-time join (r6: the banding
    # equi-join generated MORE candidates than all-pairs at this
    # radius/width and emitted them through a sort-merge join at
    # ~100ns/row — see functions/dedup_text.simhash_near_dups)
    "docs_simhash_dups": [
        ("!CartesianProduct", "no cross-join plan"),
        ("!BroadcastNestedLoopJoin", "no nested-loop fallback"),
        ("!SortMergeJoin", "no row-at-a-time candidate join — verify is vectorized numpy popcount"),
        ("FlatMapGroupsInPandas", "triangle-block verify runs as one grouped Arrow pass"),
        ("REPARTITION_BY_NUM", "explicit block-key exchange — AQE byte-based coalescing "
         "must not serialize the quadratic compare work"),
    ],
    "docs_minhash_pairs": [
        ("!CartesianProduct", "no all-pairs cross join"),
        ("!BroadcastNestedLoopJoin", "no nested-loop fallback"),
        (("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"),
         "band-bucket equi-join"),
    ],
    "emb_ivf_topk": [
        ("!CartesianProduct", "candidates only within the centroid bucket"),
        ("BroadcastHashJoin", "query side broadcast into the bucket join"),
    ],
    "tpch_q10": [
        ("BroadcastHashJoin", "nation broadcast"),
    ],
    "docs_rolling_hash": [
        ("ReadSchema: struct<doc_id:bigint,text:string>", "only doc_id+text read"),
        ("!Exchange", "shuffle-free: one scan, per-row fold"),
    ],
    "emb_kmeans_step": [
        ("HashAggregate", "partial aggregation before the (c_id, pos) exchange"),
        ("!CartesianProduct", "centroid assign is a broadcast join"),
    ],
    "watermark_late_drop": [
        ("BroadcastNestedLoopJoin", "cutoff scalar broadcast, no shuffle of the big side"),
    ],
    "tpch_q7": [
        ("BroadcastHashJoin", "nation dimension broadcast (both aliases)"),
        ("!CartesianProduct", "nation-pair filter stays a post-join predicate"),
    ],
    "role_transitions": [
        ("HashAggregate", "edge counts partial-aggregate"),
        ("!SinglePartition", "transition fractions windowed per from_role, no global sort"),
    ],
    # training-data corpus-preparation ops (queries_llm.py)
    "docs_hash_split": [
        ("ReadSchema: struct<doc_id:bigint>", "identity-keyed split reads ONLY doc_id"),
        ("!Exchange", "shuffle-free projection — split is a pure hash"),
    ],
    "docs_repetition": [
        ("HashAggregate", "token counts partial-aggregate map-side"),
        ("!CartesianProduct", "no join at all"),
    ],
    "docs_pack_greedy": [
        ("Window", "running prefix-sum window"),
        ("!SinglePartition", "window pre-partitioned by shard — never a one-task global sort"),
    ],
    "docs_decontaminate": [
        ("BroadcastHashJoin", "eval shingles broadcast — map-side candidate join"),
        ("!CartesianProduct", "no all-pairs plan"),
        ("!SortMergeJoin", "the corpus side never shuffles for the join"),
    ],
    "emb_pq_topk": [
        ("BroadcastHashJoin", "codebook and ADC table ride broadcasts"),
        ("!SortMergeJoin", "no corpus-sized shuffle join"),
        ("!CartesianProduct", "never all-pairs"),
        ("!BroadcastNestedLoopJoin", "every join is an equi-join"),
    ],
    "scd2_build": [
        ("Window", "one lead() window per dimension key"),
        ("!SinglePartition", "history ordering is per-key, never a global sort"),
        ("!CartesianProduct", "no join at all — a single keyed window"),
    ],
    "docs_bloom_decontaminate": [
        ("LeftSemi", "Bloom probe is a broadcast LEFT SEMI — shingles drop map-side"),
        ("ShuffledHashJoin", "exact verify shuffles ONLY Bloom survivors"),
        ("!CartesianProduct", "no all-pairs plan"),
        ("!SortMergeJoin", "nothing degenerates to a full sort-merge"),
    ],
    # round-4 additions
    "docs_para_dedup": [
        # the exploded (doc_id, para_md5) table is MATERIALIZED once
        # (r4) — this plan scans it pruned; the documents text scan
        # happens in the materialization pass, not per branch
        ("ReadSchema: struct<doc_id:bigint,para_md5:string>", "pruned scan of the materialized hash table"),
        ("HashAggregate", "paragraph-hash counts partial-aggregate map-side"),
        ("!CartesianProduct", "count join is an equi-join on the 16-byte hash"),
        ("!BroadcastNestedLoopJoin", "no nested-loop fallback"),
    ],
    "docs_bpe_merged": [
        ("ReadSchema: struct<doc_id:bigint,text:string>", "only doc_id+text read"),
        ("codegen id", "merge replaces are codegen'd string expressions"),
        ("!CartesianProduct", "no join at all"),
    ],
    "cep_tool_retry": [
        ("Window", "lead() scan over (conv_id, turn_idx)"),
        ("!SinglePartition", "window partitioned by conv_id — linear at 10^12 turns"),
    ],
    "docs_pack_bpe": [
        ("Window", "running prefix-sum window over BPE budgets"),
        ("!SinglePartition", "window pre-partitioned by shard — never a one-task global sort"),
        ("codegen id", "merge-table replaces codegen'd (final AQE plan)"),
    ],
    "cep_followed_by": [
        ("Window", "lead-array scan over (conv_id, turn_idx)"),
        ("!SinglePartition", "window partitioned by conv_id — linear at 10^12 turns"),
        ("!SortMergeJoin", "skip-till-next-match WITHOUT a self-join: the N-turn lookahead is a lead() array"),
        ("!CartesianProduct", "no unbounded pair blowup"),
    ],
    "emb_ivf_trained_topk": [
        ("!CartesianProduct", "candidates only within the trained cell"),
        ("BroadcastHashJoin", "query side broadcast into the cell join"),
    ],
    "docs_inverted_index": [
        ("ObjectHashAggregate", "posting lists build with partial (map-side) aggregation"),
        ("!CartesianProduct", "one keyed exchange, no joins at all"),
        ("!SortMergeJoin", "index build is scan → explode → aggregate"),
    ],
    "docs_phrase_hits": [
        ("!CartesianProduct", "posting join is doc_id-keyed"),
    ],
    "docs_substr_dedup": [
        ("Window", "gaps-and-islands run scan, per-doc window"),
        ("!SinglePartition", "island scan partitioned by doc_id — linear at 10^9 docs"),
        ("!CartesianProduct", "dup detection is a hash-keyed count, never pairs"),
        ("HashAggregate", "window counts partial-aggregated"),
    ],
    "docs_lm_perplexity": [
        ("HashAggregate", "bigram/context counts partial-aggregated"),
        ("!CartesianProduct", "scalars ride 1-row broadcasts, no pair blowup"),
        ("codegen id", "the 39-step fixlog chain fuses into codegen"),
    ],
    "tool_triangles": [
        ("BroadcastHashJoin", "edge table broadcast into the node-iterator join"),
        ("!CartesianProduct", "canonical a<b<c: each triangle joined once"),
    ],
    "emb_ivfpq_topk": [
        ("BroadcastHashJoin", "codebook, query cells, and ADC table ride broadcasts"),
        ("!SortMergeJoin", "candidate restriction + ADC lookup are map-side"),
        ("!CartesianProduct", "never all-pairs"),
    ],
    "cep_not_followed_by": [
        ("Window", "inverted lead-array scan over (conv_id, turn_idx)"),
        ("!SinglePartition", "window partitioned by conv_id — linear at 10^12 turns"),
        ("!SortMergeJoin", "absence WITHOUT an anti-join: the N-turn lookahead is a lead() array"),
        ("!CartesianProduct", "no unbounded pair blowup"),
    ],
    "cep_one_or_more": [
        ("Window", "running-count + lag scan over (conv_id, turn_idx)"),
        ("!SinglePartition", "both windows partitioned by conv_id — linear at 10^12 turns"),
        ("!SortMergeJoin", "UNBOUNDED Kleene runs WITHOUT a self-join: run length is a count delta between consecutive non-B turns"),
        ("!CartesianProduct", "no pair blowup for arbitrarily long runs"),
    ],
    "docs_tfidf": [
        ("BroadcastHashJoin", "AQE broadcasts the vocab-sized df table into the tf join"),
        ("WindowGroupLimit", "the rn<=3 filter is pushed INTO the window as a group limit (partial top-k before the final sort)"),
        ("!CartesianProduct", "only the 1-row n_docs scalar rides a broadcast; no unkeyed pair join"),
    ],
    "cdc_commit_audit": [
        ("SortMergeJoin FullOuter", "reconciliation is ONE full-outer SMJ on the key, both sides shuffled once"),
        ("!CartesianProduct", "keyed diff, never a cross product"),
        ("Window", "latest-version-wins runs as a per-key window before the diff"),
    ],
    "docs_weighted_sample": [
        ("Window", "two-level salted top-k: shard window then survivor window"),
        ("!SinglePartition", "neither window sorts a whole language in one task"),
        ("!CartesianProduct", "sampling is a projection + windows, no join blowup"),
    ],
    "events_grouping_sets": [
        ("Expand", "GROUPING SETS lowers to one Expand over a single scan — the fact is read once"),
        ("HashAggregate", "partial-aggregated across the exchange"),
        ("!Union", "not three scans unioned"),
    ],
    "events_heavy_hitters": [
        ("BroadcastHashJoin", "the 256-cell sketch slices broadcast into per-row map-side probes"),
        ("!SortMergeJoin", "no key-space shuffle before the threshold filter drops the long tail"),
        ("HashAggregate", "raw cell deposit and the survivor exact count are partial-aggregated"),
    ],
    "tpch_q8": [
        ("BroadcastHashJoin", "all five dimensions broadcast into the lineitem fact"),
        ("!CartesianProduct", "no unkeyed join in the six-table chain"),
        ("HashAggregate", "CASE-sum share is a partial-aggregated rollup"),
    ],
    "tpch_q13": [
        ("LeftOuter", "exclusion predicate lives in the join condition, preserving zero-order customers"),
        ("HashAggregate", "double aggregation (per-customer, then distribution)"),
        ("!CartesianProduct", "keyed outer join"),
    ],
    "tpch_q21": [
        ("LeftSemi", "EXISTS as a semi join on l_orderkey"),
        ("LeftAnti", "NOT EXISTS as an anti join on l_orderkey"),
        ("!CartesianProduct", "the supplier inequality rides the order-key equi join, never a cross product"),
    ],
    "cep_alternation": [
        ("Window", "alternation is the same lead() scan with an IN predicate — no extra pass"),
        ("!SinglePartition", "window partitioned by conv_id"),
        ("!SortMergeJoin", "no self-join for the (B|C) branch"),
        ("!CartesianProduct", "no pair blowup"),
    ],
    "tool_temporal_enrich": [
        ("BroadcastHashJoin", "point-in-time lookup broadcasts the versioned dimension with the validity interval as residual"),
        ("!CartesianProduct", "the range predicate rides the broadcast equi-join on tool, never a cross product of facts x versions"),
        ("!SortMergeJoin", "no big-big shuffle join for a dimension lookup"),
    ],
    "conv_hll_distinct": [
        ("HashAggregate", "register build is a partial-aggregated groupBy (map-side combine to <=256 rows/group)"),
        ("codegen id", "md5/rho scalar pipeline is codegen'd"),
        ("!CartesianProduct", "sketch build never pairs rows"),
    ],
    "events_cms_counts": [
        ("BroadcastHashJoin", "the 256-cell sketch table broadcasts into the probe join"),
        ("HashAggregate", "cell deposit is a partial-aggregated sum"),
        ("!CartesianProduct", "depth fan-out is an explode, not a cross join"),
    ],
    "events_hist_quantiles": [
        ("Window", "rank scan is a bounded window over the <=128-row bin table, never a sort of raw values"),
        ("HashAggregate", "bin deposit is a partial-aggregated count"),
        ("!CartesianProduct", "quantile join-back is keyed on the group"),
    ],
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    out = ["# PLANS — physical-plan audit\n"]
    out.append(
        "Generated by `python tools/explain_audit.py` — asserts the plan\n"
        "properties that matter at 100 TB (pushdown, pruning, broadcast,\n"
        "partial agg, codegen) for each headline query.\n"
    )
    for name, checks in CHECKS.items():
        df = QUERIES[name].fn(spark, sf_dir)
        # execute THIS df once so AQE finalizes its own plan (codegen
        # ids + actual join strategies only appear on the final plan;
        # a noop write executes a copy and leaves df's plan unfinal)
        df.collect()
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted") \
            if hasattr(df, "_jdf") else ""
        if not plan:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        out.append(f"\n## {name}\n")
        for needle, why in checks:
            alts = needle if isinstance(needle, tuple) else (needle,)
            # "!Foo" = plan must NOT contain Foo (scale anti-patterns);
            # negated and positive needles evaluate independently, so a
            # mixed tuple means "none of the banned AND any of the rest"
            negated = [n[1:] for n in alts if n.startswith("!")]
            positive = [n for n in alts if not n.startswith("!")]
            ok = all(n not in plan for n in negated) and (
                not positive or any(n in plan for n in positive)
            )
            needle = alts[0]
            out.append(f"- {'PASS' if ok else 'FAIL'}: {why} (`{needle[:60]}...`)" if len(needle) > 60
                       else f"- {'PASS' if ok else 'FAIL'}: {why} (`{needle}`)")
            if not ok:
                failures.append((name, needle))
        out.append("\n```\n" + plan.strip()[:4000] + "\n```")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"{'FAIL' if failures else 'PASS'}: {len(failures)} failed checks")
    for name, needle in failures:
        print(f"  {name}: missing {needle!r}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
