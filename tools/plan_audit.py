"""Per-round physical-plan audit: the .explain evidence behind PLANS.md.

For a curated set of headline queries, capture the formatted plan and a
marker summary (scan pushdown, codegen spans, exchanges, join strategies,
Python eval operators) into one markdown artifact:

    python tools/plan_audit.py [--out PLAN_AUDIT_rN.md] [sf_dir] [query ...]

Default query set = a cross-section of operator families; the point is a
committed, diffable record that the plans the scale claims rest on are
the plans Spark actually runs — filters reach the parquet scan, joins
broadcast where dimension-sized, no Python eval on hot paths, and the
two-phase top-K stays planned.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: cross-section: scan+filter pushdown, window top-k, star join, dedup
#: funnel, ANN, streaming-adjacent rollup, text pipeline, skew handling
DEFAULT_QUERIES = [
    "dq02_filter",
    "dq07_join_inner",
    "dq13_topk_window",
    "dq28_autocomplete_e2e",
    "tpch_q5",
    "dedup_exact",
    "dedup_minhash",
    "incremental_dedup_near",
    "sim_topk_ivfpq",
    "salted_agg",
    "text_stats",
    "curriculum_order",
    "hybrid_rrf_search",
    "snapshot_diff",
    "label_propagation",
    # round-9 total-order family flagships
    "weighted_sample",
    "exact_quantiles",
    "bm25_search",
    "quantile_normalize",
    # round-10: per-stratum A-RES, the alloc->quota->sample composition,
    # and the last per-row window conversion
    "weighted_sample_per_group",
    "weighted_mix_sample",
    "pr_auc_eval",
]

MARKERS = [
    ("PushedFilters", r"PushedFilters: \[[^\]]"),
    ("PartitionFilters", r"PartitionFilters: \[[^\]]"),
    # codegen'd operators print as "*(n) Op" in the finalized tree
    # string; count distinct span ids
    ("WholeStageCodegen spans", r"\*\(\d+\)"),
    ("Exchange", r"(?<!Reused)Exchange"),
    ("ReusedExchange", r"ReusedExchange"),
    ("BroadcastHashJoin", r"BroadcastHashJoin"),
    ("SortMergeJoin", r"SortMergeJoin"),
    ("BroadcastNestedLoopJoin", r"BroadcastNestedLoopJoin"),
    ("CartesianProduct", r"CartesianProduct"),
    ("WindowGroupLimit", r"WindowGroupLimit"),
    ("ArrowEvalPython", r"ArrowEvalPython"),
    ("BatchEvalPython", r"BatchEvalPython"),
]


def main() -> int:
    argv = list(sys.argv[1:])
    out = "PLAN_AUDIT.md"
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            print("usage: plan_audit.py [--out PLAN_AUDIT_rN.md] [sf_dir] [query ...]")
            return 2
        out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    names = argv[1:] or DEFAULT_QUERIES

    from batch_processing_pipeline_spark import get_spark
    from batch_processing_pipeline_spark.registry import QUERIES

    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# Physical-plan audit",
        "",
        f"`sf_dir={sf_dir}`; markers counted on `executedPlan` after one",
        "materialization (so AQE's final plan is what is recorded).",
        "",
        "Counts are TEXTUAL occurrences in the plan string: under AQE,",
        "materialized subtrees reprint per stage, so large iterative or",
        "multi-branch plans inflate raw counts — `Exchange (distinct",
        "plan ids)` is the deduplicated number of physical shuffles /",
        "broadcasts; red-flag markers (CartesianProduct, BatchEvalPython)",
        "matter at ANY count.",
        "",
    ]
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        # collect() executes THIS DataFrame's QueryExecution, so the
        # adaptive plan below is the finalized one with "*(n)" codegen
        # annotations (a sink write would run a separate QueryExecution
        # and leave df's plan isFinalPlan=false and unannotated)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines.append(f"## {name}")
        lines.append("")
        lines.append("| marker | count |")
        lines.append("|---|---|")
        for label, pat in MARKERS:
            found = re.findall(pat, plan)
            n = len(set(found)) if label.endswith("spans") else len(found)
            lines.append(f"| {label} | {n} |")
        n_ex = len(set(re.findall(r"(?<!Reused)Exchange[^\n]*plan_id=(\d+)", plan)))
        lines.append(f"| Exchange (distinct plan ids) | {n_ex} |")
        # the registry-wide contract (tests/test_plan_sweep.py) on the
        # FINAL adaptive plan as well — the sweep test asserts it on the
        # initial plan; this records both agree
        from batch_processing_pipeline_spark.plancheck import plan_violations

        viol = plan_violations(plan)
        lines.append(f"| scale-contract violations | {len(viol)} |")
        for v in viol:
            lines.append(f"|   ↳ | {v[:160]} |")
        # the first FileScan line shows pushdown + pruned read schema
        scans = [
            ln.strip()[:300]
            for ln in plan.splitlines()
            if "FileScan parquet" in ln
        ][:3]
        if scans:
            lines.append("")
            lines.append("First scans (pushdown/pruning visible):")
            lines.append("")
            for s in scans:
                lines.append(f"    {s}")
        lines.append("")
        print(f"audited {name}")
        spark.catalog.clearCache()
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
