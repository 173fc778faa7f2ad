"""Physical-plan scale contract, as a checkable predicate.

The r8/r9 round-over-round weak findings were all one shape: an
UNPARTITIONED window/sort whose input is corpus-sized, which Spark plans
as ``Exchange SinglePartition`` + a one-reducer Sort — correct at sf0.1,
a straggler at 100 TB. ``tools/plan_audit.py`` merely *counts* markers
for a curated set; this module turns the contract into a predicate the
test suite can assert over EVERY registry query (``tests/test_plan_sweep.py``),
so the class of defect cannot silently return.

The contract checked per plan string (``executedPlan().toString()`` —
the initial AQE plan is enough: AQE never introduces these shapes):

1. no ``CartesianProduct`` — an unpushed-down theta join over two
   corpus-sized sides never survives a scale-up;
2. no ``BatchEvalPython`` — row-at-a-time Python in any plan is the
   documented slow path (Arrow kernels print ``ArrowEvalPython`` and are
   allowed);
3. every ``Exchange SinglePartition`` must be fed by a BOUNDED subtree:
   on the path from the exchange down to any ``FileScan`` leaf there
   must be at least one row-count-bounding node — an Aggregate (the
   dimension-sized post-aggregation regime every whitelisted window in
   this repo sits on), a Limit/TakeOrdered, or the two-phase top-k prune
   (a Filter on ``monotonically_increasing_id``'s masked record number,
   ``operators/rank.py global_topk``). A single-partition exchange
   reading an unaggregated file scan is exactly the corpus-sized
   one-reducer sort the contract bans.

Heuristic honesty: "Aggregate below the exchange" treats any grouped
aggregate as dimension-sized. A ``groupBy(doc_id)`` feeding a global
window would pass this check while still being corpus-sized — the
per-query review (PLANS.md) still owns that judgment; this predicate
mechanizes the common case so regressions are caught without re-reading
300 plans by hand.
"""

from __future__ import annotations

import re

#: declared contract exceptions, each with the reason it does not apply —
#: the SINGLE source of truth for tests/test_plan_sweep.py and
#: tools/plan_sweep.py; additions need a docstring scale note on the
#: query itself, and the test suite verifies each entry still flags
#: (stale rows must be dropped)
WHITELIST = {
    # deliberate Python-UDF API-surface demo; corpus-scale arithmetic uses
    # built-in columns (docstring on q_udf_surface)
    "udf_surface": "declared row-at-a-time Python UDF API surface",
    # deliberate Python-UDTF (Spark 4 table function) API demo; the
    # codegen twin is top_bigrams / word_ngram_counts (docstring)
    "udtf_ngrams": "declared Python UDTF API surface",
}

#: tree-drawing prefix segments in SparkPlan.treeString output — each is
#: exactly 3 chars, so node depth = prefix length / 3
_PREFIX = re.compile(r"^((?:   |:  |\+- |:- )*)(.*)$")

#: nodes that bound the row count of everything above them
_BOUNDING = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate|Aggregate"
    r"|GlobalLimit|LocalLimit|CollectLimit|TakeOrdered"
    r"|monotonically_increasing_id"
)

#: leaves that read a (potentially) corpus-sized stored relation.
#: LocalTableScan / Scan ExistingRDD (createDataFrame literals, bounded
#: localCheckpoints) are deliberately NOT corpus leaves.
_CORPUS_LEAF = re.compile(r"FileScan|Scan parquet")

_SINGLE_PART = "Exchange SinglePartition"


def _parse(plan: str) -> list[tuple[int, str]]:
    out = []
    for line in plan.splitlines():
        m = _PREFIX.match(line)
        out.append((len(m.group(1)) // 3, m.group(2)))
    return out


def unbounded_single_partition_exchanges(plan: str) -> list[str]:
    """FileScan leaves reachable from an ``Exchange SinglePartition``
    with no bounding node on the path — each returned string is the
    offending scan line (truncated)."""
    nodes = _parse(plan)
    violations: list[str] = []
    for i, (d, text) in enumerate(nodes):
        if _SINGLE_PART not in text:
            continue
        path: list[tuple[int, str]] = []
        for j in range(i + 1, len(nodes)):
            dj, tj = nodes[j]
            if dj <= d:
                break
            while path and path[-1][0] >= dj:
                path.pop()
            if _CORPUS_LEAF.search(tj):
                if not any(_BOUNDING.search(pt) for _, pt in path):
                    violations.append(tj.strip()[:160])
            else:
                path.append((dj, tj))
    return violations


def plan_violations(plan: str) -> list[str]:
    """All scale-contract violations in one plan string."""
    out = []
    if "CartesianProduct" in plan:
        out.append("CartesianProduct")
    if "BatchEvalPython" in plan:
        out.append("BatchEvalPython (row-at-a-time Python UDF)")
    for scan in unbounded_single_partition_exchanges(plan):
        out.append(f"Exchange SinglePartition over unbounded scan: {scan}")
    return out
