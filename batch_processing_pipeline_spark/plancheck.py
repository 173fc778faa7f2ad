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

Aggregate honesty (round-11, closing the documented blind spot): an
aggregate bounds the exchange above it ONLY when its grouping keys look
dimension-sized. A ``groupBy(doc_id)`` produces one output row per input
row — it bounds nothing — so grouping keys that are row-identifier-like
(``*_id``, ``id``, ``*key`` — the fixture tables' scaling identifiers:
doc_id, vec_id, event_id, o_orderkey, c_custkey, ...) disqualify the
aggregate as a bounding node. The two genuinely fixed-cardinality TPC-H
dims (nation/region keys: 25 and 5 rows at EVERY scale factor) are
excepted by name. Keys like lang / split / source / prefix / bucket /
cell pass — their cardinality is a vocabulary, not the corpus. The
negative case (planted ``groupBy(doc_id)`` + global window) is pinned in
tests/test_plan_sweep.py; residual honesty: a corpus-scaling key that is
neither id- nor key-named still slips through, and the per-query review
(PLANS.md) owns that tail.
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

#: nodes that bound the row count of everything above them UNCONDITIONALLY.
#: bloom_filter_agg: Spark's InjectRuntimeFilter builds its bloom via a
#: two-phase global aggregate whose SinglePartition exchange moves ONE
#: fixed-size sketch per map task — bounded by task count, not data. The
#: token (rather than the keys=[] aggregate rule) matters because the
#: bloom build is printed inside a Subquery block whose ``== Final Plan
#: ==`` headers defeat the tree-depth parser (observed round 12 when the
#: minhash pair checkpoint made the verify semi-join bloom-eligible).
_BOUNDING = re.compile(
    r"GlobalLimit|LocalLimit|CollectLimit|TakeOrdered"
    r"|monotonically_increasing_id|bloom_filter_agg"
)

#: aggregates bound CONDITIONALLY — see _agg_bounds
_AGG_KEYS = re.compile(
    r"(?:HashAggregate|SortAggregate|ObjectHashAggregate|Aggregate)"
    r"\(keys=\[(.*?)\](?:,|\))"
)

#: fixed-cardinality dimension identifiers: 25 nations / 5 regions at
#: every TPC-H scale factor — key-suffixed but NOT corpus-scaling. Any
#: prefix is accepted (n_nationkey, c_nationkey, s_nationkey,
#: n_regionkey, ...): foreign keys into a fixed dim are just as bounded.
_FIXED_DIM_SUFFIXES = ("nationkey", "regionkey")

#: column tokens inside an aggregate key list: `lang#45`, `doc_id#3L`
_KEY_NAME = re.compile(r"(\w+)#\d+")


def _scaling_name(name: str) -> bool:
    n = name.lower()
    if n.endswith(_FIXED_DIM_SUFFIXES):
        return False
    return n == "id" or n.endswith("_id") or n.endswith("key")


def _agg_bounds(node_text: str) -> bool | None:
    """None if the node is not an aggregate; True if it bounds (global
    agg or dimension-like keys); False if any grouping key is a
    row-identifier (one output row per input row — bounds nothing)."""
    m = _AGG_KEYS.search(node_text)
    if not m:
        return None
    blob = m.group(1).strip()
    if not blob:
        return True  # keys=[]: global aggregate, exactly one row
    if "monotonically_increasing_id" in blob:
        return False
    return not any(_scaling_name(n) for n in _KEY_NAME.findall(blob))

#: leaves that read a (potentially) corpus-sized stored relation.
#: LocalTableScan / plain Scan ExistingRDD (createDataFrame literals,
#: ad-hoc localCheckpoints) are deliberately NOT corpus leaves — BUT a
#: checkpoint produced by operators/rank.py's pinned range shuffle IS a
#: corpus-sized relation, and it tags itself with a plan-visible
#: ``__pinned_corpus__`` marker column (ExistingRDD scans don't prune,
#: so the marker always shows in the scan's schema). Matching the marker
#: closes the round-11 blind spot: a future query feeding a pinned
#: corpus straight into a single-partition exchange is now flagged by
#: this sweep instead of relying on per-query review.
_CORPUS_LEAF = re.compile(
    r"FileScan|Scan parquet|Scan ExistingRDD[^\n]*__pinned_corpus__"
)

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
    offending scan line (truncated).

    The plan string is walked per ``== Final/Initial Plan ==`` SEGMENT:
    a nested AdaptiveSparkPlan dump (e.g. a runtime bloom-filter
    subquery) prints its sections at indentation unrelated to the outer
    tree, so without the split the outer plan's next nodes parse as
    children of the dump's last exchange — observed round 12, where the
    bloom build's bounded SinglePartition exchange "adopted" the
    resuming semi-join subtree and flagged its corpus scan. Residual
    honesty: a dump interrupting a REAL violation's subtree lexically
    would split that path too (false negative); no in-repo plan has a
    subquery between a flagged exchange and its scan, and the planted
    negative in tests/test_plan_sweep.py keeps the detector honest."""
    out: list[str] = []
    for segment in re.split(r"^.*== (?:Final|Initial) Plan ==.*$", plan, flags=re.M):
        out.extend(_unbounded_sp_in_segment(segment))
    return out


def _unbounded_sp_in_segment(plan: str) -> list[str]:
    nodes = _parse(plan)
    violations: list[str] = []
    for i, (d, text) in enumerate(nodes):
        if _SINGLE_PART not in text:
            continue
        path: list[tuple[int, str]] = []
        prev = d
        for j in range(i + 1, len(nodes)):
            dj, tj = nodes[j]
            if dj <= d:
                break
            # In a REAL treeString, depth grows by EXACTLY 1 parent→child
            # (siblings repeat, returns shrink). A larger jump means the
            # text switched to a differently-indented region (a nested
            # AdaptiveSparkPlan/subquery dump boundary) — stop before
            # adopting unrelated nodes as this exchange's children.
            if dj > prev + 1:
                break
            prev = dj
            while path and path[-1][0] >= dj:
                path.pop()
            if _CORPUS_LEAF.search(tj):
                bounded = False
                for _, pt in path:
                    ab = _agg_bounds(pt)
                    if ab is True or (ab is None and _BOUNDING.search(pt)):
                        bounded = True
                        break
                if not bounded:
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
