"""Registry-wide scale-contract sweep → one committed markdown artifact.

The assertion form lives in ``tests/test_plan_sweep.py`` (fails CI); this
tool records the same sweep as diffable per-round evidence:

    python tools/plan_sweep.py [--out PLAN_SWEEP_rN.md] [sf_dir]

For every registry query it plans (never executes) the DataFrame at the
given scale dir and runs ``plancheck.plan_violations`` — no
CartesianProduct, no BatchEvalPython, every ``Exchange SinglePartition``
fed by a bounded subtree. Whitelisted queries (``plancheck.WHITELIST``,
the declared Python-UDF API demos) are listed with their reasons.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = list(sys.argv[1:])
    out = "PLAN_SWEEP.md"
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"

    from batch_processing_pipeline_spark import get_spark
    from batch_processing_pipeline_spark.plancheck import WHITELIST, plan_violations
    from batch_processing_pipeline_spark.registry import QUERIES

    spark = get_spark("plan-sweep", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    flagged: dict[str, list[str]] = {}
    clean = 0
    for name in sorted(QUERIES):
        if name in WHITELIST:
            continue
        df = QUERIES[name](spark, sf_dir)
        v = plan_violations(df._jdf.queryExecution().executedPlan().toString())
        if v:
            flagged[name] = v
        else:
            clean += 1
    dt = time.time() - t0

    lines = [
        "# Registry-wide physical-plan scale-contract sweep",
        "",
        f"`sf_dir={sf_dir}`; {len(QUERIES)} registry queries; planning only",
        f"(initial plan — AQE never introduces the banned shapes); {dt:.0f}s.",
        "",
        "Contract per plan: no `CartesianProduct`, no `BatchEvalPython`,",
        "and every `Exchange SinglePartition` bounded on the path to any",
        "file scan (aggregate / limit / two-phase-prune marker) — the",
        "predicate in `batch_processing_pipeline_spark/plancheck.py`,",
        "asserted per-commit by `tests/test_plan_sweep.py`.",
        "",
        f"**Clean: {clean} / {len(QUERIES) - len(WHITELIST)} checked."
        f" Violations: {len(flagged)}.**",
        "",
        "Whitelisted (declared exceptions, each verified to still flag):",
        "",
    ]
    for name, reason in sorted(WHITELIST.items()):
        lines.append(f"- `{name}` — {reason}")
    if flagged:
        lines += ["", "## VIOLATIONS", ""]
        for name, v in sorted(flagged.items()):
            lines.append(f"- `{name}`: {v}")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: clean={clean} flagged={len(flagged)}")
    spark.stop()
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
