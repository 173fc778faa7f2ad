"""Marginal scaling exponent of the two-phase Zipf top-K.

The `topk_zipf_twophase` rehearsal row times the WHOLE pipeline —
including evaluating the synthetic Zipf relation itself (pure-codegen
range arithmetic, but linear in n by construction). Any full-scan
operator therefore measures e -> 1 asymptotically no matter how
sub-linear the operator's own work is; r11/r12 flagged e≈1.07-1.10 and
could only argue (not show) that the top-K added nothing super-linear.

This tool separates the two: at each decade it times

  t_scan  — noop write of the bare fixture (the mandatory linear part)
  t_topk  — noop write of two-phase top_k_per_group over the same fixture

and reports the MARGINAL cost (t_topk - t_scan) with its per-decade
exponent. The operator's own claim ("map-side WindowGroupLimit bounds
reducer input at k × n_input_partitions rows, hot key or not") predicts
the marginal cost grows with the number of distinct (prefix, limit)
survivors — ~constant here (998 prefixes × k × partitions) — so the
marginal exponent should sit well under 1 even while the end-to-end row
reads ~linear.

Usage:  python tools/zipf_marginal.py [--runs 3]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from batch_processing_pipeline_spark import get_spark  # noqa: E402
from batch_processing_pipeline_spark.fixtures import zipf_prefix_fixture  # noqa: E402

NS = [3_000_000, 30_000_000, 300_000_000]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--runs", type=int, default=3)
    args = p.parse_args()

    spark = get_spark(
        "zipf-marginal",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def t_scan(n: int) -> float:
        t0 = time.time()
        zipf_prefix_fixture(spark, n=n, num_partitions=32).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.time() - t0

    rows = []
    for n in NS:
        ts = min(t_scan(n) for _ in range(args.runs))
        tk = min(
            bench._bench_topk_skew_n(spark, naive=False, n=n)
            for _ in range(args.runs)
        )
        # the production-sizing regime: partitions ∝ n (~1M rows each),
        # the shape a file scan's maxPartitionBytes would deliver
        scaled_parts = max(32, n // 1_000_000)
        tp = min(
            bench._bench_topk_skew_n(
                spark, naive=False, n=n, parts=scaled_parts
            )
            for _ in range(args.runs)
        )
        rows.append((n, ts, tk, tk - ts, tp))
        print(f"n={n:>11,}  scan={ts:7.3f}s  topk@32={tk:7.3f}s  "
              f"marginal={tk - ts:7.3f}s  topk@{scaled_parts}={tp:7.3f}s",
              flush=True)

    for (n0, _, tk0, d0, tp0), (n1, _, tk1, d1, tp1) in zip(rows, rows[1:]):
        e_total = math.log10(tk1 / tk0)
        e_marg = math.log10(d1 / d0) if d0 > 0 and d1 > 0 else float("nan")
        e_sized = math.log10(tp1 / tp0)
        print(f"decade {n0:,} -> {n1:,}:  e_total@32parts={e_total:.2f}  "
              f"e_marginal@32parts={e_marg:.2f}  e_sized_parts={e_sized:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
