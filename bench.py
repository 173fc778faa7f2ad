"""Per-round benchmark: headline queries + the end-to-end pipeline at sf0.1.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from batch_processing_pipeline_spark import get_spark
from batch_processing_pipeline_spark.registry import QUERIES

#: Headline set: one per operator family — scans/filters, aggregation,
#: joins (broadcast star + shuffle), window top-K, sessionization, the full
#: reference pipeline, dedup (exact + LSH), similarity, text analysis.
HEADLINE = [
    "dq02_filter",
    "dq05_agg_sum",
    "dq07_join_inner",
    "dq08_join_multiway",
    "dq12_theta_join",
    "dq13_topk_window",
    "dq14_analytic_window",
    "dq17_rollup",
    "dq20_datetime",
    "dq23_time_bucket",
    "dq24_sessionize",
    "dq26_vector_dot",
    "dq28_autocomplete_e2e",
    "wordcount",
    "dedup_exact",
    "sim_topk",
    "sim_topk_lsh",
    "text_stats",
    "tfidf",
    "salted_agg",
    "mm_stats",
    "sample_hash",
    "domain_mix",
    "cap_per_group",
    "pii_scrub",
    "top_bigrams",
    # heaviest (and cache-persisting) queries last so their GC debt can't
    # bleed into the cheap queries' timings
    "text_fingerprint",
    "dedup_minhash",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    spark = get_spark(
        "bpp-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    total = 0.0
    def run_once(fn) -> float:
        # time build + execute: some operators materialize persisted
        # intermediates eagerly at build time, which must count
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for name in HEADLINE:
        fn = QUERIES[name]
        dt = run_once(fn)
        if dt > 2.0:
            # slow result: rerun once and keep the best — single-shot
            # timings on a shared host are dominated by GC/scheduler noise
            dt = min(dt, run_once(fn))
        dt = round(dt, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)
        # operators persist compact intermediates; drop them (and collect
        # the garbage NOW) so queries don't inherit each other's heap debt
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001

    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
