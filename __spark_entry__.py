"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference pipeline distilled:
normalize → prefix fan-out → frequency → deterministic top-K) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator registry — one
entry per implemented operator from SURVEY.md §2.4 plus the LLM-pipeline
extensions — for the driver's DuckDB differential harness.

Ordering contract: the driver's correctness harness records a fixed-size
window from the FRONT of ``queries()`` (50 rows per round). Every
registry query is green under the local replica of that harness
(``tools/check_oracle.py`` — dtype-faithful since round 5; committed
evidence in ``ORACLE_r07.json``), but only windowed queries get an
independent driver-file row — so the dict is ordered deliberately, and
SELF-ROTATING since round 7 (the round-6 lesson: a window that needs a
manual edit every round eventually doesn't get one):

1. queries whose LATEST committed ``CORRECTNESS_r*.json`` row is red
   (any match flag false) — the most urgent re-checks — first;
2. the curated ``_WINDOW_R7`` priority list, minus anything a committed
   driver row already verified green;
3. every other oracle-able query with no driver row yet, in registry
   order;
4. driver-verified-green queries rotate to the back.

Because step 2/4 read the committed driver artifacts at import time,
each round's greens demote themselves before the next round runs — no
manual rotation needed. Rows-only queries (no oracle SQL) are excluded
from the window — they can only ever produce a ``no_oracle`` row,
wasting the slot (round-3 lesson).
"""

from __future__ import annotations

import functools
import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from batch_processing_pipeline_spark.registry import ORACLES, QUERIES


@functools.lru_cache(maxsize=1)
def _driver_records() -> dict[str, tuple[int, bool]]:
    """Latest driver record per query from committed CORRECTNESS_r*.json:
    name -> (round_checked, all_three_match_flags_green). Later rounds
    override earlier; round order is the PARSED round number, not
    filename sort — an unpadded r7 or a three-digit r100 must not let a
    stale verdict override the newest one. Unparseable files are
    skipped — the _PRIOR_GREEN literal below is the fallback for names
    with no parsed record. Memoized: the artifact set is immutable
    within a process."""
    here = os.path.dirname(os.path.abspath(__file__))
    rounds: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    records: dict[str, tuple[int, bool]] = {}
    for rnd, path in sorted(rounds):
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(doc, dict):
            continue
        for name, rec in doc.items():
            if isinstance(rec, dict) and "rows_match" in rec:
                records[name] = (
                    rnd,
                    bool(
                        rec.get("rows_match")
                        and rec.get("schema_match")
                        and rec.get("hash_match")
                    ),
                )
    return records


def _driver_verdicts() -> dict[str, bool]:
    """name -> latest green/red verdict (see _driver_records)."""
    return {n: ok for n, (_rnd, ok) in _driver_records().items()}

# Round-7 driver window: 50 of the 78 oracle-able queries with no driver
# CORRECTNESS row in any of rounds 1-6 (VERDICT r6 task #1). Ordered:
# composed funnels + round-5 flagships, the file-format round-trip suite,
# the eval/search/causal batch, then the statistics tail. No rows-only
# queries; everything here is green under the local strict harness.
_WINDOW_R7 = [
    # composed funnels + round-5 flagship additions (judge-named first)
    "mm_curation_pipeline", "spell_correct", "suggest_mrr",
    "winnowing_dup_pairs", "bootstrap_ci", "shapley_attribution",
    "url_normalize", "dq_expectations", "rolling_dau", "stl_decompose",
    "auc_eval", "ece_eval",
    # file-format / storage round-trip suite
    "csv_roundtrip", "orc_roundtrip", "jsonl_roundtrip",
    "partitioned_write", "schema_evolution", "managed_table",
    "csv_badrows",
    # eval / search / causal batch
    "forecast_eval", "suggest_rbo", "suggest_coverage", "bm25_search",
    "did_estimate", "qini_uplift", "stratified_ate", "langid_confusion",
    # statistics and sessionization tail
    "moments_merge", "full_outer_recon", "changepoint_binseg",
    "capture_recapture", "gini_concentration", "rendezvous_sharding",
    "evt_pot", "corr_matrix", "runs_test", "seasonal_strength",
    "session_entropy", "peak_detection", "power_analysis",
    "session_dwell", "error_budget", "keyword_trends", "neyman_alloc",
    "woe_iv", "group_split",
    # text-analysis / growth tail
    "vocab_coverage", "term_burstiness", "attribution", "cohort_ltv",
]

# Driver-verified in rounds 1–6 (union of CORRECTNESS_r01–r06 green
# keys) — rotate to the back of the dict.
_PRIOR_GREEN = {
    # round-5/6 window greens (CORRECTNESS_r05 == r06 keys, all green)
    "tpch_q12", "bpe_merge_candidates", "lateral_join",
    "tokenizer_fertility", "cumulative_reach", "inverted_index",
    "pretrain_pipeline", "cdc_apply", "semdedup", "sim_topk_filtered",
    "continuous_aggregate", "recursive_cte", "session_vars",
    "arrow_grouped", "xml_funcs", "collation_group", "approx_topk_types",
    "psi_drift", "embedding_audit", "dp_counts", "ab_welch",
    "sql_pipe", "param_sql", "regexp_extract_all", "bitwise_funcs",
    "chi2_independence", "holt_forecast", "unimax_alloc",
    "geo_grid_hotspots", "entity_resolution", "mm_audio",
    "gap_islands", "ks_test", "mannwhitney_u", "acf_daily", "zipf_fit",
    "kaplan_meier", "basket_lift", "pareto_abc", "mutual_info",
    "theil_sen", "mm_frames", "mm_video_avi", "ewma_smooth",
    "time_rollup", "cusum", "score_calibration", "decayed_counts",
    "benford_audit", "wow_growth",
    "dq01_scan_project", "dq02_filter", "dq03_normalize",
    "dq04_prefix_fanout", "dq05_agg_sum", "dq06_distinct", "dq07_join_inner",
    "dq08_join_multiway", "dq09_join_left_null", "dq10_semi_join",
    "dq11_anti_join", "dq12_theta_join", "dq13_topk_window",
    "dq14_analytic_window", "dq15_sort_limit", "dq16_setops", "dq17_rollup",
    "dq18_cube", "dq19_string_funcs", "dq20_datetime", "dq21_math",
    "dq22_conditional", "dq23_time_bucket", "dq24_sessionize", "dq25_json",
    "dq26_vector_dot", "dq27_exact_dedup", "dq28_autocomplete_e2e",
    "wordcount", "dedup_exact", "dedup_jaccard_pairs", "dedup_minhash",
    "dedup_simhash", "sim_topk", "sim_topk_lsh", "sim_topk_ivf",
    "text_stats", "text_langid", "text_fingerprint", "mm_stats", "mm_decode",
    "dq29_grouping_sets", "stats_aggs", "array_agg_ordered", "date_arith",
    "tfidf", "pivot", "unpivot", "percentiles", "udf_surface", "salted_agg",
    # round-3 window greens
    "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q13",
    "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19",
    "tpch_q20", "tpch_q21", "tpch_q22",
    "decontaminate", "contamination_report", "perplexity",
    "pmi_collocations", "doc_keywords", "pack_sequences",
    "equidepth_buckets", "scd2", "interval_join", "fuzzy_join", "skew_join",
    "cogrouped_asof", "rfm_scores", "hopping_window", "embed_centroid_dist",
    "kmeans_assign", "zorder_key", "mad_outliers", "edit_distance_pairs",
    "pandas_grouped_agg", "incremental_agg", "grouped_ols", "udtf_ngrams",
    # round-4 window greens (CORRECTNESS_r04.json)
    "asof_join", "bigram_lm", "boilerplate_ngrams", "char_entropy",
    "cms_topk", "containment_pairs", "curation", "curation_report",
    "curation_rules", "decontaminate_embedding", "dedup_clusters", "dedup_embedding",
    "dedup_survivorship", "doc_chunk", "domain_mix", "dsir_weights",
    "dup_spans", "event_pattern", "funnel", "global_shuffle",
    "hard_negatives", "locf_fill", "moving_median", "ngram_novelty",
    "pagerank", "pii_scrub", "ppjoin_pairs", "quantile_normalize",
    "retention", "sample_hash", "sample_stratified", "seasonal_outliers",
    "skipping_audit", "smb_join", "split_assign", "temperature_mix",
    "temporal_split", "text_repetition", "tfidf_cosine_pairs", "top_bigrams",
    "triangle_count", "user_paths", "variant_funcs", "weighted_median",
}

# Rows-only by declared design (no DuckDB oracle) — kept OUT of the
# window; a driver slot on them can only return ``no_oracle``.
_ROWS_ONLY_BACK = {
    "quality_lr_scores", "approx_percentiles", "approx_rfm_scores",
    "approx_mad_outliers",
}


@functools.lru_cache(maxsize=1)
def _ordered_names_cached() -> tuple[str, ...]:
    return tuple(_compute_ordered_names())


def _ordered_names() -> list[str]:
    return list(_ordered_names_cached())


def _compute_ordered_names() -> list[str]:
    verdicts = _driver_verdicts()

    def green(n: str) -> bool:
        if n in verdicts:
            return verdicts[n]  # latest driver row wins, red re-enters
        return n in _PRIOR_GREEN

    oracle_able = [n for n in QUERIES if ORACLES.get(n) is not None]
    reds = [n for n in oracle_able if verdicts.get(n) is False]
    curated = [
        n for n in _WINDOW_R7
        if n in QUERIES and n not in reds and not green(n)
    ]
    seen = set(reds) | set(curated)
    never_rest = [
        n for n in oracle_able if n not in seen and not green(n)
    ]
    seen |= set(never_rest)
    # back-fill: once every query is driver-green, extra window slots
    # should REFRESH the stalest evidence, not re-prove the same front of
    # the registry each round — oracle-able greens sort oldest-round
    # first; rows-only queries (which can only waste a slot) go last
    records = _driver_records()
    registry_pos = {n: i for i, n in enumerate(QUERIES)}
    back = sorted(
        (n for n in QUERIES if n not in seen),
        key=lambda n: (
            ORACLES.get(n) is None,  # rows-only last
            records.get(n, (0, True))[0],  # stalest evidence first
            registry_pos[n],
        ),
    )
    return reds + curated + never_rest + back


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["dq28_autocomplete_e2e"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's fixed-size correctness window lands on queries without a
    prior driver row (see module docstring)."""
    return {name: QUERIES[name] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; hash-dependent/approximate ops
    (MinHash/SimHash/LSH/sketches) are omitted → driver records rows-only
    checks."""
    return {
        name: ORACLES[name]
        for name in _ordered_names()
        if ORACLES.get(name) is not None
    }
