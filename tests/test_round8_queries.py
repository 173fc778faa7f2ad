"""Round-8 registry additions: semantic invariants beyond the DuckDB
hash-match (which tools/check_oracle.py covers tri-scale)."""

from __future__ import annotations

import math

from batch_processing_pipeline_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_preference_winrate_matrix_shape_and_bounds(spark):
    rows = QUERIES["preference_winrate"](spark, SF).collect()
    # 5 event types -> 10 unordered pairs, each once
    pairs = {(r.type_a, r.type_b) for r in rows}
    assert len(rows) == 10 and len(pairs) == 10
    for r in rows:
        assert r.type_a < r.type_b
        assert 0 <= r.wins_a <= r.n_comparisons
        assert 0.0 < r.winrate_a < 1.0  # Laplace smoothing forbids 0/1
        # logodds consistent with the smoothed winrate
        expect = math.log(r.winrate_a / (1.0 - r.winrate_a))
        assert abs(r.logodds_a - expect) < 5e-4


def test_pr_auc_eval_beats_base_rate(spark):
    r = QUERIES["pr_auc_eval"](spark, SF).collect()[0]
    base_rate = r.n_pos / r.n_eval
    # scores are label-shifted, so AP must clearly beat the random
    # baseline (= positive prevalence) and stay a valid probability
    assert 0.0 < base_rate < 1.0
    assert base_rate < r.average_precision <= 1.0


def test_annotator_kappa_in_meaningful_range(spark):
    r = QUERIES["annotator_kappa"](spark, SF).collect()[0]
    assert 0.0 < r.po <= 1.0 and 0.0 < r.pe < 1.0
    # the two length-driven annotators correlate positively but not
    # perfectly: kappa strictly between chance (0) and identity (1)
    assert 0.0 < r.kappa < 1.0


def test_curriculum_order_is_stratified_permutation(spark):
    rows = QUERIES["curriculum_order"](spark, SF).collect()
    n = len(rows)
    assert sorted(r.position for r in rows) == list(range(1, n + 1))
    by_stratum: dict[int, int] = {}
    for r in rows:
        by_stratum[r.stratum] = by_stratum.get(r.stratum, 0) + 1
    assert set(by_stratum) == {1, 2, 3, 4}
    assert max(by_stratum.values()) - min(by_stratum.values()) <= 1
    # round-robin: positions of stratum s are s, s+4, s+8, ...
    for r in rows:
        assert (r.position - r.stratum) % 4 == 0


def test_join_skew_audit_shares(spark):
    rows = QUERIES["join_skew_audit"](spark, SF).collect()
    assert [r.rank for r in rows] == list(range(1, 11))
    est = [r.est_pairs for r in rows]
    assert est == sorted(est, reverse=True)
    for r in rows:
        assert r.est_pairs == r.freq * r.freq
        assert 0.0 < r.share < 1.0
    assert sum(r.share for r in rows) < 1.0  # top-10 of a longer tail


def test_compaction_plan_conserves_mass(spark):
    from pyspark.sql import functions as F

    rows = QUERIES["compaction_plan"](spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    total = li.select(
        F.sum(F.floor("l_quantity").cast("long")).alias("t")
    ).collect()[0].t
    n_files = li.select("l_suppkey").distinct().count()
    assert sum(r.group_units for r in rows) == total
    assert sum(r.n_files for r in rows) == n_files
    # greedy packing in file-id order -> group file ranges never overlap
    spans = sorted((r.first_file, r.last_file, r.grp) for r in rows)
    for (a_lo, a_hi, _), (b_lo, b_hi, _) in zip(spans, spans[1:]):
        assert a_hi < b_lo


def test_bpe_compression_by_lang_ratios(spark):
    rows = QUERIES["bpe_compression_by_lang"](spark, SF).collect()
    assert len(rows) >= 2
    for r in rows:
        # BPE merges only ever shrink the token count below chars, and a
        # whitespace char never becomes a token
        assert 0 < r.tokens <= r.chars
        assert r.chars_per_token > 1.0


def test_hybrid_rrf_search_fuses_both_rankings(spark):
    rows = QUERIES["hybrid_rrf_search"](spark, SF).collect()
    assert [r.rank for r in rows] == list(range(1, 21))
    # RRF scores: valid bounds (two lists, rank >= 1 each) and descending
    for r in rows:
        assert 0.0 < r.rrf <= 2.0 / 61.0 + 1e-9
        expect = (1.0 / (60 + r.r_lex) if r.r_lex is not None else 0.0) + (
            1.0 / (60 + r.r_sem) if r.r_sem is not None else 0.0
        )
        assert abs(r.rrf - expect) < 5e-4
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)
    # the fusion must actually draw from both systems: some top rows
    # carry a lexical rank, some a semantic one
    assert any(r.r_lex is not None for r in rows)
    assert any(r.r_sem is not None for r in rows)


def test_distinct_ngram_ratio_bounds(spark):
    rows = QUERIES["distinct_ngram_ratio"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.d_uni <= r.n_uni
        assert 0 <= r.d_bi <= max(r.n_bi, 1)
        assert 0.0 < r.uni_ratio <= 1.0
        # template-generated fixture: bigram diversity must collapse
        # below unigram diversity per source... both are ratios in (0,1]
        assert 0.0 < r.bi_ratio <= 1.0


def test_snapshot_diff_partitions_the_keyspace(spark):
    from pyspark.sql import functions as F

    rows = {r.status: r for r in QUERIES["snapshot_diff"](spark, SF).collect()}
    assert set(rows) == {"added", "removed", "changed", "unchanged"}
    o = spark.read.parquet(f"{SF}/orders.parquet")
    n_keys = o.where(
        (F.col("o_orderkey") % 7 != 0) | (F.col("o_orderkey") % 5 != 0)
    ).count()
    assert sum(r.n for r in rows.values()) == n_keys
    # added = in new only (% 5 != 0 and % 7 == 0); changed = in both and % 3 == 0
    added = o.where(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 5 != 0)
    ).count()
    assert rows["added"].n == added
    assert rows["removed"].net_drift < 0 and rows["changed"].net_drift > 0
    assert rows["unchanged"].net_drift == 0.0


def test_split_leakage_detects_template_families(spark):
    rows = QUERIES["split_leakage"](spark, SF).collect()
    assert rows  # the template fixture MUST show cross-split leakage
    for r in rows:
        assert r.split_a < r.split_b
        assert {r.split_a, r.split_b} <= {"test", "train", "val"}
        # every leaking key contributes >= 1 doc to each side
        assert r.docs_a >= r.n_fingerprints
        assert r.docs_b >= r.n_fingerprints


def test_dedup_cluster_stats_conserves_corpus(spark):
    rows = QUERIES["dedup_cluster_stats"](spark, SF).collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    total = d.count()
    assert sum(r.n_docs for r in rows) == total
    assert abs(sum(r.corpus_share for r in rows) - 1.0) < 5e-3
    by_size = {r.cluster_size: r for r in rows}
    assert 1 in by_size  # singletons exist
    assert any(s > 1 for s in by_size)  # and so do real clusters
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters


def test_label_propagation_partitions_the_graph(spark):
    rows = QUERIES["label_propagation"](spark, SF).collect()
    assert len(rows) >= 2  # the <=3-parts-per-order graph must not collapse
    # communities partition the node set: sizes are positive, labels
    # unique, and the total node count matches the graph the query built
    assert len({r.label for r in rows}) == len(rows)
    for r in rows:
        assert r.community_size >= 1
        assert r.min_member <= r.max_member
        # a label is always some node id that existed in the graph
        # (labels only ever propagate, never get invented)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .withColumn("_osz", F.count(F.lit(1)).over(Window.partitionBy("l_orderkey")))
        .where(F.col("_osz") <= 3)
    )
    a, b = li.alias("a"), li.alias("b")
    nodes = {
        r.n
        for r in a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("n"))
        .distinct()
        .collect()
    }
    assert sum(r.community_size for r in rows) == len(nodes)
    assert all(r.label in nodes for r in rows)


def test_bfs_hops_ball_structure(spark):
    rows = sorted(QUERIES["bfs_hops"](spark, SF).collect(), key=lambda r: r.hop)
    hops = [r.hop for r in rows]
    # consecutive hop levels starting at the source
    assert hops == list(range(len(hops))) and len(hops) >= 2
    src = rows[0]
    assert src.n_nodes == 1 and src.min_node == src.max_node
    for r in rows:
        assert r.n_nodes >= 1 and r.min_node <= r.max_node
        # the source is the global min node, so no level can undercut it
        assert r.min_node >= src.min_node


def test_survival_curve_estimator_invariants(spark):
    rows = sorted(
        QUERIES["survival_curve"](spark, SF).collect(), key=lambda r: r.bucket
    )
    n_customers = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert rows[0].n_risk == n_customers
    assert sum(r.n_events + r.n_censored for r in rows) == n_customers
    ev = sum(r.n_events for r in rows)
    assert 0 < ev < n_customers  # real mix of events and censoring
    prev_h, prev_s, prev_risk = -1.0, 2.0, n_customers + 1
    for r in rows:
        assert 0 <= r.n_events <= r.n_risk
        assert r.n_risk < prev_risk  # every output bucket retires someone
        assert r.cum_hazard >= prev_h  # H non-decreasing
        assert r.survival <= prev_s  # S non-increasing
        assert 0.0 < r.survival <= 1.0
        assert abs(r.survival - math.exp(-r.cum_hazard)) < 5e-4
        prev_h, prev_s, prev_risk = r.cum_hazard, r.survival, r.n_risk
