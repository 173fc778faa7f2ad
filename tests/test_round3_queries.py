"""Property tests for the round-3 additions: CMS overestimate bound, EWMA
recursion equivalence, oriented triangle enumeration vs brute force, and
deterministic-shuffle invariants.  (Hash-vs-DuckDB equivalence is covered by
tools/check_oracle.py; these pin the semantic properties the hash can't.)"""

from __future__ import annotations

import itertools

from batch_processing_pipeline_spark.registry import QUERIES
from tests.conftest import SF_SMOKE


def test_cms_estimate_never_underestimates(spark):
    rows = QUERIES["cms_topk"](spark, SF_SMOKE).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.est >= r.true_cnt, f"CMS underestimated {r.word}"


def test_ewma_matches_recursive_definition(spark):
    rows = QUERIES["ewma_smooth"](spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    a = 0.3
    for seq in by_type.values():
        seq.sort(key=lambda r: r.day)
        s = seq[0].x
        assert abs(seq[0].ewma - s) < 1e-3
        for r in seq[1:]:
            s = a * r.x + (1 - a) * s
            # r.x is rounded to 4dp, so the recursion drifts ~1e-4/step
            assert abs(r.ewma - s) < 1e-2, (r.event_type, r.day)
            s = r.ewma  # re-anchor to the reported value


def test_triangles_match_bruteforce(spark):
    rows = QUERIES["triangle_count"](spark, SF_SMOKE).collect()
    got = {r.node: r.tri_cnt for r in rows}

    # brute-force the same thresholded co-occurrence graph in Python
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .collect()
    )
    by_order: dict[int, set] = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_suppkey)
    from collections import Counter

    cnt: Counter = Counter()
    for supps in by_order.values():
        for s1, s2 in itertools.combinations(sorted(supps), 2):
            cnt[(s1, s2)] += 1
    # kNN sparsifier: each node keeps its 5 strongest partners
    # (count desc, partner asc); an edge survives if EITHER side kept it
    nbrs: dict[int, list] = {}
    for (s1, s2), c in cnt.items():
        nbrs.setdefault(s1, []).append((-c, s2))
        nbrs.setdefault(s2, []).append((-c, s1))
    edges = set()
    for node, lst in nbrs.items():
        for _negc, other in sorted(lst)[:5]:
            edges.add((min(node, other), max(node, other)))
    adj: dict[int, set] = {}
    for s1, s2 in edges:
        adj.setdefault(s1, set()).add(s2)
    want: Counter = Counter()
    for x in sorted(adj):
        for y in sorted(adj[x]):
            for z in adj.get(y, ()):
                if z in adj[x]:
                    want[x] += 1
                    want[y] += 1
                    want[z] += 1
    assert got == dict(want)


def test_global_shuffle_is_deterministic_and_dense(spark):
    r1 = {r.doc_id: (r.shard, r.pos) for r in QUERIES["global_shuffle"](spark, SF_SMOKE).collect()}
    r2 = {r.doc_id: (r.shard, r.pos) for r in QUERIES["global_shuffle"](spark, SF_SMOKE).collect()}
    assert r1 == r2  # seeded: identical across runs
    # every shard's positions are 1..n with no gaps
    by_shard: dict[int, list] = {}
    for shard, pos in r1.values():
        assert 0 <= shard < 256
        by_shard.setdefault(shard, []).append(pos)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_ppjoin_equals_bruteforce(spark):
    """Prefix filtering is lossless: identical pair set to the O(n^2) join."""
    from batch_processing_pipeline_spark.operators.setsim import (
        allpairs_jaccard_bruteforce,
        ppjoin_pairs,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    for t in (0.5, 0.7, 0.9):
        got = {
            (r.id_a, r.id_b, round(r.jac, 6))
            for r in ppjoin_pairs(docs, threshold=t).collect()
        }
        want = {
            (r.id_a, r.id_b, round(r.jac, 6))
            for r in allpairs_jaccard_bruteforce(docs, threshold=t).collect()
        }
        assert got == want, f"threshold {t}"
        assert want, f"vacuous at threshold {t}"  # fixture must exercise it


def test_ppjoin_prefix_actually_prunes(spark):
    """At a high threshold the candidate join must examine strictly fewer
    pairs than all-pairs would — the filter's reason to exist.  Uses the
    operator's own prefix_candidates so the production formula is what's
    measured, not a test-local copy."""
    from batch_processing_pipeline_spark.operators.setsim import (
        prefix_candidates,
        token_sets,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    sets = token_sets(docs)
    n = sets.count()
    candidates = prefix_candidates(sets, threshold=0.9).count()
    assert candidates < n * (n - 1) / 2


def test_dsir_weights_favor_target_slice(spark):
    """Mean importance weight of 'en' docs must exceed the non-target mean —
    the defining property of importance weighting toward a target dist."""
    from batch_processing_pipeline_spark.registry import QUERIES

    w = QUERIES["dsir_weights"](spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang"
    )
    rows = w.join(docs, "doc_id").collect()
    en = [r.weight for r in rows if r.lang == "en"]
    other = [r.weight for r in rows if r.lang != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)


import pytest


@pytest.fixture(scope="module")
def pq_books(spark):
    from batch_processing_pipeline_spark.operators.pq import train_pq_codebooks

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    return train_pq_codebooks(emb, m=16, ksub=16, seed=42)


def test_pq_topk_recall_vs_bruteforce(spark, pq_books):
    """PQ+ADC with exact re-rank must recover >=80% of the true top-10 per
    query, and the re-ranked candidates' cosines must be exact."""
    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.operators.pq import pq_topk
    from batch_processing_pipeline_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    approx = pq_topk(queries, emb, pq_books, k=10, refine=50).collect()
    # pq_topk does not exclude the query's own vector; compare against the
    # same convention or one approx slot is always burned on the self-match
    exact = cosine_topk(queries, emb, k=10, exclude_self=False).collect()

    approx_by_q: dict[int, set] = {}
    for r in approx:
        approx_by_q.setdefault(r.query_id, set()).add(r.vec_id)
    exact_by_q: dict[int, set] = {}
    for r in exact:
        exact_by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(approx_by_q) == set(exact_by_q)
    recalls = {
        qid: len(approx_by_q[qid] & want) for qid, want in exact_by_q.items()
    }
    assert all(r >= 6 for r in recalls.values()), recalls
    assert sum(recalls.values()) / len(recalls) >= 7.5, recalls


def test_pq_code_shape_and_compression(spark, pq_books):
    from batch_processing_pipeline_spark.operators.pq import pq_encode

    books = pq_books
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    assert len(books) == 16 and all(len(b) == 16 for b in books)
    codes = pq_encode(emb, books).select("pq_code").collect()
    for r in codes:
        assert len(r.pq_code) == 16
        assert all(0 <= c < 16 for c in r.pq_code)


def test_dup_spans_positions_really_recur(spark):
    """Every flagged (doc, pos) must denote an 8-token window whose text
    occurs at least twice across the corpus — checked by re-extracting the
    raw text windows in Python."""
    from collections import Counter

    rows = QUERIES["dup_spans"](spark, SF_SMOKE).collect()
    assert rows  # fixture corpus is template-generated: must be non-vacuous
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
        if r.text and r.text.strip()
    }
    windows: Counter = Counter()
    spans_by_doc: dict[int, list] = {}
    for doc_id, text in docs.items():
        toks = text.strip().lower().split()
        spans_by_doc[doc_id] = [
            " ".join(toks[i : i + 8]) for i in range(len(toks) - 7)
        ]
        windows.update(spans_by_doc[doc_id])
    for r in rows:
        span = spans_by_doc[r.doc_id][r.pos - 1]  # pos is 1-based
        assert windows[span] == r.occurrences
        assert r.occurrences > 1


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_new_query_plan_shapes(spark):
    """Scale-shape guards for the round-3 additions: no Cartesian products
    where an equi-join is intended, broadcasts where dims are bounded."""
    # ppjoin: candidate generation is an equi-join on prefix tokens —
    # a CartesianProduct would mean the filter degenerated to all-pairs
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    from batch_processing_pipeline_spark.operators.setsim import ppjoin_pairs

    assert "CartesianProduct" not in _plan(ppjoin_pairs(docs, threshold=0.9))

    # dsir: both distribution relations must broadcast (256 rows)
    plan = _plan(QUERIES["dsir_weights"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    # cms: sketch probe joins broadcast; no shuffle beyond the two groupBys
    plan = _plan(QUERIES["cms_topk"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan

    # ewma: exactly one Window operator — the closed form must not
    # introduce per-lag self-joins
    plan = _plan(QUERIES["ewma_smooth"](spark, SF_SMOKE))
    assert plan.count("Window") >= 1
    assert "Join" not in plan

    # global_shuffle: no global sort — ordering is per-shard (window),
    # so no rangepartitioning-based Sort/Exchange over the whole corpus
    plan = _plan(QUERIES["global_shuffle"](spark, SF_SMOKE))
    assert "rangepartitioning" not in plan.lower().replace(" ", "")


def test_ppjoin_ceil_boundary_threshold_is_lossless(spark):
    """Regression: 0.55*100 == 55.000000000000007 in IEEE double — a naive
    ceil gives 56 and shortens the prefix below the lossless minimum,
    silently dropping qualifying pairs. Pin the formula against exact
    rational arithmetic for known-overshooting (t, n) pairs, then run an
    overshoot-prone threshold end-to-end against brute force."""
    from batch_processing_pipeline_spark.operators.setsim import (
        allpairs_jaccard_bruteforce,
        ppjoin_pairs,
        prefix_length,
    )

    # formula-level: every (t, n) with an exactly-integer product must
    # yield the same prefix as exact rational arithmetic
    from fractions import Fraction
    import math

    for t, n in [(0.55, 100), (0.68, 75), (0.68, 150), (0.81, 300), (0.9, 10)]:
        exact = n - math.ceil(Fraction(t).limit_denominator(1000) * n) + 1
        assert prefix_length(n, t) == exact, (t, n)

    # end-to-end at an overshoot-prone threshold
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    got = {
        (r.id_a, r.id_b) for r in ppjoin_pairs(docs, threshold=0.55).collect()
    }
    want = {
        (r.id_a, r.id_b)
        for r in allpairs_jaccard_bruteforce(docs, threshold=0.55).collect()
    }
    assert got == want
    assert want


def test_bucketed_reuse_rejects_mismatched_spec(spark, tmp_path):
    """reuse=True must NOT silently keep a table whose bucket layout
    differs from the request — that would break the no-Exchange property."""
    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.operators.bucketed import write_bucketed

    df = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") % 3).alias("v"))
    write_bucketed(df, "t_reuse_spec", str(tmp_path / "a"), ["k"], 4, sort_cols=["k"])
    # same spec → reused (no error, still 4 buckets)
    write_bucketed(df, "t_reuse_spec", str(tmp_path / "a"), ["k"], 4,
                   sort_cols=["k"], reuse=True)
    meta = {r["col_name"]: r["data_type"]
            for r in spark.sql("DESCRIBE EXTENDED t_reuse_spec").collect()}
    assert meta["Num Buckets"].strip() == "4"
    # different bucket count → rewritten, not reused
    write_bucketed(df, "t_reuse_spec", str(tmp_path / "b"), ["k"], 8,
                   sort_cols=["k"], reuse=True)
    meta = {r["col_name"]: r["data_type"]
            for r in spark.sql("DESCRIBE EXTENDED t_reuse_spec").collect()}
    assert meta["Num Buckets"].strip() == "8"
    spark.sql("DROP TABLE IF EXISTS t_reuse_spec")
