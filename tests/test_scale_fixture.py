"""The scale-fixture generator's invariants — the scaling rehearsal's
evidence (PLANS.md round-11) is only as good as the fixture's shape, so
the shape claims are pinned: replication preserves the documents table's
exact-duplicate RATE (word rotation keeps within-copy dup structure and
does not link copies), and every foreign key stays valid (the full
oracle harness must be runnable on the output)."""

from __future__ import annotations

import duckdb
import pytest

from tools.make_scale_fixture import _LOWER, _UPPER, _copy_perms, build

SRC = "/root/testdata/sf0.001"
K = 3


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scalefix") / f"k{K}")
    build(SRC, out, K)
    return out


def test_row_counts_scale_by_k(fixture_dir):
    con = duckdb.connect()
    for t in ("customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"):
        n_src = con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        n_out = con.execute(
            f"SELECT count(*) FROM read_parquet('{fixture_dir}/{t}.parquet')"
        ).fetchone()[0]
        assert n_out == K * n_src, t
    for t in ("region", "nation"):  # fixed dims are NOT replicated
        n_src = con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        n_out = con.execute(
            f"SELECT count(*) FROM read_parquet('{fixture_dir}/{t}.parquet')"
        ).fetchone()[0]
        assert n_out == n_src, t


def test_documents_dup_rate_preserved_and_copies_unlinked(fixture_dir):
    """Word rotation must keep each copy's internal exact-dup structure
    (dup rate identical to the source) and must NOT create cross-copy
    exact duplicates (which would fabricate K-sized dup cliques and a
    super-linear candidate-pair exponent)."""
    con = duckdb.connect()

    def dup_rate(path):
        tot, uniq = con.execute(
            f"SELECT count(*), count(DISTINCT text) "
            f"FROM read_parquet('{path}')"
        ).fetchone()
        return (tot - uniq) / tot, tot, uniq

    src_rate, src_tot, src_uniq = dup_rate(f"{SRC}/documents.parquet")
    out_rate, out_tot, out_uniq = dup_rate(f"{fixture_dir}/documents.parquet")
    # distinct texts scale by exactly K <=> no cross-copy collisions AND
    # within-copy dup structure preserved
    assert out_uniq == K * src_uniq, (out_uniq, src_uniq)
    assert abs(out_rate - src_rate) < 1e-12


def test_foreign_keys_stay_valid(fixture_dir):
    con = duckdb.connect()
    checks = [
        ("orders o", "o.o_custkey", "customer c", "c.c_custkey"),
        ("lineitem l", "l.l_orderkey", "orders o", "o.o_orderkey"),
        ("lineitem l", "l.l_partkey", "part p", "p.p_partkey"),
        ("lineitem l", "l.l_suppkey", "supplier s", "s.s_suppkey"),
        ("customer c", "c.c_nationkey", "nation n", "n.n_nationkey"),
    ]
    for fact, fk, dim, pk in checks:
        ft, dt = fact.split()[0], dim.split()[0]
        orphans = con.execute(
            f"SELECT count(*) FROM read_parquet('{fixture_dir}/{ft}.parquet') {fact.split()[1]} "
            f"LEFT JOIN read_parquet('{fixture_dir}/{dt}.parquet') {dim.split()[1]} "
            f"ON {fk} = {pk} WHERE {pk} IS NULL"
        ).fetchone()[0]
        assert orphans == 0, (fk, pk, orphans)


def test_value_distributions_unchanged(fixture_dir):
    """Replication must not shift per-column distributions (the quantile
    / aggregate targets): each copy is the source, so every quantile of
    a value column is identical."""
    con = duckdb.connect()
    for col, tbl in (("l_extendedprice", "lineitem"), ("o_totalprice", "orders")):
        q_src = con.execute(
            f"SELECT quantile_cont({col}, [0.1,0.5,0.9]) "
            f"FROM read_parquet('{SRC}/{tbl}.parquet')"
        ).fetchone()[0]
        q_out = con.execute(
            f"SELECT quantile_cont({col}, [0.1,0.5,0.9]) "
            f"FROM read_parquet('{fixture_dir}/{tbl}.parquet')"
        ).fetchone()[0]
        # quantile_cont interpolates at fractional indices that shift by
        # float rounding when the row count scales — identical multisets,
        # ~1e-10 relative noise
        assert q_out == pytest.approx(q_src, rel=1e-9), (col, q_src, q_out)


def test_cross_copy_token_sets_unlinked(fixture_dir):
    """The first sf1 run's lesson: rotation alone preserves token SETS,
    so word-set-Jaccard operators (ppjoin_pairs, the pretrain near-dup
    stage) saw K-member cross-copy cliques — an O(K²) fabricated pair
    explosion. The per-copy letter-rotation cipher (r12) must push
    cross-copy set Jaccard far below every production threshold (only
    stopwords and digit runs stay shared), while keeping each copy's
    INTERNAL set-similarity structure bijective to the source."""
    con = duckdb.connect()
    # cross-copy: same source doc, copies (0,1) and (1,2) — J must be
    # well under the tightest production threshold (0.9, pretrain)
    rows = con.execute(
        f"""
        WITH d AS (
          SELECT doc_id % 100000000 AS src_id, doc_id // 100000000 AS copy,
                 list_distinct(string_split(text, ' ')) AS toks
          FROM read_parquet('{fixture_dir}/documents.parquet')
          WHERE doc_id // 100000000 IN (0, 1, 2)
        )
        SELECT a.copy, b.copy,
               MAX(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.toks, b.toks))))
        FROM d a JOIN d b
          ON a.src_id = b.src_id AND a.copy + 1 = b.copy
        WHERE a.src_id < 200  -- bounded sample, deterministic
        GROUP BY a.copy, b.copy
        """
    ).fetchall()
    assert rows, "no cross-copy pairs sampled"
    for ca, cb, max_j in rows:
        assert max_j < 0.75, (ca, cb, max_j)
    # within-copy: suffixing is a word bijection, so copy 1's internal
    # exact-dup count must equal copy 0's (already covered by the
    # dup-rate test) AND its set-similarity structure must match: the
    # number of within-copy identical TOKEN SETS equals the source's
    n_same = {}
    for copy in (0, 1):
        n_same[copy] = con.execute(
            f"""
            WITH d AS (
              SELECT list_sort(list_distinct(string_split(text, ' '))) AS toks
              FROM read_parquet('{fixture_dir}/documents.parquet')
              WHERE doc_id // 100000000 = {copy}
            )
            SELECT COUNT(*) - COUNT(DISTINCT toks) FROM d
            """
        ).fetchone()[0]
    assert n_same[1] == n_same[0], n_same


def test_cross_copy_char_grams_unlinked(fixture_dir):
    """The round-11 honest-density gap: the ~25% vocabulary suffixing
    left most CHAR-5-GRAMS shared across copies, so char-shingle MinHash
    banding and winnowing fingerprints linked copy families — 460M
    fabricated candidate pairs at sf1 and a fake super-linear
    dedup_minhash exponent. The letter-rotation cipher must push
    cross-copy char-gram Jaccard near zero (residual overlap: grams
    fully inside stopword/space/digit runs), so near-dup DENSITY is
    constant across copies and scaling exponents measure the OPERATOR,
    not the fixture."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH d AS (
          SELECT doc_id % 100000000 AS src_id, doc_id // 100000000 AS copy,
                 text
          FROM read_parquet('{fixture_dir}/documents.parquet')
          WHERE doc_id // 100000000 IN (0, 1, 2)
            AND doc_id % 100000000 < 200 AND length(text) >= 5
        ), g AS (
          SELECT src_id, copy,
                 list_distinct(
                   [text[j:j+4] FOR j IN range(1, length(text) - 3)]
                 ) AS grams
          FROM d
        )
        SELECT a.copy, b.copy,
               MAX(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.grams, b.grams))))
        FROM g a JOIN g b ON a.src_id = b.src_id AND a.copy + 1 = b.copy
        GROUP BY a.copy, b.copy
        """
    ).fetchall()
    assert rows, "no cross-copy pairs sampled"
    for ca, cb, max_j in rows:
        # minhash_lsh_dedup's loosest production threshold is 0.5; the
        # cipher keeps cross-copy gram overlap an order of magnitude under
        assert max_j < 0.10, (ca, cb, max_j)


def test_copy_perms_distinct_at_any_k():
    """The sixth-decade prerequisite: rotation has only 25 distinct
    non-identity values, so k=100 copies i and i+25 shared a cipher
    (bounded 4-member classes) and k=1000 would fabricate 40-member
    cross-copy near-dup cliques. ``_copy_perms`` must (a) keep the
    historical rotations for copies 1–25 (committed-artifact
    reproducibility), (b) be a valid letter bijection per copy, and
    (c) be pairwise distinct across ALL copies at k=1000 — so no two
    copies anywhere share a cipher and cross-copy char-gram density
    stays honest at every decade."""
    perms = _copy_perms(1000)
    assert perms[0] == _LOWER + _UPPER
    for i in range(1, 26):  # historical rotation preserved
        lo = _LOWER[i:] + _LOWER[:i]
        assert perms[i] == lo + lo.upper(), i
    for i, p in enumerate(perms):  # each is a bijection, case-aligned
        assert sorted(p[:26]) == list(_LOWER), i
        assert p[26:] == p[:26].upper(), i
    assert len(set(perms)) == len(perms)  # pairwise distinct


def test_cross_copy_grams_unlinked_beyond_rotation_space(tmp_path):
    """Copies 1 and 26 shared a cipher under the pre-r12-session-2
    rotation scheme (shift 1+(i-1)%25 collides every 25 copies): their
    char-grams were IDENTICAL up to word order, fabricating near-dup
    pairs at k>25. With the seeded-permutation extension their grams
    must be as unlinked as any other copy pair. Build k=27 on the tiny
    sf0.001 documents table and compare the previously-colliding pair
    directly."""
    out = str(tmp_path / "k27")
    build(SRC, out, 27)
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH d AS (
          SELECT doc_id % 100000000 AS src_id, doc_id // 100000000 AS copy,
                 text
          FROM read_parquet('{out}/documents.parquet')
          WHERE doc_id // 100000000 IN (1, 26) AND length(text) >= 5
        ), g AS (
          SELECT src_id, copy,
                 list_distinct(
                   [text[j:j+4] FOR j IN range(1, length(text) - 3)]
                 ) AS grams
          FROM d
        )
        SELECT MAX(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.grams, b.grams))))
        FROM g a JOIN g b ON a.src_id = b.src_id AND a.copy = 1 AND b.copy = 26
        """
    ).fetchone()
    assert rows[0] is not None, "no cross-copy pairs sampled"
    assert rows[0] < 0.10, rows[0]
