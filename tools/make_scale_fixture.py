"""Generate a K×-scaled fixture from an existing sf directory (DuckDB).

The round-11 scaling rehearsal (VERDICT r10 task #5) needs one decade
above the bench scale: every operator is sf0.1-verified and plan-shaped,
but "survives 100×" was graded from plan shape alone. This tool builds an
sf1-class directory (default 10× sf0.1) for the tables the ten
scale-critical queries read — documents, embeddings, lineitem — so
tools/scaling_rehearsal.py can measure wall-clock across three decades.

Replication must not distort the SHAPE the queries key on:

- ``documents``: copy i shifts doc_id by i·1e8, applies a per-copy
  LETTER CIPHER to every non-stopword word (``translate`` with a
  per-copy alphabet: rotation by i for copies 1–25 — byte-compatible
  with every fixture built at k ≤ 26 — and a deterministic seeded
  Fisher-Yates PERMUTATION for copies ≥ 26, pairwise-distinct across
  ALL copies, see ``_copy_perms``; the 40 STOPWORDS of all four langid
  languages stay verbatim so stopword-ratio / language-ID /
  quality-gate shapes are identical per copy), and ROTATES each text's
  word order by i. Both transforms are per-copy word bijections, so each
  copy's internal exact-duplicate AND set-similarity structure is
  identical to the source (dup RATE preserved) — while across copies
  essentially EVERYTHING differs: word sets share only stopwords and
  digit runs (set-Jaccard ops — PPJoin, the pretrain near-dup stage —
  cannot link copies), and, the round-12 honest-density fix, the
  CHAR-GRAM streams differ too (every gram touching a ciphered letter
  maps to a different gram per copy), so char-shingle MinHash and
  winnowing fingerprints no longer link copy families. History: the
  first sf1 run used rotation alone (token sets identical → ppjoin saw
  K-member cross-copy cliques, an O(K²) fabricated 1.16M-pair
  explosion); round 11 added ~25% vocabulary SUFFIXING, which fixed
  word-set ops but left ~75% of words — hence most char-5-grams —
  shared, fabricating 460M cross-copy MinHash candidate pairs at sf1
  and a fake e=1.12 scaling exponent for ``dedup_minhash``. The cipher
  subsumes the suffix: near-dup DENSITY is now constant across copies
  at both the word and the character granularity. Residual cross-copy
  overlap: grams fully inside stopword/space/digit runs — far below
  any banding threshold. n_chars is recomputed (the source invariant
  n_chars = length(text); the cipher is length-preserving, so n_chars
  actually matches the source rows).
- ``embeddings``: vec_id shifted; vectors copied as-is (distance math is
  indifferent to duplicates; the ANN rows time search, not recall).
  Deliberate consequence: every vector has K exact copies, so
  SemDeDup-style within-cluster pairwise work at sf1 is an UPPER BOUND
  on a real 10× corpus (duplicate points concentrate in one cluster and
  pair quadratically there — 153 s at sf1, vs ~10 s at sf0.1). A
  cosine-meaningful per-copy jitter would have to be tuned against the
  dedup threshold to avoid silently changing which pairs link; the
  conservative duplicate structure is preferred over that risk.
- ``lineitem``: l_orderkey shifted by i·1e9; value columns copied, so
  every per-column distribution (the quantile targets) is unchanged.

Round-11 extension — ALL TEN fixture tables, with CONSISTENT foreign-key
shifts so every join stays valid (the full oracle harness can then run
at sf1 as a fourth correctness decade):

- ``region`` / ``nation``: copied once, NOT replicated — they are the
  fixed dims (5 / 25 rows at every TPC-H scale factor).
- ``customer`` / ``supplier`` / ``part``: primary keys shifted by i·1e8;
  nation FKs unchanged (they point into the fixed dims).
- ``orders``: o_orderkey + i·1e9, o_custkey + i·1e8 — copy i's orders
  reference copy i's customers.
- ``lineitem``: l_orderkey + i·1e9, l_partkey/l_suppkey + i·1e8 — the
  full star stays internally consistent per copy.
- ``events``: event_id + i·1e8, user_id + i·1e8 (per-user event
  sequences stay intact per copy; timestamps copied, so time-bucket
  rollups see 10× density, which is exactly what a 10× corpus does).

Offset discipline (the first sf1 run taught it): several registry
queries CONSTRUCT keys arithmetically — scd2 materializes "brand-new"
dimension keys as c_custkey + 1e6, the bipartite graph queries remap
customers to o_custkey + 1e6 node ids, decontaminate's planted twin uses
doc_id + 1e7 — so a replication offset of i·1e6 made copy-0's
constructed keys COLLIDE with copy-1's real keys (scd2 then had two
same-key same-timestamp updates: the exact nondeterministic tie its
comment forbids, surfacing as a cross-engine hash mismatch). Every
per-copy shift is therefore i·1e8: constructed keys live in
[1e6, 2e7] ≪ 1e8, far below the next copy's key range. A future query
adding ≥ 1e8 to a fixture key must bump these offsets.

Usage: python tools/make_scale_fixture.py [--k 10] [--src /root/testdata/sf0.1]
       [--out /tmp/spark_graft_sf1]
Writing goes anywhere EXCEPT /root/testdata (read-only by contract).
"""

from __future__ import annotations

import argparse
import os

import duckdb

# the langid/quality stopword vocabulary (all four languages) — these words
# stay VERBATIM in every copy so stopword-membership signals keep their
# per-copy shape; kept as a literal so the tool has no Spark import
_KEEP_WORDS = (
    "the", "a", "of", "and", "to", "in", "is", "that", "for", "it",
    "der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf",
    "el", "la", "de", "que", "y", "en", "un", "es", "por", "con",
    "le", "et", "est", "pour", "dans", "ce",
)

_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = _LOWER.upper()


def _copy_perms(k: int) -> list[str]:
    """Per-copy cipher targets (lower+upper, 52 chars each), copy 0 =
    identity. Copies 1..25 keep the historical letter ROTATION by i (so
    every fixture built at k ≤ 26 — the committed sf1 artifacts —
    reproduces byte-for-byte). Rotation has only 25 distinct non-identity
    values, so at k=100 copies i and i+25 shared a cipher (bounded
    4-member classes — accepted for the r12 sf10 artifacts) and at
    k=1000 it would fabricate 40-member cross-copy near-dup cliques.
    Copies ≥ 26 therefore draw a DETERMINISTIC seeded Fisher-Yates
    permutation of the 26 letters (inline 64-bit LCG — no dependence on
    Python's random module internals), with a uniqueness guard across
    ALL copies: every copy's cipher is pairwise distinct, so cross-copy
    char-grams stay unlinked at any k."""
    seen = {_LOWER}
    out = [_LOWER + _UPPER]
    for i in range(1, k):
        if i <= 25:
            lo = _LOWER[i:] + _LOWER[:i]
        else:
            state = (i * 0x9E3779B97F4A7C15 + 0xD1B54A32D192ED03) & (2**64 - 1)
            while True:
                letters = list(_LOWER)
                for j in range(25, 0, -1):
                    state = (state * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
                    r = (state >> 33) % (j + 1)
                    letters[j], letters[r] = letters[r], letters[j]
                lo = "".join(letters)
                if lo not in seen:
                    break
        seen.add(lo)
        out.append(lo + lo.upper())
    return out


def _perms_values_sql(k: int) -> str:
    """A VALUES relation (i, tgt) with one cipher target per copy.
    ``i`` is cast to BIGINT: the doc_id offset is i·1e8, which overflows
    the INT32 a bare VALUES literal would type."""
    return ", ".join(
        f"({i}::BIGINT, '{t}')" for i, t in enumerate(_copy_perms(k))
    )


def build(src: str, out: str, k: int, skip_existing: bool = False) -> None:
    if os.path.realpath(out).startswith("/root/testdata"):
        raise SystemExit("refusing to write into /root/testdata")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")
    # Scale discipline (learned at k=1000, the sf100-class build): COPY
    # preserves insertion order by default, which buffers the whole
    # CROSS-JOIN output in memory — the 600M-row lineitem copy was
    # OOM-killed at 88 GB. None of these tables needs implicit order
    # (documents/embeddings state an explicit ORDER BY, which is still
    # honored as an external spill-sort), so stream the copies and cap
    # the engine well below the host so concurrent Spark JVMs survive.
    con.execute("SET preserve_insertion_order = false")
    con.execute("SET memory_limit = '24GB'")
    tmp = os.path.join(out, ".duckdb_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory = '{tmp}'")

    def _done(t: str) -> bool:
        """--skip-existing resume: a table counts as built only if its
        parquet file has a readable row count (a 0-byte file from a
        killed COPY does not)."""
        p = os.path.join(out, f"{t}.parquet")
        if not (skip_existing and os.path.exists(p)):
            return False
        try:
            con.execute(f"SELECT count(*) FROM read_parquet('{p}')").fetchone()
            return True
        except duckdb.Error:
            return False

    def _copy(t: str, sql: str) -> None:
        if _done(t):
            print(f"{t}: kept (skip-existing)", flush=True)
            return
        con.execute(sql)
        print(f"{t}: written", flush=True)

    keep = ", ".join(f"'{w}'" for w in _KEEP_WORDS)
    _copy(
        "documents",
        f"""
        COPY (
          WITH src AS (SELECT * FROM read_parquet('{src}/documents.parquet')),
          perms(i, tgt) AS (VALUES {_perms_values_sql(k)}),
          sfx AS (
            SELECT d.doc_id, d.lang, d.source, p.i,
                   CASE WHEN p.i = 0 THEN words ELSE
                     list_transform(words, w ->
                       CASE WHEN w IN ({keep}) THEN w
                       ELSE translate(w, '{_LOWER}{_UPPER}', p.tgt) END)
                   END AS words
            FROM (SELECT *, string_split(text, ' ') AS words FROM src) d
            CROSS JOIN perms p
          ),
          rot AS (
            SELECT doc_id + i * 100000000 AS doc_id,
                   CASE WHEN i = 0 THEN array_to_string(words, ' ') ELSE
                     array_to_string(
                       list_concat(
                         words[1 + (i % len(words)):],
                         words[:(i % len(words))]
                       ), ' ')
                   END AS text,
                   lang, source
            FROM sfx
          )
          SELECT doc_id, text, lang, source,
                 length(text)::BIGINT AS n_chars
          FROM rot ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT parquet)
        """,
    )
    _copy(
        "embeddings",
        f"""
        COPY (
          SELECT vec_id + i * 100000000 AS vec_id, embedding, label
          FROM read_parquet('{src}/embeddings.parquet')
          CROSS JOIN range({k}) t(i)
          ORDER BY vec_id
        ) TO '{out}/embeddings.parquet' (FORMAT parquet)
        """,
    )
    _copy(
        "lineitem",
        f"""
        COPY (
          SELECT l_orderkey + i * 1000000000 AS l_orderkey,
                 l_partkey + i * 100000000 AS l_partkey,
                 l_suppkey + i * 100000000 AS l_suppkey,
                 l_linenumber, l_quantity,
                 l_extendedprice, l_discount, l_tax,
                 l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{src}/lineitem.parquet')
          CROSS JOIN range({k}) t(i)
        ) TO '{out}/lineitem.parquet' (FORMAT parquet)
        """,
    )
    for t in ("region", "nation"):
        _copy(
            t,
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)",
        )
    shifted = {
        "customer": "c_custkey + i * 100000000 AS c_custkey, c_name, "
                    "c_nationkey, c_acctbal, c_mktsegment",
        "supplier": "s_suppkey + i * 100000000 AS s_suppkey, s_name, "
                    "s_nationkey, s_acctbal",
        "part": "p_partkey + i * 100000000 AS p_partkey, p_name, p_brand, "
                "p_type, p_size, p_retailprice",
        "orders": "o_orderkey + i * 1000000000 AS o_orderkey, "
                  "o_custkey + i * 100000000 AS o_custkey, o_orderstatus, "
                  "o_totalprice, o_orderdate, o_orderpriority",
        "events": "event_id + i * 100000000 AS event_id, ts, "
                  "user_id + i * 100000000 AS user_id, event_type, value, props",
    }
    for t, proj in shifted.items():
        _copy(
            t,
            f"""
            COPY (
              SELECT {proj}
              FROM read_parquet('{src}/{t}.parquet')
              CROSS JOIN range({k}) t(i)
            ) TO '{out}/{t}.parquet' (FORMAT parquet)
            """,
        )
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--src", default="/root/testdata/sf0.1")
    p.add_argument("--out", default="/tmp/spark_graft_sf1")
    p.add_argument("--skip-existing", action="store_true",
                   help="resume a killed build: keep tables whose parquet "
                        "already has a readable row count")
    a = p.parse_args()
    build(a.src, a.out, a.k, skip_existing=a.skip_existing)
