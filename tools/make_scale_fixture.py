"""Generate a K×-scaled fixture from an existing sf directory (DuckDB).

The round-11 scaling rehearsal (VERDICT r10 task #5) needs one decade
above the bench scale: every operator is sf0.1-verified and plan-shaped,
but "survives 100×" was graded from plan shape alone. This tool builds an
sf1-class directory (default 10× sf0.1) for the tables the ten
scale-critical queries read — documents, embeddings, lineitem — so
tools/scaling_rehearsal.py can measure wall-clock across three decades.

Replication must not distort the SHAPE the queries key on:

- ``documents``: copy i shifts doc_id by i·1e8, SUFFIXES a deterministic
  ~25% of the vocabulary (``hash(word‖i) % 4 == 0`` → ``word_i``;
  stopwords the/a/of excepted so stopword-membership quality rules keep
  their per-copy shape), and ROTATES each text's word order by i.
  Both transforms are per-copy word bijections, so each copy's internal
  exact-duplicate AND set-similarity structure is identical to the
  source (dup RATE preserved) — while across copies the word
  SEQUENCES differ (rotation: MinHash/shingle/LSH does not link copy
  families) and the word SETS differ by ~40% of the union (suffixing:
  word-set-Jaccard ops — PPJoin, the pretrain near-dup stage — do not
  link them either; cross-copy J ≈ 0.43 ≪ any production threshold).
  The first sf1 run taught why BOTH are needed: rotation alone keeps
  token SETS identical, so ``ppjoin_pairs`` saw K-member cross-copy
  cliques (1.16M pairs instead of ~10× the source's), an O(K²)
  fabricated explosion that read as a super-linear operator defect and
  ground the all-pairs pretrain oracle for >1 h. Tail caveat: a short
  doc can escape suffixing in two copies at once (P≈(0.75²)^n_words),
  leaving a handful of genuinely-linked cross-copy pairs — negligible,
  and both engines agree on them. n_chars is recomputed (the source
  invariant n_chars = length(text)).
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


def build(src: str, out: str, k: int) -> None:
    if os.path.realpath(out).startswith("/root/testdata"):
        raise SystemExit("refusing to write into /root/testdata")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")

    con.execute(
        f"""
        COPY (
          WITH src AS (SELECT * FROM read_parquet('{src}/documents.parquet')),
          reps AS (SELECT i FROM range({k}) t(i)),
          sfx AS (
            SELECT d.doc_id, d.lang, d.source, i,
                   CASE WHEN i = 0 THEN d.words ELSE
                     list_transform(d.words, w ->
                       CASE WHEN w IN ('the', 'a', 'of')
                                 OR hash(w || '#' || i) % 4 <> 0
                            THEN w ELSE w || '_' || i END)
                   END AS words
            FROM (SELECT *, string_split(text, ' ') AS words FROM src) d
            CROSS JOIN reps
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
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT vec_id + i * 100000000 AS vec_id, embedding, label
          FROM read_parquet('{src}/embeddings.parquet')
          CROSS JOIN range({k}) t(i)
          ORDER BY vec_id
        ) TO '{out}/embeddings.parquet' (FORMAT parquet)
        """
    )
    con.execute(
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
        """
    )
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
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
        con.execute(
            f"""
            COPY (
              SELECT {proj}
              FROM read_parquet('{src}/{t}.parquet')
              CROSS JOIN range({k}) t(i)
            ) TO '{out}/{t}.parquet' (FORMAT parquet)
            """
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
    a = p.parse_args()
    build(a.src, a.out, a.k)
