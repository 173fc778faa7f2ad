"""Generate a K×-scaled fixture from an existing sf directory (DuckDB).

The round-11 scaling rehearsal (VERDICT r10 task #5) needs one decade
above the bench scale: every operator is sf0.1-verified and plan-shaped,
but "survives 100×" was graded from plan shape alone. This tool builds an
sf1-class directory (default 10× sf0.1) for the tables the ten
scale-critical queries read — documents, embeddings, lineitem — so
tools/scaling_rehearsal.py can measure wall-clock across three decades.

Replication must not distort the SHAPE the queries key on:

- ``documents``: copy i shifts doc_id by i·1e6 and ROTATES each text's
  word order by i (deterministic). Rotation keeps each copy's internal
  exact-duplicate structure byte-identical (two dups rotate to the same
  string), so the corpus dup RATE matches the source — but across copies
  the shingle sets differ, so MinHash/LSH does not link copy families
  (naive replication would create 10-member near-dup cliques and push
  candidate-pair growth to O(K²), fabricating a super-linear exponent).
  n_chars is recomputed (the source invariant n_chars = length(text)).
- ``embeddings``: vec_id shifted; vectors copied as-is (distance math is
  indifferent to duplicates; the ANN rows time search, not recall).
- ``lineitem``: l_orderkey shifted by i·1e9; value columns copied, so
  every per-column distribution (the quantile targets) is unchanged.

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
          rot AS (
            SELECT d.doc_id + i * 1000000 AS doc_id,
                   CASE WHEN i = 0 THEN d.text ELSE
                     array_to_string(
                       list_concat(
                         words[1 + (i % len(words)):],
                         words[:(i % len(words))]
                       ), ' ')
                   END AS text,
                   d.lang, d.source
            FROM (SELECT *, string_split(text, ' ') AS words FROM src) d
            CROSS JOIN reps
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
          SELECT vec_id + i * 1000000 AS vec_id, embedding, label
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
                 l_partkey, l_suppkey, l_linenumber, l_quantity,
                 l_extendedprice, l_discount, l_tax,
                 l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{src}/lineitem.parquet')
          CROSS JOIN range({k}) t(i)
        ) TO '{out}/lineitem.parquet' (FORMAT parquet)
        """
    )
    for t in ("documents", "embeddings", "lineitem"):
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
