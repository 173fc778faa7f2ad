"""Local replica of the driver's DuckDB differential harness.

Runs every registry query through Spark AND its oracle SQL through DuckDB on
the same parquet tables, then compares row count, sorted-column names, and an
order-insensitive value hash. Usage:

    python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

``--json`` additionally writes one record per query (status, rows, secs) —
the committed ``ORACLE_r{N}.json`` evidence artifacts are this output.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_pipeline_spark.catalog import TABLES, table_path


def canonical_hash(rows: list[tuple], cols: list[str]) -> str:
    """Order-insensitive value hash with columns sorted by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, float):
            if v != v:
                return "NaN"
            return f"{v:.10g}"
        return str(v)

    lines = sorted("\x01".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [--json OUT.json] [sf_dir] [query ...]")
            return 2
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    from batch_processing_pipeline_spark import get_spark
    from batch_processing_pipeline_spark.registry import ORACLES, QUERIES

    spark = get_spark("check-oracle", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    failures = []
    records: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            records[name] = {"status": "fail", "err": f"spark: {exc}"}
            continue
        sql = ORACLES.get(name)
        if sql is None:
            secs = round(time.time() - t0, 1)
            print(f"ok   {name}: rows-only ({len(srows)} rows, {secs}s)")
            records[name] = {
                "status": "rows_only", "spark_rows": len(srows), "secs": secs,
            }
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0].lower() for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            records[name] = {"status": "fail", "err": f"duckdb: {exc}"}
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        else:
            hs = canonical_hash(srows, scols)
            ho = canonical_hash(orows, ocols)
            if hs != ho:
                problems.append("value-hash mismatch")
        secs = round(time.time() - t0, 1)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
            records[name] = {"status": "fail", "err": "; ".join(problems)}
        else:
            print(f"ok   {name}: {len(srows)} rows match ({secs}s)")
            records[name] = {
                "status": "hash_match",
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
                "secs": secs,
            }
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(records),
                    "n_failures": len(failures),
                    "queries": records,
                },
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
