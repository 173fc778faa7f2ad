"""Local replica of the driver's DuckDB differential harness.

Runs every registry query through Spark AND its oracle SQL through DuckDB on
the same parquet tables, then compares row count, sorted-column names, and an
order-insensitive value hash. Usage:

    python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

``--json`` additionally writes one record per query (status, rows, secs) —
the committed ``ORACLE_r{N}.json`` evidence artifacts are this output.

Dtype-faithful since round 5 (VERDICT r4 "What's wrong" #1/#4): the driver
canonicalizes through pandas, where duckdb's ``.df()`` converts HUGEINT
(DuckDB ``SUM(BIGINT)``) to float64 and Spark's ``toPandas()`` keeps int64 —
an uncast integer aggregate therefore hash-mismatches at the driver even when
every value is numerically equal.  The old replica fetched via ``fetchall()``
(HUGEINT -> Python int) and normalized ``3.0`` and ``3`` to the same string,
so it was structurally blind to that class.  This version:

- fetches BOTH sides as pandas frames (``toPandas()`` / ``.df()``), the same
  representations the driver hashes;
- includes each column's normalized dtype *kind* (int / float / bool /
  temporal / object) in the hash, so an int64-vs-float64 divergence fails
  even though ``"{:.10g}"`` would format ``3.0`` and ``3`` identically;
- treats DATE-vs-midnight-TIMESTAMP as equal (driver-green precedent:
  ``retention`` and ``skipping_audit`` both return DATE finals and pass);
- reports list/ndarray cells as a harness error, mirroring the driver's
  ``TypeError: unhashable type: 'list'`` on array-valued final columns.
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_pipeline_spark.catalog import TABLES, table_path


class UnhashableColumn(Exception):
    """A final column holds list/array/dict cells — the driver's pandas
    canonicalizer raises ``TypeError: unhashable type`` on these."""


def _kind(series: pd.Series) -> str:
    """Normalized dtype kind for the hash header.

    int-family -> "i", float -> "f", bool -> "b", datetime -> "t",
    everything else (strings, decimals, dates-as-objects) -> inspected.
    Object columns of datetime.date are classed "t" so a Spark DATE
    (object) hashes like a DuckDB DATE (datetime64) — the driver accepts
    that pairing (retention / skipping_audit green precedent).
    """
    k = series.dtype.kind
    if k in ("i", "u"):
        return "i"
    if k == "f":
        return "f"
    if k == "b":
        return "b"
    if k in ("M", "m"):
        return "t"
    # object column: inspect non-null cells
    for v in series:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, (list, tuple, dict, np.ndarray)):
            raise UnhashableColumn(str(series.name))
        if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
            return "t"
        if isinstance(v, bool):
            return "b"
        if isinstance(v, (int, np.integer)):
            return "i"
        if isinstance(v, float):
            return "f"
        return "O"
    return "O"


def _norm(v, kind: str) -> str:
    if v is None:
        return "NULL"
    if kind == "f" or isinstance(v, (float, np.floating)):
        f = float(v)
        if f != f:
            return "NULL" if kind != "f" else "NaN"
        return f"{f:.10g}"
    if v is pd.NaT:
        return "NULL"
    if kind == "b":
        return str(int(bool(v)))
    if kind == "i":
        return str(int(v))
    if kind == "t":
        if isinstance(v, pd.Timestamp):
            v = v.to_pydatetime()
        if isinstance(v, datetime.datetime):
            s = v.isoformat(sep=" ")
            # midnight timestamps hash like plain dates (driver precedent)
            if s.endswith(" 00:00:00"):
                s = s[:-9]
            return s
        return v.isoformat()
    return str(v)


def canonical_frame_hash(df: pd.DataFrame) -> str:
    """Order-insensitive, dtype-faithful hash of a pandas frame.

    Columns sorted by (lowercased) name; a dtype-kind header line is part
    of the hash so int64 ``3`` and float64 ``3.0`` frames differ even
    though both values format as ``"3"``.
    """
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    kinds = [_kind(df[c]) for c in df.columns]
    h = hashlib.sha256()
    if len(df):
        # dtype header only when rows exist: empty frames carry no values
        # for dtypes to disagree about, and empty-frame dtype inference
        # differs benignly between the two fetch paths.
        h.update(("KINDS:" + "\x01".join(kinds)).encode())
        h.update(b"\n")
    cols = list(df.columns)
    lines = sorted(
        "\x01".join(_norm(row[i], kinds[i]) for i in range(len(cols)))
        for row in df.itertuples(index=False, name=None)
    )
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
    window_n = None
    if "--window" in argv:
        # replicate the driver's round exactly: check the front-N of the
        # __spark_entry__ ordering (the curated window), nothing else
        i = argv.index("--window")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [--json OUT.json] [--window N] [sf_dir] [query ...]")
            return 2
        window_n = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if window_n is not None:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "spark_entry_for_window",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
        )
        entry_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry_mod)
        # union, not overwrite: explicitly named queries must still run
        only |= set(list(entry_mod.queries())[:window_n])

    from batch_processing_pipeline_spark import get_spark
    from batch_processing_pipeline_spark.registry import ORACLES, QUERIES

    # one long-lived JVM runs every registry query back-to-back; the
    # Spark default (1g driver in local mode) is enough until sf0.1's
    # hash-join builds meet ~300 queries' accumulated broadcasts — set
    # an explicit size (bench.py defaults to 24g; 16g suffices here)
    # rather than let a late SHJ build OOM
    # SPARK_GRAFT_MASTER overrides the local[8] default — used by the
    # round-12 multi-executor rehearsal to run the SAME differential pass
    # under local-cluster[N,cores,mem] (real separate executor JVMs:
    # serialized shuffle, independent memory pools), the one regime
    # single-JVM local mode cannot exercise
    master = os.environ.get("SPARK_GRAFT_MASTER", "local[8]")
    extra = {}
    if master.startswith("local-cluster"):
        # local-cluster workers get the per-executor memory from the
        # master string (MiB); executor.memory must agree or launch fails
        mem_mb = master.rstrip("]").split(",")[-1]
        extra["spark.executor.memory"] = f"{mem_mb}m"
    # 4g result cap (r12): winnowing_dup_pairs' HONEST pair relation at
    # sf1 is ~21.5M real rows (~1.1 GiB arrow-serialized) — a harness
    # transfer limit, not an engine bound; the default 1g cap aborted the
    # toPandas fetch
    extra.setdefault("spark.driver.maxResultSize", "4g")
    spark = get_spark(
        "check-oracle",
        master=master,
        shuffle_partitions=16,
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        extra_conf=extra,
    )
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
            sdf_ = fn(spark, sf_dir)
            spdf = sdf_.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            records[name] = {"status": "fail", "err": f"spark: {exc}"}
            continue
        sql = ORACLES.get(name)
        if sql is None:
            secs = round(time.time() - t0, 1)
            print(f"ok   {name}: rows-only ({len(spdf)} rows, {secs}s)")
            records[name] = {
                "status": "rows_only", "spark_rows": len(spdf), "secs": secs,
            }
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            records[name] = {"status": "fail", "err": f"duckdb: {exc}"}
            continue
        problems = []
        if len(spdf) != len(odf):
            problems.append(f"rowcount spark={len(spdf)} duck={len(odf)}")
        scols = sorted(c.lower() for c in spdf.columns)
        ocols = sorted(c.lower() for c in odf.columns)
        if scols != ocols:
            problems.append(f"cols spark={scols} duck={ocols}")
        else:
            try:
                hs = canonical_frame_hash(spdf)
                ho = canonical_frame_hash(odf)
                if hs != ho:
                    # pinpoint dtype divergence for actionable output
                    detail = []
                    for c in scols:
                        try:
                            a = _kind(spdf[[x for x in spdf.columns if x.lower() == c][0]])
                            b = _kind(odf[[x for x in odf.columns if x.lower() == c][0]])
                            if a != b:
                                detail.append(f"{c}: spark-kind={a} duck-kind={b}")
                        except UnhashableColumn:
                            pass
                    msg = "value-hash mismatch"
                    if detail:
                        msg += " (dtype: " + "; ".join(detail) + ")"
                    problems.append(msg)
            except UnhashableColumn as exc:
                problems.append(
                    f"unhashable array column '{exc}' — driver canonicalizer "
                    "raises TypeError on list cells"
                )
        secs = round(time.time() - t0, 1)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
            records[name] = {"status": "fail", "err": "; ".join(problems)}
        else:
            print(f"ok   {name}: {len(spdf)} rows match ({secs}s)")
            records[name] = {
                "status": "hash_match",
                "spark_rows": len(spdf),
                "oracle_rows": len(odf),
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
