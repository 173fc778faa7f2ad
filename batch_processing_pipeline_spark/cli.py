"""CLI — drop-in parity with the reference job's entry point.

The reference is invoked as
``IncrementalAutocomplete <hdfsLogsPath> <logfile> <jdbcUrl> <dbTableFreq>
<dbTableTopK> <topK>`` (``IncrementalAutocomplete.java:23-35``; production
values in the CronJob manifest, ``README.md:52-58``). This CLI runs the
same incremental batch against parquet state (the default, no database
needed) or a JDBC state/serving pair when ``--jdbc-url`` is given:

    python -m batch_processing_pipeline_spark.cli \
        --logs /logs --logfile 2025-06-10-23 \
        --state-dir /state --suggestions-dir /serving --top-k 10

    # 24-hour window instead of a single hourly file (the documented
    # intent the reference never implemented — H7):
    ... --window-hours 24 --end 2025-06-10-23

    # streaming mode: replaces the reference's 5-min cron — an
    # availableNow foreachBatch run that merges every unprocessed hourly
    # file exactly once (checkpointed), optionally with bucketed state:
    ... --stream --checkpoint-dir /ckpt [--state-buckets 256]
"""

from __future__ import annotations

import argparse
from datetime import datetime

from batch_processing_pipeline_spark.plans.autocomplete import run_incremental_batch
from batch_processing_pipeline_spark.session import get_spark
from batch_processing_pipeline_spark.sources.text import hourly_paths, read_query_log


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="batch_processing_pipeline_spark",
        description="Incremental autocomplete batch (PySpark engine)",
    )
    p.add_argument("--logs", required=True, help="query-log directory")
    p.add_argument("--logfile", help="single hourly file name (without .txt)")
    p.add_argument("--window-hours", type=int, help="trailing window instead of one file")
    p.add_argument("--end", help="window end hour, YYYY-MM-DD-HH (with --window-hours)")
    p.add_argument("--state-dir", required=True, help="cumulative state parquet root")
    p.add_argument("--prev-state", help="previous state path (default: none → first batch)")
    p.add_argument("--suggestions-dir", required=True, help="serving table output")
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--master", default=None, help="only for local runs; cluster via spark-submit")
    p.add_argument(
        "--stream", action="store_true",
        help="availableNow streaming run over --logs (cron parity)",
    )
    p.add_argument("--checkpoint-dir", help="stream checkpoint location (with --stream)")
    p.add_argument(
        "--max-files-per-trigger", type=int, default=None,
        help="files per stream micro-batch (default: one 24-file day per "
        "trigger — streaming.jobs.DEFAULT_MAX_FILES_PER_TRIGGER; 0 = no cap)",
    )
    p.add_argument(
        "--state-buckets", type=int, default=None,
        help="bucket cumulative state; batches rewrite only touched buckets",
    )
    p.add_argument(
        "--suggestion-buckets", type=int, default=None,
        help="bucket the serving table for delta publishing",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.stream:
        if not args.checkpoint_dir:
            raise SystemExit("--stream requires --checkpoint-dir")
        # fail loud on flags the stream mode would silently ignore — an
        # operator migrating a cron invocation must not believe a
        # --logfile/--window-hours selection is being honored
        for flag, val in (
            ("--logfile", args.logfile),
            ("--window-hours", args.window_hours),
            ("--prev-state", args.prev_state),
        ):
            if val is not None:
                raise SystemExit(
                    f"{flag} applies to batch mode only; --stream processes "
                    "every unprocessed file under --logs (checkpointed)"
                )
        import os

        if (
            os.path.isdir(args.state_dir)
            and not os.path.islink(os.path.join(args.state_dir, "current"))
            and not any(
                n.startswith("bucket=") for n in os.listdir(args.state_dir)
            )
            and any(n.endswith(".parquet") for n in os.listdir(args.state_dir))
        ):
            raise SystemExit(
                f"{args.state_dir} holds BATCH-mode state (plain parquet); "
                "streaming state uses a 'current' pointer over versioned "
                "batch dirs. Use a fresh --state-dir (or keep running batch "
                "mode against this one) — mixing the layouts would silently "
                "restart counts from zero."
            )
        from batch_processing_pipeline_spark.streaming.jobs import (
            DEFAULT_MAX_FILES_PER_TRIGGER,
            run_autocomplete_stream,
            stream_query_log,
        )

        if args.max_files_per_trigger is None:
            mfpt = DEFAULT_MAX_FILES_PER_TRIGGER
        elif args.max_files_per_trigger == 0:
            mfpt = None  # explicit no-cap: whole backlog in one trigger
        elif args.max_files_per_trigger < 0:
            raise SystemExit(
                "--max-files-per-trigger must be >= 0 (0 = no cap)"
            )
        else:
            mfpt = args.max_files_per_trigger
        spark = get_spark("incremental-autocomplete-stream", master=args.master)
        q = run_autocomplete_stream(
            stream_query_log(spark, args.logs, max_files_per_trigger=mfpt),
            args.state_dir,
            args.suggestions_dir,
            args.checkpoint_dir,
            k=args.top_k,
            suggestion_buckets=args.suggestion_buckets,
            state_buckets=args.state_buckets,
        )
        q.awaitTermination()
        return 0
    for flag, val in (
        ("--checkpoint-dir", args.checkpoint_dir),
        ("--state-buckets", args.state_buckets),
        ("--suggestion-buckets", args.suggestion_buckets),
    ):
        if val is not None:
            raise SystemExit(f"{flag} requires --stream")
    if not args.logfile and not args.window_hours:
        raise SystemExit("one of --logfile / --window-hours is required")
    spark = get_spark("incremental-autocomplete", master=args.master)
    if args.logfile:
        paths: list[str] | str = f"{args.logs.rstrip('/')}/{args.logfile}.txt"
    else:
        end = datetime.strptime(args.end, "%Y-%m-%d-%H")
        paths = hourly_paths(args.logs, end, args.window_hours)
    raw = read_query_log(spark, paths)
    run_incremental_batch(
        raw,
        state_path=args.prev_state,
        out_state_path=args.state_dir,
        out_suggestions_path=args.suggestions_dir,
        k=args.top_k,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
