"""Custom Python DataSource for the hourly query-log layout.

The reference reads hourly HDFS files named ``YYYY-MM-DD-HH.txt``
(``README.md:83``, ``upload_to_hdfs.ps1:4-6``) with the 24-hour window
applied by the CALLER listing paths. This source moves that contract into
the planner via Spark 4's Python DataSource API
(``pyspark.sql.datasource``): each hourly file becomes one
``InputPartition`` (parallel reads, executor-side), and ``start_hour`` /
``end_hour`` options prune out-of-range files AT PLANNING TIME — the
partition-pruning behavior a path-glob caller has to hand-roll.

Usage::

    spark.dataSource.register(QueryLogDataSource)
    df = (spark.read.format("querylog")
          .option("path", "/logs")
          .option("start_hour", "2025-01-01-00")   # inclusive, optional
          .option("end_hour", "2025-01-01-23")     # inclusive, optional
          .load())
    # value: string (raw line), hour: string "YYYY-MM-DD-HH"

Scale notes: one partition per hourly file matches the layout's natural
parallelism (the reference's 24-h window = 24 partitions); a Python
worker streams each file line-by-line (no whole-file buffering). For
columnar formats Spark's built-in readers stay the right tool — this API
is for layouts/protocols Spark has no native source for.
"""

from __future__ import annotations

import os
import re
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_HOUR_RE = re.compile(r"^(\d{4}-\d{2}-\d{2}-\d{2})\.txt$")


class HourFilePartition(InputPartition):
    def __init__(self, path: str, hour: str):
        self.path = path
        self.hour = hour


class QueryLogReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("querylog source requires .option('path', <dir>)")
        self.start = options.get("start_hour")
        self.end = options.get("end_hour")

    def partitions(self):
        parts = []
        for name in sorted(os.listdir(self.root)):
            m = _HOUR_RE.match(name)
            if not m:
                continue
            hour = m.group(1)
            # planning-time pruning: out-of-window files never become
            # partitions, so no task is scheduled for them at all.
            # "YYYY-MM-DD-HH" compares correctly as a string.
            if self.start is not None and hour < self.start:
                continue
            if self.end is not None and hour > self.end:
                continue
            parts.append(HourFilePartition(os.path.join(self.root, name), hour))
        return parts

    def read(self, partition: HourFilePartition):
        with open(partition.path, encoding="utf-8") as f:
            for line in f:
                yield (line.rstrip("\n"), partition.hour)


class QueryLogStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the hourly-log source (Spark 4
    ``simpleStreamReader`` API): the offset is the SET of hour files
    already ingested, so newly-arriving hourly files — including LATE
    ones that sort before already-seen hours — each appear in exactly one
    micro-batch. ``readBetweenOffsets`` replays a committed batch
    deterministically from its offset pair (end − start), which is what
    makes checkpoint recovery exactly-once downstream.

    Offset size is bounded by the retention window of the layout (24
    names/day); a production variant compacts the set to
    (watermark_hour, stragglers) once files outside the lateness horizon
    stop arriving.
    """

    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("querylog stream requires .option('path', <dir>)")
        # cap on new hour-files per micro-batch (the reference's
        # --max-files-per-trigger knob); 0 = unlimited. Spark lowercases
        # option keys for Python data sources.
        self.max_files = int(options.get("maxfilespertrigger", 0) or 0)

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _hours_on_disk(self) -> list[str]:
        return sorted(
            m.group(1)
            for m in (_HOUR_RE.match(n) for n in os.listdir(self.root))
            if m
        )

    def _rows_for(self, hours: list[str]):
        # returns a LIST iterator, not a generator: Spark's prefetch
        # cache copy.copy()s the entry iterator for replay, which
        # generators don't support (and a micro-batch's hour files are
        # bounded, so materializing is safe)
        rows = []
        for hour in hours:
            path = os.path.join(self.root, f"{hour}.txt")
            with open(path, encoding="utf-8") as f:
                rows.extend((line.rstrip("\n"), hour) for line in f)
        return iter(rows)

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        new = [h for h in self._hours_on_disk() if h not in seen]
        if self.max_files:
            new = new[: self.max_files]
        end = {"seen": sorted(seen | set(new))}
        return self._rows_for(new), end

    def readBetweenOffsets(self, start: dict, end: dict):
        delta = sorted(set(end.get("seen", [])) - set(start.get("seen", [])))
        return self._rows_for(delta)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; nothing source-side to ack


class HourPartsCommit(WriterCommitMessage):
    """(hour → staged part file) pairs produced by one write task."""

    def __init__(self, parts: list[tuple[str, str]]):
        self.parts = parts


class QueryLogWriter(DataSourceWriter):
    """Distributed write of the hourly layout with a driver-side commit.

    The full two-phase protocol the V2 write API exists for:

    * ``write`` (executor, per partition): rows bucket by hour into
      STAGED part files ``.staging-<runid>/<hour>.part-<uuid>`` — tasks
      never touch the final ``<hour>.txt`` names, so a failed/ speculative
      task leaves no partial final file (the staging dir is the
      write-ahead area; on an object store this is the multipart-upload
      equivalent).
    * ``commit`` (driver, once, only after every task succeeded):
      concatenates each hour's staged parts (sorted by part name —
      deterministic assembly) into the final ``<hour>.txt`` the READER
      half of this source consumes, then drops staging.
    * ``abort``: removes staging; final layout is untouched.

    Rows may carry any mix of hours in any partition — tasks writing the
    same hour stage distinct part files, the commit merges them. Callers
    wanting one part per hour repartition by ``hour`` first.
    """

    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("querylog sink requires .option('path', <dir>)")
        self.staging = os.path.join(self.root, f".staging-{uuid.uuid4().hex[:12]}")

    def write(self, iterator) -> HourPartsCommit:
        os.makedirs(self.staging, exist_ok=True)
        handles: dict[str, tuple[str, object]] = {}
        for row in iterator:
            hour = row.hour
            if hour is None or not re.match(r"^\d{4}-\d{2}-\d{2}-\d{2}$", hour):
                raise ValueError(f"bad hour value {hour!r} (want YYYY-MM-DD-HH)")
            if row.value is not None and "\n" in row.value:
                # the layout is line-oriented: an embedded newline would
                # silently split one record into two on read-back
                raise ValueError(
                    f"value for hour {hour} contains a newline — "
                    "line-oriented layout cannot represent it"
                )
            if hour not in handles:
                part = os.path.join(
                    self.staging, f"{hour}.part-{uuid.uuid4().hex[:12]}"
                )
                handles[hour] = (part, open(part, "w", encoding="utf-8"))
            handles[hour][1].write((row.value or "") + "\n")
        for _, fh in handles.values():
            fh.close()
        return HourPartsCommit([(h, p) for h, (p, _) in handles.items()])

    def commit(self, messages) -> None:
        by_hour: dict[str, list[str]] = {}
        for m in messages:
            for hour, part in m.parts:
                by_hour.setdefault(hour, []).append(part)
        for hour, parts in by_hour.items():
            final = os.path.join(self.root, f"{hour}.txt")
            tmp = final + ".tmp"
            with open(tmp, "w", encoding="utf-8") as out:
                for part in sorted(parts):
                    with open(part, encoding="utf-8") as f:
                        out.write(f.read())
            os.replace(tmp, final)  # atomic per-hour finalize
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


class QueryLogDataSource(DataSource):
    """``format("querylog")`` — hourly query-log files as (value, hour),
    readable AND writable (two-phase staged commit)."""

    @classmethod
    def name(cls) -> str:
        return "querylog"

    def schema(self) -> str:
        return "value string, hour string"

    def reader(self, schema) -> QueryLogReader:
        return QueryLogReader(self.options)

    def writer(self, schema, overwrite: bool) -> QueryLogWriter:
        return QueryLogWriter(self.options)

    def simpleStreamReader(self, schema) -> QueryLogStreamReader:
        return QueryLogStreamReader(self.options)
