"""Hadoop FileSystem helpers — filesystem-agnostic twins of the local
``open()`` / ``glob`` idioms, so index sidecars and replay guards work on
whatever store the parquet half already supports (HDFS, s3a, local).

Used by the IVFADC index save/load (``operators/ivfpq.py`` model.json)
and the streaming dedup replay guards (``streaming/dedup.py`` — a guard
that only understood the local filesystem would silently degrade
cross-history dedup to within-batch-only on an ``hdfs://`` store path).
"""

from __future__ import annotations


def hadoop_fs(spark, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop conf."""
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    )
    return fs, hpath


def write_text(spark, path: str, text: str) -> None:
    """Small sidecar file via the Hadoop FileSystem API."""
    fs, hpath = hadoop_fs(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark, path: str) -> str:
    fs, hpath = hadoop_fs(spark, path)
    stream = fs.open(hpath)
    try:
        jvm = spark.sparkContext._jvm  # noqa: SLF001
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def glob_exists(spark, pattern: str) -> bool:
    """True iff the Hadoop glob matches at least one path."""
    fs, hpath = hadoop_fs(spark, pattern)
    matches = fs.globStatus(hpath)
    return matches is not None and len(matches) > 0


def has_committed_batches(spark, path: str) -> bool:
    """True iff the batch-partitioned store holds at least one COMMITTED
    partition (a ``batch=*/`` dir with its ``_SUCCESS`` marker).

    A bare existence check on ``path`` is not a safe replay guard: a
    first-epoch attempt that died mid-write leaves only ``_temporary``
    files under ``path``, and schema inference over those fails exactly
    the replay that is trying to repair that state.
    """
    return glob_exists(spark, f"{path.rstrip('/')}/batch=*/_SUCCESS")
