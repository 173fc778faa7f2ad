"""Table-maintenance operators: small-file compaction and Z-order layout.

At 100 TB the dominant operational failures are file-count explosions
(streaming sinks and dynamic-partition writes emit thousands of KB-sized
files; listing + task-per-file overhead then dwarfs the scan) and
un-clustered layout (multi-dimensional range predicates can't skip row
groups). These two rewrites are the standard fixes:

* ``compact_files`` — rewrite a parquet directory into ~target-sized
  files. Sizing reads the real byte size from the filesystem (Hadoop FS
  API, so the same code paths work on HDFS/S3A, not just ``file:``).
* ``zorder_key`` / ``write_zordered`` — interleave the bits of multiple
  key columns into one Morton (Z-order) value and range-partition + sort
  the write by it. Rows close in ANY key dimension land in the same few
  files, so min/max row-group stats prune scans filtered on any subset of
  the key columns — the effect Delta/Iceberg ``OPTIMIZE ZORDER BY``
  provides, built from plain Spark primitives.

Both are pure plan-level rewrites: no UDFs, no driver data paths.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["compact_files", "dir_size_bytes", "write_zordered", "zorder_key"]


def zorder_key(cols: list[str | Column], bits: int = 16) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of each column.

    Columns are masked to ``bits`` bits (callers with wider domains should
    pre-bucket, e.g. ``F.pmod`` or a range rank). The interleaved terms
    occupy disjoint bit positions, so plain addition assembles the key —
    everything stays in codegen'd long arithmetic (no UDF).
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        masked = col.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            bit = F.shiftright(masked, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + j)
    return z


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered by the Z-order of ``cols``.

    Each column is first scaled linearly onto the full ``bits``-bit grid
    from its (min, max) — one tiny aggregate pass. Without this, a
    narrow-domain column (20 suppliers) contributes only low-order bits
    next to a wide one (1M parts) and the interleave degenerates to a
    single-column sort; linear scaling is order-preserving, so row-group
    min/max stats on the RAW columns stay tight.

    ``repartitionByRange`` samples the z-key distribution (one extra pass)
    to build balanced range bounds — a full global sort is never
    materialized; each output task sorts only its own range so row-group
    min/max stats are tight on every key column.
    """
    grid = float((1 << bits) - 1)
    mm = df.agg(
        *[F.min(c).cast("double").alias(f"_mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_mx_{c}") for c in cols],
    ).first()
    scaled = []
    for c in cols:
        lo, hi = mm[f"_mn_{c}"], mm[f"_mx_{c}"]
        span = (hi - lo) or 1.0
        scaled.append(
            F.floor((F.col(c).cast("double") - F.lit(lo)) * F.lit(grid / span))
            .cast("long")
        )
    z = zorder_key(scaled, bits=bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def dir_size_bytes(spark: SparkSession, path: str) -> int:
    """Total data size under ``path`` via the Hadoop FS API (works for any
    configured scheme — file:, hdfs:, s3a: — unlike os.walk)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    return fs.getContentSummary(p).getLength()


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Rewrite ``src_path`` into ``ceil(size / target)`` files at
    ``dst_path``; returns the file count written.

    Uses ``coalesce`` (no shuffle) — compaction only ever REDUCES file
    count, and preserving the existing row order keeps whatever clustering
    the data already has. Returns the actual byte-derived count so callers
    can log/assert the compaction ratio.
    """
    if src_path == dst_path:
        # the lazy read would race the overwrite of its own input
        raise ValueError("dst_path must differ from src_path")
    size = dir_size_bytes(spark, src_path)
    n = max(1, math.ceil(size / target_file_bytes))
    df = spark.read.format(fmt).load(src_path)
    df.coalesce(n).write.mode("overwrite").format(fmt).save(dst_path)
    return n
