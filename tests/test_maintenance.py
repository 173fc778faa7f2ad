"""Maintenance operators: compaction and Z-order layout."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.operators.maintenance import (
    compact_files,
    dir_size_bytes,
    write_zordered,
    zorder_key,
)


def _py_zorder(vals: list[int], bits: int = 16) -> int:
    z = 0
    n = len(vals)
    for j, v in enumerate(vals):
        v &= (1 << bits) - 1
        for i in range(bits):
            z += ((v >> i) & 1) << (i * n + j)
    return z


def test_zorder_key_matches_reference_bit_interleave(spark):
    rows = [(0, 0), (1, 2), (65535, 65535), (12345, 54321), (7, 65535)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", zorder_key(["a", "b"])).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _py_zorder([a, b]), (a, b)


def test_zorder_rejects_long_overflow():
    import pytest

    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)


def test_write_zordered_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order's point: row-group stats become selective on EVERY key
    column. With 4 range-partitioned output files, a point filter on
    either key dimension must be skippable to a strict subset of files
    (a single-column sort clusters only its own column)."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    out = str(tmp_path / "zordered")
    write_zordered(li, ["l_partkey", "l_suppkey"], out, n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert 1 < len(files) <= 4 + 1  # range partitioner may emit an empty tail

    def spanning_files(col, val):
        hit = 0
        for f in files:
            one = spark.read.parquet(f)
            mm = one.agg(F.min(col), F.max(col)).first()
            if mm[0] is not None and mm[0] <= val <= mm[1]:
                hit += 1
        return hit

    # probe the 20th percentile of each dimension — the median sits ON the
    # quadrant boundary, which every quadrant legitimately touches
    pk = li.agg(F.expr("percentile(l_partkey, 0.2)")).first()[0]
    sk = li.agg(F.expr("percentile(l_suppkey, 0.2)")).first()[0]
    assert spanning_files("l_partkey", int(pk)) < len(files)
    assert spanning_files("l_suppkey", int(sk)) < len(files)


def test_compact_files_reduces_count_and_preserves_rows(spark, sf_dir, tmp_path):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    shattered = str(tmp_path / "shattered")
    li.repartition(40).write.parquet(shattered)
    assert len(glob.glob(shattered + "/part-*.parquet")) == 40

    compacted = str(tmp_path / "compacted")
    n = compact_files(spark, shattered, compacted, target_file_bytes=1 << 40)
    assert n == 1
    assert len(glob.glob(compacted + "/part-*.parquet")) == 1
    back = spark.read.parquet(compacted)
    assert back.count() == li.count()
    # identical multiset of rows (hash of sorted key concat)
    def sig(df):
        return (
            df.select(F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber")).alias("h"))
            .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")))
            .first()[0]
        )
    assert sig(back) == sig(li)


def test_compact_files_same_path_rejected(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        compact_files(spark, str(tmp_path), str(tmp_path))


def test_dir_size_bytes_single_file_and_directory(spark, sf_dir, tmp_path):
    # single-file input (the fixture layout)
    p = os.path.join(sf_dir, "lineitem.parquet")
    assert dir_size_bytes(spark, p) == os.path.getsize(p)
    # multi-file directory (a real sink layout)
    out = str(tmp_path / "d")
    spark.read.parquet(p).repartition(3).write.parquet(out)
    local = sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    )
    got = dir_size_bytes(spark, out)
    # hadoop counts _SUCCESS/.crc side files too; data files dominate
    assert local <= got <= local + 8192, (got, local)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC is the other columnar format Spark ships built-in."""
    src = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    path = str(tmp_path / "nation_orc")
    src.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in src.collect()
    )
