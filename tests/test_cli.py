"""CLI parity entry point: single-file and windowed batch runs."""

from __future__ import annotations

import json

from batch_processing_pipeline_spark.cli import main


def test_cli_single_file_batch(spark, tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "2025-06-10-23.txt").write_text("test\ntest\nkheder\nkheder\ngoodmorning\n")
    state = str(tmp_path / "state")
    sugg = str(tmp_path / "sugg")
    rc = main(
        [
            "--logs", str(logs),
            "--logfile", "2025-06-10-23",
            "--state-dir", state,
            "--suggestions-dir", sugg,
            "--top-k", "10",
        ]
    )
    assert rc == 0
    got = {
        r.prefix: json.loads(r.completions_json)
        for r in spark.read.parquet(sugg).collect()
    }
    assert got["te"] == ["test"]
    assert got["kh"] == ["kheder"]


def test_cli_window_batch_incremental(spark, tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "2025-06-10-22.txt").write_text("alpha\n")
    (logs / "2025-06-10-23.txt").write_text("alpha\nbeta\n")
    s1 = str(tmp_path / "s1")
    g1 = str(tmp_path / "g1")
    rc = main(
        [
            "--logs", str(logs),
            "--window-hours", "2",
            "--end", "2025-06-10-23",
            "--state-dir", s1,
            "--suggestions-dir", g1,
        ]
    )
    assert rc == 0
    freq = {
        (r.prefix, r.query): r.frequency for r in spark.read.parquet(s1).collect()
    }
    assert freq[("al", "alpha")] == 2  # both hourly files read

    # second batch feeds previous state back in
    s2 = str(tmp_path / "s2")
    g2 = str(tmp_path / "g2")
    rc = main(
        [
            "--logs", str(logs),
            "--logfile", "2025-06-10-23",
            "--prev-state", s1,
            "--state-dir", s2,
            "--suggestions-dir", g2,
        ]
    )
    assert rc == 0
    freq2 = {
        (r.prefix, r.query): r.frequency for r in spark.read.parquet(s2).collect()
    }
    assert freq2[("al", "alpha")] == 3
    assert freq2[("be", "beta")] == 2


def test_cli_stream_mode_runs_available_now(spark, tmp_path, monkeypatch):
    """--stream drives the availableNow streaming job end-to-end: files
    merge exactly once across invocations via the checkpoint."""
    import os

    from batch_processing_pipeline_spark import cli

    logs = tmp_path / "logs"
    os.makedirs(logs)
    (logs / "2025-01-01-00.txt").write_text("test\ntest\nkheder\n")
    state = str(tmp_path / "state")
    sugg = str(tmp_path / "sugg")
    ckpt = str(tmp_path / "ckpt")

    # reuse the session fixture instead of letting the CLI build one
    monkeypatch.setattr(cli, "get_spark", lambda *a, **k: spark)
    rc = cli.main([
        "--logs", str(logs), "--state-dir", state, "--suggestions-dir", sugg,
        "--stream", "--checkpoint-dir", ckpt, "--top-k", "5",
    ])
    assert rc == 0
    cur = spark.read.parquet(os.path.join(state, "current"))
    freq = {(r.prefix, r.query): r.frequency for r in cur.collect()}
    assert freq[("te", "test")] == 2

    (logs / "2025-01-01-01.txt").write_text("test\n")
    rc = cli.main([
        "--logs", str(logs), "--state-dir", state, "--suggestions-dir", sugg,
        "--stream", "--checkpoint-dir", ckpt, "--top-k", "5",
    ])
    assert rc == 0
    cur = spark.read.parquet(os.path.join(state, "current"))
    freq = {(r.prefix, r.query): r.frequency for r in cur.collect()}
    assert freq[("te", "test")] == 3  # merged exactly once (H1)


def test_cli_stream_requires_checkpoint(tmp_path):
    import pytest

    from batch_processing_pipeline_spark import cli

    with pytest.raises(SystemExit, match="checkpoint"):
        cli.main([
            "--logs", str(tmp_path), "--state-dir", "s", "--suggestions-dir", "g",
            "--stream",
        ])


def test_cli_mode_flag_cross_validation(tmp_path):
    import pytest

    from batch_processing_pipeline_spark import cli

    base = ["--logs", str(tmp_path), "--state-dir", "s", "--suggestions-dir", "g"]
    with pytest.raises(SystemExit, match="batch mode only"):
        cli.main([*base, "--stream", "--checkpoint-dir", "c", "--logfile", "x"])
    with pytest.raises(SystemExit, match="requires --stream"):
        cli.main([*base, "--logfile", "x", "--state-buckets", "8"])


def test_cli_stream_refuses_batch_state_layout(tmp_path):
    import pytest

    from batch_processing_pipeline_spark import cli

    state = tmp_path / "state"
    state.mkdir()
    (state / "part-0000.snappy.parquet").write_bytes(b"PAR1")
    with pytest.raises(SystemExit, match="BATCH-mode state"):
        cli.main([
            "--logs", str(tmp_path), "--state-dir", str(state),
            "--suggestions-dir", "g", "--stream", "--checkpoint-dir", "c",
        ])
