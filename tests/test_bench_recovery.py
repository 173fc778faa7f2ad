"""bench.py's truncation contract (VERDICT r10 "what's wrong" #1): the
driver archives only the last 2000 chars of stdout, so the committed
artifact must always carry the suite total, and _load_previous must
recover per-query rows from a tail truncated at EITHER end, in both the
r10 (spaced, value-first) and r11 (compact, value-last) formats."""

from __future__ import annotations

import json
import os


def _recover(tmp_path, tail_doc):
    """Run bench._load_previous against a synthetic newest artifact."""
    import bench

    path = os.path.join(os.path.dirname(os.path.abspath(bench.__file__)),
                        "BENCH_r999.json")
    with open(path, "w") as f:
        json.dump(tail_doc, f)
    try:
        return bench._load_previous()
    finally:
        os.remove(path)


def test_recovers_r11_compact_value_last_format(tmp_path):
    q = {f"q{i:03d}": round(i / 7, 3) for i in range(95)}
    line = json.dumps(
        {"queries": dict(sorted(q.items(), key=lambda kv: kv[1])),
         "sf": 0.1, "unit": "sec", "metric": "headline_suite_seconds",
         "value": 123.456},
        separators=(",", ":"),
    )
    tail = line[-2000:]
    assert tail.endswith('"value":123.456}')  # the total ALWAYS survives
    name, got = _recover(tmp_path, {"n": 999, "rc": 0, "tail": tail, "parsed": None})
    assert name == "BENCH_r999.json"
    # every row that fully survived the cut is recovered; envelope keys absent
    assert "value" not in got and "sf" not in got
    assert len(got) >= 70
    for k, v in got.items():
        assert q[k] == v


def test_recovers_r10_spaced_value_first_format(tmp_path):
    q = {f"q{i:03d}": round(i / 7, 3) for i in range(95)}
    line = json.dumps(
        {"metric": "headline_suite_seconds", "value": 99.9, "unit": "sec",
         "queries": q, "sf": 0.1}
    )  # default separators: '": ' spacing, value FIRST (the r10 shape)
    tail = line[-2000:]
    name, got = _recover(tmp_path, {"n": 999, "rc": 0, "tail": tail, "parsed": None})
    assert len(got) >= 70
    # the first surviving pair may be cut mid-name and must be dropped,
    # never misattributed
    for k, v in got.items():
        assert q[k] == v


def test_parsed_takes_precedence_over_tail(tmp_path):
    name, got = _recover(
        tmp_path,
        {"n": 999, "rc": 0, "tail": '"junk":1.0',
         "parsed": {"queries": {"real": 2.5}}},
    )
    assert got == {"real": 2.5}
