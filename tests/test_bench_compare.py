"""bench_compare: the per-query-ratio analysis the round verdicts
derive must be reproducible from the committed artifacts alone — both
from a builder BENCH_DETAIL/history row and from a driver BENCH_r*.json
whose per-query map survives only as a front-truncated tail capture.
No Spark session needed."""

from __future__ import annotations

import json

import pytest

from tools import bench_compare


def test_driver_artifact_tail_extraction(tmp_path):
    artifact = {
        "n": 8,
        "rc": 0,
        "sf": 0.1,
        # front-truncated: first pair is partial and must be dropped
        "tail": '123, "q_beta": 0.5, "q_gamma": 12.25, '
        '"failed": [], "unit": "sec", "sf": 0.1, "value": 13.75}',
        "parsed": {"metric": "headline_queries_total", "value": 13.75,
                   "sf": 0.1},
    }
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps(artifact))
    run = bench_compare._load_run(str(p))
    assert run["queries"] == {"q_beta": 0.5, "q_gamma": 12.25}
    assert run["producer"] == "driver r8"
    # r10 ADVICE: the driver branch must propagate sf so the cross-sf
    # warning can fire for exactly the artifacts most likely to differ
    assert run["sf"] == 0.1


def test_builder_artifact_passthrough(tmp_path):
    payload = {"queries": {"a": 1.0}, "calib_sec": 0.1, "producer": "x"}
    p = tmp_path / "row.json"
    p.write_text(json.dumps(payload))
    assert bench_compare._load_run(str(p)) == payload


def test_missing_query_map_fails_loudly():
    with pytest.raises(SystemExit):
        bench_compare._queries_of({"parsed": {}})
