"""Benchmark store (L3) + leaderboard data (L4 feed) tests against the
reference schema (benchmark/*/MF-BPR.json)."""

import json
import os

import numpy as np
import pytest

from recboard_tpu import benchmark as B


def _run(seed, ndcg):
    return {
        "id": f"0001{seed}",
        "params": {"seed": seed, "config": "configs/x.yaml"},
        "metrics": {
            "train": {"LOSS": 0.1},
            "valid": {"NDCG@10": ndcg + 0.001, "HITRATE@10": 2 * ndcg},
            "test": {"NDCG@10": ndcg - 0.001},
            "best": {"NDCG@10": ndcg, "HITRATE@10": 2 * ndcg},
        },
    }


def test_record_and_aggregate(tmp_path):
    root = str(tmp_path / "benchmark")
    for seed, ndcg in enumerate([0.030, 0.032, 0.031]):
        B.record_run(
            root, "Synthetic_000_LOU", "MF-BPR", _run(seed, ndcg),
            tags=["BPR", "64"], config={"lr": 1e-3},
        )
    file_ = os.path.join(root, "Synthetic_000_LOU", "MF-BPR.json")
    entries = json.load(open(file_))
    assert len(entries) == 1  # same tags → same entry
    assert len(entries[0]["runs"]) == 3
    assert entries[0]["tags"] == ["BPR", "64"]

    agg = B.aggregate(entries[0]["runs"])
    assert agg["num_runs"] == 3
    assert agg["metrics"]["NDCG@10"]["mean"] == pytest.approx(0.031)
    assert agg["metrics"]["NDCG@10"]["std"] == pytest.approx(
        np.std([0.030, 0.032, 0.031])
    )

    # a different tag set opens a new entry
    B.record_run(root, "Synthetic_000_LOU", "MF-BPR", _run(9, 0.02), tags=["BPR", "128"])
    entries = json.load(open(file_))
    assert len(entries) == 2


def test_build_leaderboard_data(tmp_path):
    root = str(tmp_path / "benchmark")
    for seed in range(2):
        B.record_run(root, "DS_A", "SASRec", _run(seed, 0.035), tags=["Sequential"])
        B.record_run(root, "DS_A", "MF-BPR", _run(seed, 0.022), tags=["BPR"])
    os.makedirs(os.path.join(root, "DS_A"), exist_ok=True)
    json.dump(
        {"num_users": 10, "num_items": 5, "sort_by": [["NDCG@10", "desc"]],
         "core_metrics": ["NDCG@10", "HitRate@10"]},
        open(os.path.join(root, "DS_A", "meta.json"), "w"),
    )
    out = str(tmp_path / "leaderboard" / "results.json")
    data = B.build_leaderboard_data(root, out)
    assert os.path.isfile(out)
    models = data["datasets"]["DS_A"]["models"]
    assert {m["model"] for m in models} == {"SASRec", "MF-BPR"}
    sas = next(m for m in models if m["model"] == "SASRec")
    assert sas["num_runs"] == 2
    assert sas["metrics"]["NDCG@10"]["mean"] == pytest.approx(0.035)


def test_record_run_concurrent_appends(tmp_path):
    """Parallel per-seed sweep processes append to the same store file;
    the flock in record_run must not lose any run (pre-lock, the
    read-modify-write raced and dropped appends)."""
    import multiprocessing as mp

    root = str(tmp_path / "benchmark")

    procs = [
        mp.Process(
            target=B.record_run,
            args=(root, "DS_C", "SASRec", _run(seed, 0.03)),
            kwargs={"tags": ["Sequential", "64"]},
        )
        for seed in range(8)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
        assert p.exitcode == 0
    entries = json.load(open(os.path.join(root, "DS_C", "SASRec.json")))
    assert len(entries) == 1
    seeds = sorted(r["params"]["seed"] for r in entries[0]["runs"])
    assert seeds == list(range(8))
