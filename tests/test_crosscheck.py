"""Cross-framework parity (reference test strategy #2, SURVEY.md §4):
our SASRec vs a PyTorch SASRec under identical pipes/protocol must land
within a few points of each other."""

import json
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_sasrec_crosscheck_parity():
    proc = subprocess.run(
        [sys.executable, "tools/crosscheck_sasrec.py", "--epochs", "15"],
        capture_output=True,
        text=True,
        timeout=900,
        env={
            "PYTHONPATH": "/root/repo",
            "PATH": "/usr/bin:/bin:/opt/venv/bin",
            "JAX_PLATFORMS": "cpu",
        },
    )
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    j, t = out["jax"], out["torch"]
    assert j["HR@10"] > 0.3 and t["HR@10"] > 0.3, out  # both learn
    assert abs(j["NDCG@10"] - t["NDCG@10"]) < 0.12, out
    assert abs(j["HR@10"] - t["HR@10"]) < 0.12, out
