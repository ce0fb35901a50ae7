"""Multi-seed benchmark sweep — the reference's de-facto test suite
(SURVEY.md §4.1: every model × dataset × seeds 0-4 committed to
benchmark/<Dataset>/<Model>.json with tight stds as regression
baselines), applied to this framework on the planted-structure
synthetic dataset (no real Amazon/Yelp data exists in this image).

    python tools/seed_sweep.py [--models MF-BPR,SASRec,...] [--seeds 5]
        [--benchmark-root ./benchmark] [--epochs 15]

Each run goes through the full CLI runner (config snapshot, Coach
lifecycle, early stopping, results.json) with --record-benchmark, then
the leaderboard data is rebuilt. Prints the mean ± std NDCG@10 table.
"""

from __future__ import annotations

import argparse
import io
import contextlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODELS = {
    # model -> extra CLI args
    "MF-BPR": ["--epochs", "30"],
    "SASRec": ["--maxlen", "20"],
    "GRU4Rec": ["--maxlen", "20"],
    "BSARec": ["--maxlen", "20"],
    "LightGCN": ["--epochs", "30"],
    "HSTU": ["--maxlen", "20", "--num-blocks", "2"],
    "FMLP-Rec": ["--maxlen", "20"],
    "STAMP": ["--maxlen", "20"],
    "NARM": ["--maxlen", "20"],
    "Caser": ["--maxlen", "5"],
    "STOSA": ["--maxlen", "20"],
    "FPMC": ["--maxlen", "20"],
    "NeuMF": ["--epochs", "30"],
    "GCN": ["--epochs", "30"],
    "SimGCL": ["--epochs", "30"],
    "SGL": ["--epochs", "30"],
    "JGCF": ["--epochs", "30"],
    "PairNorm": ["--epochs", "30"],
    "NGCF": ["--epochs", "30"],
    "GTE": ["--epochs", "1"],
    "SEvo": ["--maxlen", "20"],
}

FAMILY = {
    "MF-BPR": "General", "LightGCN": "Graph", "SASRec": "Sequential",
    "GRU4Rec": "Sequential", "BSARec": "Sequential", "HSTU": "Sequential",
    "FMLP-Rec": "Sequential", "STAMP": "Sequential", "NARM": "Sequential",
    "Caser": "Sequential", "STOSA": "Sequential", "FPMC": "Sequential",
    "NeuMF": "General", "GCN": "Graph", "SimGCL": "Graph+SSL",
    "SGL": "Graph+SSL", "JGCF": "Graph", "PairNorm": "Graph",
    "NGCF": "Graph", "GTE": "General", "SEvo": "Sequential",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(MODELS))
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--root", default="/tmp/seed_sweep/data")
    ap.add_argument("--benchmark-root", default="./benchmark")
    ap.add_argument("--dataset", default="SynBeauty_000_LOU")
    args = ap.parse_args()

    import jax

    # ALWAYS CPU: host generator pipes dispatch per batch, which over the
    # axon TPU tunnel measures the tunnel; and the tunnel is effectively
    # single-client — a second TPU process gets spurious UNIMPLEMENTED
    # errors (observed when this sweep ran concurrently with tpu_bench)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from recboard_tpu.data import synthetic

    if not os.path.isdir(os.path.join(args.root, "Processed", args.dataset)):
        synthetic.make_synthetic_dataset(
            args.root, args.dataset, num_users=800, num_items=300,
            avg_len=14.0, seed=7, markov_strength=0.45, group_strength=0.45,
        )

    import runpy

    table = {}
    for model in args.models.split(","):
        vals = []
        for seed in range(args.seeds):
            argv = [
                "run", "--model", model, "--root", args.root,
                "--dataset", args.dataset, "--epochs", str(args.epochs),
                "--lr", "0.005", "--batch-size", "128", "--eval-freq", "3",
                "--seed", str(seed), "--description", model,
                "--record-benchmark", "true",
                "--benchmark-root", args.benchmark_root,
                "--tags", FAMILY.get(model, "Model"), "--tags", "64",
                "--log-path", "/tmp/seed_sweep/logs",
                "--checkpoint-path", "/tmp/seed_sweep/infos",
            ] + MODELS.get(model, [])
            sys.argv = argv
            buf = io.StringIO()
            try:
                with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                    runpy.run_module("recboard_tpu.run", run_name="__main__")
            except SystemExit as e:
                print(f"{model} seed {seed}: GUIDED_EXIT {e}", flush=True)
                break
            # read the recorded best back out of the run artifacts
            line = [ln for ln in buf.getvalue().splitlines() if "best:" in ln]
            best = eval(line[-1].split("best:", 1)[1]) if line else {}
            vals.append(best.get("NDCG@10", float("nan")))
            print(f"{model} seed {seed}: NDCG@10={vals[-1]:.4f}", flush=True)
        if vals:
            table[model] = (float(np.mean(vals)), float(np.std(vals)))

    from recboard_tpu import benchmark as B

    B.build_leaderboard_data(args.benchmark_root, "./leaderboard/results.json")
    print(json.dumps({
        m: f"{mu:.4f}±{sd:.4f}" for m, (mu, sd) in table.items()
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
