"""Benchmark results store (L3).

Reference schema (benchmark/<Dataset>/<Model>.json): a list of entries
``{description, dataset, tags, runs: [{id, params, metrics: {train,
valid, test, best}}], timestamp, config}`` plus a per-dataset
``meta.json`` with stats / build command / sort_by / core_metrics
(SURVEY.md §1 L3). This module appends Coach results into that store
and aggregates multi-seed statistics the way the leaderboard does
(mean/std of `metrics.best` across seeds — recboard/scripts/
build-data.mjs:49-66).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, List, Optional, Sequence

try:  # non-POSIX: no flock; appends fall back to best-effort (atomic rename
    import fcntl  # still protects readers/crashes, not concurrent writers)
except ImportError:  # pragma: no cover
    fcntl = None  # type: ignore[assignment]

import numpy as np

from . import utils

__all__ = ["record_run", "write_meta", "aggregate", "build_leaderboard_data"]


def write_meta(
    benchmark_root: str,
    dataset: str,
    statistics: Dict[str, Any],
    build_command: str = "",
    description: str = "",
    sort_by: str = "NDCG@10",
    core_metrics: Optional[Sequence[str]] = None,
) -> str:
    """Write the dataset's ``meta.json`` (the reference L3 store carries
    stats / build command / sort_by / core_metrics per dataset —
    benchmark/<Dataset>/meta.json)."""
    path = os.path.join(benchmark_root, dataset)
    utils.mkdirs(path)
    file_ = os.path.join(path, "meta.json")
    meta = {
        "description": description,
        "build_command": build_command,
        "sort_by": sort_by,
        "core_metrics": list(
            core_metrics
            or ["HITRATE@10", "HITRATE@20", "NDCG@10", "NDCG@20"]
        ),
        "statistics": statistics,
    }
    with open(file_, "w") as fh:
        json.dump(meta, fh, indent=2)
        fh.write("\n")
    return file_


def record_run(
    benchmark_root: str,
    dataset: str,
    model: str,
    results: Dict[str, Any],
    config: Optional[Dict[str, Any]] = None,
    tags: Sequence[str] = (),
    description: str = "",
) -> str:
    """Append one run (a Coach results.json payload) to the store."""
    path = os.path.join(benchmark_root, dataset)
    utils.mkdirs(path)
    file_ = os.path.join(path, f"{model}.json")
    # exclusive advisory lock so concurrent sweep processes (parallel
    # per-seed runs) can't lose appends in the read-modify-write
    with open(file_ + ".lock", "w") as lockfh:
        if fcntl is not None:
            with contextlib.suppress(OSError):
                fcntl.flock(lockfh, fcntl.LOCK_EX)
        entries: List[Dict[str, Any]] = []
        if os.path.isfile(file_):
            with open(file_) as fh:
                entries = json.load(fh)
        tags = list(tags)
        entry = next(
            (e for e in entries if e.get("tags") == tags), None
        )
        if entry is None:
            entry = {
                "description": description,
                "dataset": dataset,
                "tags": tags,
                "runs": [],
                "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "config": config or {},
            }
            entries.append(entry)
        entry["runs"].append(results)
        entry["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        # atomic rename: lockless readers (leaderboard build, sweep
        # aggregation) never see a truncated file, and a crash mid-dump
        # can't corrupt the committed store
        tmp = file_ + f".tmp{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(entries, fh, indent=1)
        os.replace(tmp, file_)
    # the .lock file is left in place deliberately: unlinking it would
    # let a new locker open a fresh inode while an old one still holds
    # the removed file's lock (classic flock race); *.lock is gitignored
    return file_


def aggregate(runs: List[Dict[str, Any]], split: str = "best") -> Dict[str, Any]:
    """mean/std of each metric over seeds (build-data.mjs:49-66)."""
    metrics: Dict[str, List[float]] = {}
    seeds = []
    for run in runs:
        seeds.append(run.get("params", {}).get("seed"))
        for name, value in run.get("metrics", {}).get(split, {}).items():
            if isinstance(value, (int, float)):
                metrics.setdefault(name, []).append(float(value))
    return {
        "num_runs": len(runs),
        "seeds": seeds,
        "metrics": {
            name: {
                "mean": float(np.mean(vals)),
                "std": float(np.std(vals)),
            }
            for name, vals in metrics.items()
        },
    }


def build_leaderboard_data(
    benchmark_root: str, out_file: Optional[str] = None
) -> Dict[str, Any]:
    """Aggregate the whole store into the leaderboard payload
    (the build-data.mjs role): per dataset → meta + model entries with
    mean/std best metrics."""
    data: Dict[str, Any] = {"datasets": {}}
    for dataset in sorted(os.listdir(benchmark_root)):
        dpath = os.path.join(benchmark_root, dataset)
        if not os.path.isdir(dpath):
            continue
        meta = {}
        meta_file = os.path.join(dpath, "meta.json")
        if os.path.isfile(meta_file):
            with open(meta_file) as fh:
                meta = json.load(fh)
        models = []
        for file_ in sorted(os.listdir(dpath)):
            if not file_.endswith(".json") or file_ == "meta.json":
                continue
            with open(os.path.join(dpath, file_)) as fh:
                entries = json.load(fh)
            for entry in entries:
                agg = aggregate(entry.get("runs", []))
                models.append(
                    {
                        "model": file_[: -len(".json")],
                        "tags": entry.get("tags", []),
                        "description": entry.get("description", ""),
                        "timestamp": entry.get("timestamp", ""),
                        **agg,
                    }
                )
        data["datasets"][dataset] = {"meta": meta, "models": models}
    if out_file:
        utils.mkdirs(os.path.dirname(os.path.abspath(out_file)))
        with open(out_file, "w") as fh:
            json.dump(data, fh, indent=1)
    return data


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="build leaderboard data")
    ap.add_argument("--benchmark-root", default="./benchmark")
    ap.add_argument("--out", default="./leaderboard/results.json")
    args = ap.parse_args(argv)
    data = build_leaderboard_data(args.benchmark_root, args.out)
    n = sum(len(d["models"]) for d in data["datasets"].values())
    utils.infoLogger(f"[benchmark] >>> wrote {n} entries to {args.out}")


if __name__ == "__main__":
    main()
