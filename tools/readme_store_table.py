"""Regenerate the README's committed-store table from benchmark/.

    python tools/readme_store_table.py [--root ./benchmark] [--dataset all]

Prints one markdown table per dataset (NDCG@10 or AUC mean±std across
seeds, best entry per model file), sorted descending — paste into
README.md's "Committed benchmark store" section.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def model_rows(dpath: str):
    rows = []
    for file_ in sorted(os.listdir(dpath)):
        if not file_.endswith(".json") or file_ == "meta.json":
            continue
        with open(os.path.join(dpath, file_)) as fh:
            entries = json.load(fh)
        best = None
        for entry in entries:
            vals = []
            for run in entry.get("runs", []):
                m = run.get("metrics", {}).get("best", {}) or run.get(
                    "metrics", {}
                ).get("test", {})
                for key in ("NDCG@10", "AUC"):
                    if key in m:
                        vals.append((key, float(m[key])))
                        break
            if not vals:
                continue
            key = vals[0][0]
            arr = np.asarray([v for _, v in vals])
            cand = (key, float(arr.mean()), float(arr.std()), len(arr),
                    entry.get("tags", []))
            if best is None or cand[1] > best[1]:
                best = cand
        if best:
            rows.append((file_[:-5], *best))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./benchmark")
    ap.add_argument("--dataset", default="all")
    args = ap.parse_args()
    for ds in sorted(os.listdir(args.root)):
        dpath = os.path.join(args.root, ds)
        if not os.path.isdir(dpath):
            continue
        if args.dataset != "all" and ds != args.dataset:
            continue
        rows = model_rows(dpath)
        rows.sort(key=lambda r: -r[2])
        print(f"\n### {ds} ({len(rows)} models)\n")
        print("| Model | metric | mean±std | seeds |")
        print("|---|---|---|---|")
        for name, key, mu, sd, n, tags in rows:
            tag = f" ({','.join(t for t in tags if t not in ('64',))})" \
                if len(tags) > 1 else ""
            print(f"| {name}{tag} | {key} | {mu:.4f}±{sd:.4f} | {n} |")


if __name__ == "__main__":
    main()
