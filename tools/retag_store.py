"""One-shot store repair: re-tag benchmark rows written before the
--tags replace-semantics fix (every SynBeauty row carried tags=["64"];
the pre-fix LETTER pipeline row carried ["tokenizer"]).

Rewrites tags in place to the sweep's canonical scheme
([Family, dim] + tokenizer tag for generative pipeline rows — see
tools/seed_sweep.py FAMILY/DIM_TAG/EXTRA_TAGS) so future sweep runs
with correct tags MERGE into these entries instead of forking new ones
(recboard_tpu/benchmark.py:75-88 matches entries by exact tags).

    python tools/retag_store.py [--benchmark-root ./benchmark]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.seed_sweep import DIM_TAG, EXTRA_TAGS, FAMILY  # noqa: E402

# pipeline rows are keyed by tokenizer tag (reference TIGER.json carries
# one row per tokenizer); the pre-fix LETTER row used a bare
# ["tokenizer"] tag
PIPELINE_TOK = {"LETTER": "letter", "R3-VAE": "r3-vae"}


def canonical_tags(model: str) -> list:
    # pipeline rows hard-code dim 32 (seed_sweep.run_pipeline_model)
    dim = "32" if model in PIPELINE_TOK else DIM_TAG.get(model, "64")
    tags = [FAMILY.get(model, "Model"), dim]
    tags += [t for t in EXTRA_TAGS.get(model, "").split(",") if t]
    if model in PIPELINE_TOK:
        tags.append(PIPELINE_TOK[model])
    return tags


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--benchmark-root", default="./benchmark")
    args = ap.parse_args(argv)

    changed = 0
    for file_ in sorted(glob.glob(
        os.path.join(args.benchmark_root, "*", "*.json")
    )):
        if os.path.basename(file_) == "meta.json":
            continue
        model = os.path.basename(file_)[:-5]
        with open(file_) as fh:
            entries = json.load(fh)
        dirty = False
        for entry in entries:
            if entry.get("tags") in (["64"], ["tokenizer"]):
                entry["tags"] = canonical_tags(model)
                dirty = True
        if dirty:
            with open(file_, "w") as fh:
                json.dump(entries, fh, indent=1)
            changed += 1
            print(f"retagged {file_} -> {entries[0]['tags']}")
    print(f"{changed} files retagged")

    from recboard_tpu import benchmark as B

    B.build_leaderboard_data(args.benchmark_root, "./leaderboard/results.json")
    print("leaderboard rebuilt")


if __name__ == "__main__":
    main()
