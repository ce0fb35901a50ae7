"""One-off store-tag backfill (r2). --tags has replace semantics, so the
sweep's repeated ``--tags Family --tags 64`` silently recorded only the
last value — every committed row carried tags=["64"] (or a bare
tokenizer tag) instead of the reference-style ["Sequential", "64"]
(reference: benchmark/Amazon2014Beauty_550_LOU/SASRec.json tags).

Rewrites each entry's tags to [family, dim(, tokenizer)] using the
sweep's FAMILY table. Tokenizer tags already on rows (rqkmeans/rqvae)
are preserved; pipeline rows whose tag degenerated to the generic
"tokenizer" get the model's own tokenizer name. Idempotent.

    python tools/backfill_store_tags.py [--root ./benchmark]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.seed_sweep import DIM_TAG, FAMILY  # noqa: E402

TOKENIZER_TAGS = {"rqkmeans", "rqvae", "letter", "r3-vae"}
# degenerate pipeline tag -> the model's own tokenizer name
RENAME = {("LETTER", "tokenizer"): "letter", ("R3-VAE", "tokenizer"): "r3-vae"}


def backfill(root):
    changed = 0
    for dataset in sorted(os.listdir(root)):
        dpath = os.path.join(root, dataset)
        if not os.path.isdir(dpath):
            continue
        for fname in sorted(os.listdir(dpath)):
            if not fname.endswith(".json") or fname == "meta.json":
                continue
            model = fname[:-5]
            fpath = os.path.join(dpath, fname)
            with open(fpath) as fh:
                entries = json.load(fh)
            dirty = False
            for entry in entries:
                old = list(entry.get("tags") or [])
                family = FAMILY.get(model, "Model")
                toks = [RENAME.get((model, t), t) for t in old
                        if t in TOKENIZER_TAGS or (model, t) in RENAME]
                if family == "CTR":
                    new = [family]
                else:
                    # pipeline rows (LETTER/R3-VAE/TIGER-RQVAE) record
                    # dim 32 (seed_sweep.run_pipeline_model hard-codes
                    # the tiny-T5 tag); future runs must merge into the
                    # same entry, so the backfill must match
                    dim = ("32" if model in ("LETTER", "R3-VAE")
                           else DIM_TAG.get(model, "64"))
                    new = [family, dim] + toks
                if new != old:
                    entry["tags"] = new
                    dirty = True
            if dirty:
                with open(fpath, "w") as fh:
                    json.dump(entries, fh, indent=1)
                changed += 1
                print(f"backfilled {dataset}/{fname}")
    print(f"{changed} files rewritten")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./benchmark")
    backfill(ap.parse_args().root)
