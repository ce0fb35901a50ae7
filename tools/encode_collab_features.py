"""Dump a finished run's item-embedding table as LETTER's
collaborative-feature pickle.

Reference: LETTER/encode_collab_features.py trains a SASRec and exports
`model.Item.embeddings.weight[NUM_PADS:]` to `<LOG_PATH>/sasrec-<ds>.pkl`
— the `collab_feat_file` the LETTER tokenizer aligns against. Here any
FINISHED run works: reload its best/last params (the serve.py loading
path) and export the item table minus pad rows.

    python tools/encode_collab_features.py --run <LOG_PATH> \
        [--output collab_sasrec.pkl]

With --output relative, the pickle lands in the run's DATASET dir so
`--collab_feat_file <name>` finds it.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_item_table(params, n_items: int, num_pads: int):
    """The item embedding table: a 2-D float leaf with exactly
    n_items + num_pads rows (every zoo model's convention)."""
    import jax
    import numpy as np

    hits = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        arr = np.asarray(leaf)
        if arr.ndim == 2 and arr.shape[0] == n_items + num_pads:
            hits.append((name, arr))
    # prefer explicitly-named embedding tables
    named = [h for h in hits if "embed" in h[0].lower()]
    return (named or hits)[0] if (named or hits) else (None, None)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True,
                    help="LOG_PATH of a finished run (contains config.yaml)")
    ap.add_argument("--filename", default=None,
                    help="params pickle under CHECKPOINT_PATH")
    ap.add_argument("--output", default=None,
                    help="output pickle (default: collab_<model>.pkl in "
                         "the dataset dir)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import numpy as np

    from recboard_tpu import run as run_mod
    from recboard_tpu import serve, utils

    cfg = serve.load_run_config(args.run)
    dataset = run_mod.load_dataset(cfg)
    model = run_mod.build_model(cfg.model, dataset, cfg)

    ckpt_dir = cfg.get("CHECKPOINT_PATH") or args.run
    names = [args.filename] if args.filename else [
        cfg.get("BEST_FILENAME", "best.pkl"),
        cfg.get("SAVED_FILENAME", "model.pkl"),
    ]
    payload = None
    for name in names:
        path = os.path.join(ckpt_dir, name)
        if os.path.exists(path):
            payload = utils.import_pickle(path)
            break
    if payload is None:
        raise SystemExit(f"no params pickle under {ckpt_dir} (tried {names})")

    n_items = model.Item.count
    num_pads = int(getattr(model, "NUM_PADS", 0))
    name, table = find_item_table(payload["params"], n_items, num_pads)
    if table is None:
        raise SystemExit(
            f"no (n_items + {num_pads})-row 2-D table found in the params"
        )
    feats = np.asarray(table[num_pads:], np.float32)
    out = args.output or f"collab_{cfg.model.lower()}.pkl"
    if not os.path.isabs(out):
        out = os.path.join(dataset.path, out)
    utils.export_pickle(feats, out)
    utils.infoLogger(
        f"[collab] >>> {feats.shape} item embeddings from {name!r} -> {out}"
    )
    return out


if __name__ == "__main__":
    main()
