"""Port the reference generative-family configs (TIGER/LETTER/ETEGRec/
DIGER/R3-VAE — 57 YAMLs) into repo-launchable configs under
configs/<Model>/<stage>/<Dataset>.yaml, hyperparameter-exact.

Key names are remapped to this framework's field names where they
differ (attention_size→head_dim, intermediate_size→ffn_dim,
num_layers→num_encoder_layers(+num_decoder_layers for TIGER),
tokenizer_dropout_rate→dropout_rate, lr_scheduler_type/warmup_epochs →
the Coach's lr_scheduler dict); VALUES are copied verbatim. Stage-dir
semantics (rqvae_gumbel → quantization_strategy: gumbel, pqvae →
product, *kmeans → the k-means SID stages) become explicit keys.

    python tools/port_generative_configs.py [--reference /root/reference]
        [--out ./configs]
"""

from __future__ import annotations

import argparse
import os

import yaml

# (reference model dir, stage dir) -> repo model + extra implied keys
STAGES = {
    ("TIGER", "rqvae"): ("RQVAE", {}),
    ("TIGER", "rqvae_gumbel"): ("RQVAE", {}),
    ("TIGER", "rqvae_rotation"): ("RQVAE", {"quantization_strategy": "rotation"}),
    ("TIGER", "rqvae_simvq"): ("RQVAE", {"quantization_strategy": "simvq"}),
    ("TIGER", "pqvae"): ("RQVAE", {"quantization_strategy": "product"}),
    ("TIGER", "rqkmeans"): (None, {"kmeans": "residual"}),
    ("TIGER", "pqkmeans"): (None, {"kmeans": "product"}),
    ("TIGER", "t5"): ("TIGER", {}),
    ("LETTER", "rqvae"): ("LETTER", {}),
    ("LETTER", "sasrec"): ("SASRec", {}),
    ("LETTER", "t5"): ("TIGER", {}),
    ("ETEGRec", "rqvae"): ("RQVAE", {}),
    ("ETEGRec", "etegrec"): ("ETEGRec", {}),
    ("DIGER", "rqvae"): ("RQVAE", {}),
    ("DIGER", "diger"): ("DIGER", {}),
    ("R3-VAE", "r3vae"): ("R3-VAE", {}),
    ("R3-VAE", "t5"): ("TIGER", {}),
}

# flat key renames applied everywhere (reference name -> repo name)
RENAMES = {
    "attention_size": "head_dim",
    "intermediate_size": "ffn_dim",
    "num_iters": "kmeans_iters",
}
# only when the stage model IS the tokenizer (the joint etegrec/diger
# stages keep tokenizer_dropout_rate distinct from the T5 dropout_rate)
TOKENIZER_RENAMES = {"tokenizer_dropout_rate": "dropout_rate"}

DROP = {"root"}  # supplied at launch


def port_one(ref_path: str, model, implied: dict, stage: str) -> dict:
    with open(ref_path) as fh:
        src = yaml.safe_load(fh) or {}
    out = {}
    if model:
        out["model"] = model
    out.update(implied)
    sched = {}
    for key, value in src.items():
        key = key.replace("-", "_")
        if key in DROP:
            continue
        if key == "lr_scheduler_type":
            sched["which"] = value
            continue
        if key in ("warmup_epochs",):
            sched["warmup_epochs"] = value
            continue
        if key == "num_layers" and model == "TIGER":
            # reference t5 num_layers sets both stacks (train_t5.py T5Config)
            out["num_encoder_layers"] = value
            out["num_decoder_layers"] = value
            continue
        if key == "collab_feat_file" and value in ("...", Ellipsis):
            # reference placeholder: produced per-dataset by
            # encode_collab_features from a finished SASRec run
            out["collab_feat_file"] = None
            continue
        if model in ("RQVAE", "LETTER", "R3-VAE") and key in TOKENIZER_RENAMES:
            key = TOKENIZER_RENAMES[key]
        out[RENAMES.get(key, key)] = value
    if sched:
        # warmup_steps stays a flat key for ETEGRecCoach; only the
        # tokenizer-stage epoch-based schedule becomes the dict
        if model in ("RQVAE", "LETTER", "R3-VAE", None):
            out["lr_scheduler"] = sched
        else:
            out["lr_scheduler_type"] = sched.get("which")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default="./configs")
    args = ap.parse_args()

    n = 0
    for (ref_model, stage), (model, implied) in STAGES.items():
        src_dir = os.path.join(args.reference, ref_model, "configs", stage)
        if not os.path.isdir(src_dir):
            continue
        dst_dir = os.path.join(args.out, ref_model, stage)
        os.makedirs(dst_dir, exist_ok=True)
        for fname in sorted(os.listdir(src_dir)):
            if not fname.endswith(".yaml"):
                continue
            out = port_one(
                os.path.join(src_dir, fname), model, dict(implied), stage
            )
            header = (
                f"# Ported from {ref_model}/configs/{stage}/{fname} "
                "(reference hyperparameters, repo key names; `root` "
                "supplied at launch).\n"
            )
            if stage in ("rqkmeans", "pqkmeans"):
                header += (
                    "# K-means SID stage: launch via examples/"
                    "tiger_pipeline.py --kmeans "
                    f"{implied['kmeans']} --config-tokenizer <this>.\n"
                )
            if ref_model == "DIGER" and stage == "diger":
                header += (
                    "# hot_threshold_ratio/usage_momentum/initial_std are "
                    "reference defaults (DIGER/main.py:55-57); the "
                    "auto-sigma usage tracker is not modeled here — they "
                    "pass through unused.\n"
                )
            with open(os.path.join(dst_dir, fname), "w") as fh:
                fh.write(header)
                yaml.safe_dump(out, fh, sort_keys=False, default_flow_style=None)
            n += 1
    print(f"ported {n} configs into {args.out}")


if __name__ == "__main__":
    main()
