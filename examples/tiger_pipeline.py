"""Generative two-stage pipeline (the reference's train_rqvae.py →
train_t5.py flow, SURVEY.md §3.3) as one runnable script, driven by the
ported reference configs under configs/<Model>/<stage>/.

    # hyperparameter-exact launch from ported configs:
    python examples/tiger_pipeline.py --root ./data \
        --config-tokenizer configs/TIGER/rqvae/Amazon2014Beauty_550_LOU.yaml \
        --config-t5 configs/TIGER/t5/Amazon2014Beauty_550_LOU.yaml

    # k-means SID variants (TIGER rqkmeans/pqkmeans):
    python examples/tiger_pipeline.py --root ./data \
        --config-tokenizer configs/TIGER/rqkmeans/Amazon2014Beauty_550_LOU.yaml \
        --config-t5 configs/TIGER/t5/Amazon2014Beauty_550_LOU.yaml

    # LETTER / R3-VAE: point --config-tokenizer at configs/LETTER/rqvae/*
    # or configs/R3-VAE/r3vae/*; stage B reuses TIGER's generator.

    # ETEGRec / DIGER: stage B is the JOINT model warm-started from the
    # stage-A checkpoint (reference rqvae_path, train_etegrec.py:169-170;
    # a from-scratch tokenizer collapses — see docs/PERF.md):
    python examples/tiger_pipeline.py --root ./data \
        --config-tokenizer configs/ETEGRec/rqvae/Amazon2014Beauty_550_LOU.yaml \
        --config-t5 configs/ETEGRec/etegrec/Amazon2014Beauty_550_LOU.yaml

    # flag-driven launch (no configs) still works:
    python examples/tiger_pipeline.py --root ./data --dataset X \
        --sem-feat-file sem_feats.pkl [--strategy ste|gumbel|rotation|simvq]

Any --key value flag overrides the config (Parser precedence: CLI >
YAML), so smoke runs can cut --epochs without editing configs.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--config-tokenizer", default=None,
                    help="stage-A YAML (configs/<Model>/{rqvae,r3vae,"
                         "rqkmeans,...}/<Dataset>.yaml)")
    ap.add_argument("--config-t5", default=None,
                    help="stage-B YAML (configs/<Model>/t5/<Dataset>.yaml)")
    ap.add_argument("--sem-feat-file", default=None,
                    help="pickle of (N_items, F) semantic features in the "
                         "dataset dir (overrides the config's)")
    ap.add_argument("--collab-feat-file", default=None)
    ap.add_argument("--on-device-sampling", action="store_true",
                    help="stage-B roll windows sampled inside the jitted "
                         "step (DeviceRollSeqSampler) instead of the "
                         "host generator pipe")
    ap.add_argument("--strategy", default=None,
                    choices=(None, "ste", "gumbel", "rotation", "simvq",
                             "product"))
    ap.add_argument("--kmeans", default=None, choices=(None, "residual", "product"))
    ap.add_argument("--rqvae-epochs", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--maxlen", type=int, default=None)
    ap.add_argument("--num-beams", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--out", default="./logs/tiger")
    args, passthrough = ap.parse_known_args()

    import numpy as np
    import yaml

    from recboard_tpu import run as run_mod
    from recboard_tpu import utils
    from recboard_tpu.data.datasets import NextItemRecDataSet
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import TIGER
    from recboard_tpu.models.zoo.tiger import RQVAECoach
    from recboard_tpu.parser import Parser
    from recboard_tpu.sem.converter import SemIDConverter

    def stage_cfg(config_file, description, extra, force=None):
        """Compile a stage config: YAML < CLI overrides (Parser rules).

        ``force`` entries are appended AFTER the caller passthrough so
        the stage keeps its own identity: the tokenizer stage MUST own
        its description/checkpoint tree — a passthrough --description
        (the sweep always passes one for the store file) used to
        override it, landing stage A in stage B's infos/<desc> dir,
        where stage-A load_best could pick up a T5 best.safetensors
        (r5 bug: ScopeParamNotFoundError '/enc_layers_0')."""
        argv = []
        if config_file:
            argv += ["--config", config_file]
        argv += ["--root", args.root, "--seed", str(args.seed),
                 "--description", description]
        if args.dataset:
            argv += ["--dataset", args.dataset]
        for key, val in extra.items():
            if val is not None:
                argv += [f"--{key}", str(val)]
        argv += list(passthrough)
        for key, val in (force or {}).items():
            if val is not None:
                argv += [f"--{key}", str(val)]
        return Parser().compile(argv)

    # peek at the stage-B model first: a joint ETEGRec/DIGER stage B
    # consumes RAW semantic features (train_etegrec.py:116-121), so its
    # stage-A tokenizer must train in the same (un-normalized) space
    stage_b_model = None
    if args.config_t5:
        with open(args.config_t5) as fh:
            stage_b_model = (yaml.safe_load(fh) or {}).get("model")
    joint_b = stage_b_model in ("ETEGRec", "DIGER")

    cfg_a = stage_cfg(
        args.config_tokenizer, "tokenizer",
        {
            "epochs": args.rqvae_epochs,
            "sem_feat_file": args.sem_feat_file,
            "collab_feat_file": args.collab_feat_file,
            "quantization_strategy": args.strategy,
            "kmeans": args.kmeans,
            "normalize_features": "false" if joint_b else None,
        },
        force={
            "description": "tokenizer",
            "log-path": os.path.join(args.out, "tokenizer"),
            "checkpoint-path": os.path.join(args.out, "tokenizer_ckpt"),
            # the sweep's stage-B store identity must not leak in
            "record-benchmark": "false",
        },
    )
    ds = NextItemRecDataSet(args.root, cfg_a.dataset)
    ds.summary()
    utils.mkdirs(args.out)
    vocab_file = os.path.join(args.out, "sid_vocab.json")

    kmeans_kind = cfg_a.get("kmeans")
    if kmeans_kind:
        # ---- stage A': k-means SIDs (TIGER rqkmeans/pqkmeans) ----------
        from recboard_tpu.sem import kmeans as km

        feats = np.asarray(
            utils.import_pickle(os.path.join(ds.path, cfg_a.sem_feat_file)),
            np.float32,
        )
        fn = (
            km.residual_kmeans_sids
            if kmeans_kind == "residual"
            else km.product_kmeans_sids
        )
        codes = fn(
            feats,
            int(cfg_a.get("num_codebooks", 3)),
            int(cfg_a.get("num_codewords", 256)),
            iters=int(cfg_a.get("kmeans_iters", 20)),
            seed=int(cfg_a.seed),
        )
        converter = SemIDConverter.from_codes(codes)
        converter.save(vocab_file)
        utils.infoLogger(f"[pipeline] >>> k-means SIDs → {vocab_file}")
    else:
        # ---- stage A: tokenizer training --------------------------------
        name = cfg_a.get("model", "RQVAE")
        tokenizer = run_mod.build_model(name, ds, cfg_a)
        coach_cls = getattr(type(tokenizer), "COACH", RQVAECoach)
        coach_a = coach_cls(
            dataset=ds,
            trainpipe=tokenizer.sure_trainpipe(int(cfg_a.batch_size)),
            validpipe=None, testpipe=None, model=tokenizer, cfg=cfg_a,
        )
        from recboard_tpu.launcher.coach import EarlyStopError

        eval_freq = max(int(cfg_a.get("eval_freq", 1)), 1)
        try:
            for epoch in range(int(cfg_a.epochs)):
                coach_a.train(epoch)
                if (epoch + 1) % eval_freq == 0:
                    coach_a.evaluate(epoch, mode="valid")
                    summary = coach_a._flush("valid", epoch)
                    # track + checkpoint the best-which4best state (the
                    # reference's tokenizer configs early-stop on PPL):
                    # a quantizer can COLLAPSE late in training (r5: an
                    # R3-VAE seed hit collision 1.000 on the TPU rng
                    # stream) — the emitted vocab must come from the
                    # best checkpoint, not whatever the last epoch left
                    coach_a._check_best(summary, epoch)
        except EarlyStopError as exc:
            utils.infoLogger(f"[pipeline] >>> stage-A early stop: {exc}")
        try:
            coach_a.load_best()
        except FileNotFoundError:
            pass
        coach_a.save_sid_vocab(vocab_file)
        coach_a.save_last()  # → the joint models' rqvae_path warm start
        stage_a_ckpt = os.path.join(cfg_a.CHECKPOINT_PATH, cfg_a.SAVED_FILENAME)
        utils.infoLogger(f"[pipeline] >>> tokenizer SIDs → {vocab_file}")
    converter = SemIDConverter.load(vocab_file)

    # ---- stage B': joint generative models (ETEGRec / DIGER) ------------
    if joint_b:
        import runpy

        if kmeans_kind:
            raise SystemExit(
                f"{stage_b_model} needs a trained stage-A tokenizer "
                "(rqvae config), not k-means SIDs"
            )
        sys.argv = [
            "run", "--config", args.config_t5, "--root", args.root,
            "--dataset", cfg_a.dataset, "--seed", str(args.seed),
            "--rqvae_path", stage_a_ckpt,
            "--description", stage_b_model,
            "--log-path", os.path.join(args.out, "joint"),
            "--checkpoint-path", os.path.join(args.out, "joint_ckpt"),
        ]
        for flag, val in (("--epochs", args.epochs),
                          ("--batch-size", args.batch_size),
                          ("--maxlen", args.maxlen),
                          ("--num_beams", args.num_beams),
                          ("--lr", args.lr)):
            if val is not None:
                sys.argv += [flag, str(val)]
        sys.argv += list(passthrough)
        runpy.run_module("recboard_tpu.run", run_name="__main__")
        return None

    # ---- stage B: seq2seq generator -------------------------------------
    cfg_b = stage_cfg(
        args.config_t5, "TIGER",
        {
            "epochs": args.epochs,
            "batch-size": args.batch_size,
            "maxlen": args.maxlen,
            "num_beams": args.num_beams,
            "lr": args.lr,
            "log-path": os.path.join(args.out, "t5"),
            "checkpoint-path": os.path.join(args.out, "t5_ckpt"),
        },
    )
    fields = run_mod.model_field_names(TIGER)
    kwargs = {
        k: cfg_b[k] for k in fields if k in cfg_b and cfg_b[k] is not None
    }
    kwargs.pop("converter", None)
    model = TIGER(ds, converter=converter, **kwargs)
    maxlen = int(cfg_b.get("maxlen", 20))
    batch_size = int(cfg_b.get("batch_size", 256))
    if args.on_device_sampling:
        from recboard_tpu.data.device import DeviceRollSeqSampler

        trainpipe = DeviceRollSeqSampler(
            ds, maxlen=maxlen, batch_size=batch_size,
            num_pads=0, pad_value=model.Item.count,
        )
    else:
        trainpipe = model.sure_trainpipe(maxlen, batch_size)
    coach_b = Coach(
        dataset=ds,
        trainpipe=trainpipe,
        validpipe=model.sure_validpipe(maxlen, "full"),
        testpipe=model.sure_testpipe(maxlen, "full"),
        model=model,
        cfg=cfg_b,
    )
    best = coach_b.fit()
    utils.infoLogger(f"[pipeline] >>> best: {best}")
    return best


if __name__ == "__main__":
    main()
