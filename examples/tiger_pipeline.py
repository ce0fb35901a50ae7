"""TIGER two-stage pipeline (the reference's train_rqvae.py →
train_t5.py flow, SURVEY.md §3.3) as one runnable script.

Stage A trains the RQ-VAE tokenizer on item semantic features and
writes sid_vocab.json; stage B trains the seq2seq generator over the
emitted semantic IDs with trie-constrained evaluation.

    python examples/tiger_pipeline.py --root ./data --dataset X \
        --sem-feat-file sem_feats.pkl [--strategy ste|gumbel|rotation|simvq]

With --collab-feat-file this becomes the LETTER pipeline; with
--strategy rotation it is R3-VAE; --kmeans residual|product skips
stage A entirely and uses k-means semantic IDs (TIGER's R-KMeans /
PQ-KMeans variants).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--sem-feat-file", required=True,
                    help="pickle of (N_items, F) semantic features in the dataset dir")
    ap.add_argument("--collab-feat-file", default=None)
    ap.add_argument("--on-device-sampling", action="store_true",
                    help="stage-B roll windows sampled inside the jitted "
                         "step (DeviceRollSeqSampler) instead of the "
                         "host generator pipe")
    ap.add_argument("--strategy", default="ste",
                    choices=("ste", "gumbel", "rotation", "simvq", "product"))
    ap.add_argument("--kmeans", default=None, choices=(None, "residual", "product"))
    ap.add_argument("--num-codebooks", type=int, default=3)
    ap.add_argument("--num-codewords", type=int, default=256)
    ap.add_argument("--codebook-dim", type=int, default=32)
    ap.add_argument("--rqvae-epochs", type=int, default=200)
    ap.add_argument("--maxlen", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--num-beams", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--out", default="./logs/tiger")
    args = ap.parse_args()

    import numpy as np

    from recboard_tpu import utils
    from recboard_tpu.data.datasets import NextItemRecDataSet
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import RQVAE, RQVAECoach, TIGER
    from recboard_tpu.parser import Parser
    from recboard_tpu.sem.converter import SemIDConverter

    ds = NextItemRecDataSet(args.root, args.dataset)
    ds.summary()
    feats = np.asarray(
        utils.import_pickle(os.path.join(ds.path, args.sem_feat_file)), np.float32
    )

    vocab_file = os.path.join(args.out, "sid_vocab.json")
    utils.mkdirs(args.out)

    if args.kmeans:
        from recboard_tpu.sem import kmeans as km

        fn = km.residual_kmeans_sids if args.kmeans == "residual" else km.product_kmeans_sids
        codes = fn(feats, args.num_codebooks, args.num_codewords, seed=args.seed)
        converter = SemIDConverter.from_codes(codes)
        converter.save(vocab_file)
        utils.infoLogger(f"[tiger] >>> k-means SIDs → {vocab_file}")
    else:
        # ---- stage A: RQ-VAE tokenizer ---------------------------------
        pa = Parser()
        pa.set_defaults(
            description="RQVAE", root=args.root, dataset=args.dataset,
            epochs=args.rqvae_epochs, batch_size=1024, optimizer="adamw",
            lr=1e-3, eval_freq=max(args.rqvae_epochs // 5, 1),
            log_path=os.path.join(args.out, "rqvae"),
            checkpoint_path=os.path.join(args.out, "rqvae_ckpt"),
            monitors=["LOSS"], which4best="LOSS", seed=args.seed,
        )
        cfg_a = pa.compile([])
        collab = (
            np.asarray(
                utils.import_pickle(os.path.join(ds.path, args.collab_feat_file)),
                np.float32,
            )
            if args.collab_feat_file
            else None
        )
        tokenizer = RQVAE(
            ds, item_features=feats, codebook_dim=args.codebook_dim,
            num_codebooks=args.num_codebooks, num_codewords=args.num_codewords,
            quantization_strategy=args.strategy,
            collab_features=collab, cf_weight=0.01 if collab is not None else 0.0,
        )
        coach_a = RQVAECoach(
            dataset=ds, trainpipe=tokenizer.sure_trainpipe(1024),
            validpipe=None, testpipe=None, model=tokenizer, cfg=cfg_a,
        )
        for epoch in range(args.rqvae_epochs):
            coach_a.train(epoch)
            if (epoch + 1) % cfg_a.eval_freq == 0:
                coach_a.evaluate(epoch, mode="valid")
                coach_a._flush("valid", epoch)
        coach_a.save_sid_vocab(vocab_file)
        utils.infoLogger(f"[tiger] >>> tokenizer SIDs → {vocab_file}")
        converter = SemIDConverter.load(vocab_file)

    # ---- stage B: seq2seq generator ------------------------------------
    pb = Parser()
    pb.set_defaults(
        description="TIGER", root=args.root, dataset=args.dataset,
        epochs=args.epochs, batch_size=args.batch_size, optimizer="adamw",
        lr=args.lr, eval_freq=5, early_stop_patience=5,
        log_path=os.path.join(args.out, "t5"),
        checkpoint_path=os.path.join(args.out, "t5_ckpt"),
        monitors=["LOSS", "HitRate@5", "HitRate@10", "NDCG@5", "NDCG@10"],
        which4best="NDCG@10", seed=args.seed,
    )
    cfg_b = pb.compile([])
    model = TIGER(ds, converter=converter, maxlen=args.maxlen,
                  num_beams=args.num_beams)
    if args.on_device_sampling:
        from recboard_tpu.data.device import DeviceRollSeqSampler

        trainpipe = DeviceRollSeqSampler(
            ds, maxlen=args.maxlen, batch_size=args.batch_size,
            num_pads=0, pad_value=model.Item.count,
        )
    else:
        trainpipe = model.sure_trainpipe(args.maxlen, args.batch_size)
    coach_b = Coach(
        dataset=ds,
        trainpipe=trainpipe,
        validpipe=model.sure_validpipe(args.maxlen, "full"),
        testpipe=model.sure_testpipe(args.maxlen, "full"),
        model=model,
        cfg=cfg_b,
    )
    best = coach_b.fit()
    utils.infoLogger(f"[tiger] >>> best: {best}")


if __name__ == "__main__":
    main()
