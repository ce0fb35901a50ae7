"""Multi-seed benchmark sweep — the reference's de-facto test suite
(SURVEY.md §4.1: every model × dataset × seeds 0-4 committed to
benchmark/<Dataset>/<Model>.json with tight stds as regression
baselines), applied to this framework on the planted-structure
synthetic dataset (no real Amazon/Yelp data exists in this image).

Side inputs the reference prepares offline are synthesized here
(modality feature pickles, semantic codes, SID vocabularies, a
synthetic CTR dataset for DeepFM/DCN with AUC/LOGLOSS), so the store
covers the ENTIRE zoo: sequential/graph/general families, the MM
family, the text/LLM-side models, the CTR family, and the generative
family (TIGER via k-means SIDs; LETTER/R3-VAE through the two-stage
pipeline; ETEGRec/DIGER end to end).

    python tools/seed_sweep.py [--models MF-BPR,SASRec,...] [--seeds 5]
        [--benchmark-root ./benchmark] [--epochs 15]
        [--extra=--some_flag,value]  [--no-record]

Each run goes through the full CLI runner (config snapshot, Coach
lifecycle, early stopping, results.json) with --record-benchmark, then
the leaderboard data is rebuilt. Prints the mean ± std table
(NDCG@10, or AUC for the CTR family).
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

FEATS = "sweep_feats.pkl"
CODES = "sweep_sem_codes.pkl"
VOCAB = "sweep_sid_vocab.json"
COLLAB = "collab_sasrec.pkl"

TFILE = ["--tfile", FEATS]
VFILE = ["--vfile", FEATS]
SEM = ["--sem_feat_file", FEATS]
TINY_T5 = ["--embedding_dim", "32", "--num_heads", "2", "--ffn_dim", "64",
           "--num_beams", "10", "--maxlen", "20",
           "--num_encoder_layers", "1", "--num_decoder_layers", "1"]
TINY_JOINT = ["--embedding_dim", "32", "--num_heads", "2", "--ffn_dim", "64",
              "--num_beams", "10", "--maxlen", "20",
              "--num_layers", "1", "--num_decoder_layers", "1",
              "--num_codewords", "16", "--num_codebooks", "2",
              "--codebook_dim", "16", "--hidden_dims", "32,16"]

MODELS = {
    # model -> extra CLI args
    "MF-BPR": ["--epochs", "200"],  # reference: 1000 epochs + early stop; 30 was cap-bound (probe: 0.027 -> 0.038)
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
    # --- r2 additions: the rest of the zoo -------------------------
    # masked-LM curves are slow (reference gives BERT4Rec 500 epochs vs
    # SASRec 300); the 15-epoch cap starved it to 0.041 — probes: 0.33 @
    # 100, 0.40 @ 250
    "BERT4Rec": ["--maxlen", "20", "--epochs", "250"],
    "GLINT-RU": ["--maxlen", "20"],
    "RUM": ["--maxlen", "20", "--epochs", "200"],  # probe: 0.115 -> 0.224
    "LESSR": ["--maxlen", "20"],
    "SimpleX": ["--epochs", "30"],
    "UltraGCN": ["--epochs", "30"],
    "CAGCN": ["--epochs", "30"],
    "AlphaRec": TFILE + ["--epochs", "30"],
    "MMGCN": VFILE + TFILE + ["--epochs", "20"],
    "LATTICE": VFILE + TFILE + ["--epochs", "20"],
    "FREEDOM": VFILE + TFILE + ["--epochs", "20"],
    "BM3": VFILE + TFILE + ["--epochs", "20"],
    "MGCN": VFILE + TFILE + ["--epochs", "20"],
    "UniSRec": TFILE + ["--maxlen", "20"],
    # E4SRec's frozen item features are SASRec-PRETRAINED collaborative
    # embeddings (reference feeds LLaMA SASRec-trained ID embeddings);
    # raw SVD features measured 0.0317 vs 0.0412 NDCG@10 with the
    # collab pickle (auto-dumped by prepare_side_inputs).
    "E4SRec": ["--tfile", COLLAB, "--maxlen", "20", "--backbone_dim", "32",
               "--num_blocks", "1", "--num-heads", "2",
               "--lora_rank", "4"],
    "CCFRec": TFILE + ["--maxlen", "20", "--sem_codes_file", CODES,
                       "--num_negs", "8", "--hidden_size", "64"],
    # generative budgets: the T5 stage converges ~10x slower than the
    # direct sequential models (probed trajectories: NDCG@10 0.025 @
    # epoch 10 -> 0.065 @ 60 (lr 3e-3) -> 0.107 @ 100 (lr 1e-3);
    # larger T5 capacity measured WORSE at equal epochs: 64-dim/2-layer
    # hit 0.024 @ epoch 34 vs 0.058 for 32-dim/1-layer)
    "TIGER": ["--sid_vocab_file", VOCAB, "--epochs", "100",
              "--lr", "0.001"] + TINY_T5,
    # ETEGRec/DIGER warm-start from a kmeans-init stage-A RQVAE (the
    # reference's committed DIGER runs set rqvae_path + freeze_id_encoder
    # and the ETEGRec config dir ships a stage-1 rqvae config); without
    # it the from-scratch tokenizer COLLAPSES (PPL 1.07/16, 99% item
    # collisions → beam search can only address ~16 items, measured
    # random-level 0.012 NDCG@10 at any budget). The sweep trains the
    # stage-A per seed and substitutes @RQVAE@ with its checkpoint.
    "ETEGRec": SEM + TINY_JOINT + ["--epochs", "300", "--warm_epoch", "4",
                                   "--warmup_steps", "50", "--lr", "0.001",
                                   "--lr_id", "0.0001",
                                   "--rqvae_path", "@RQVAE@",
                                   "--finetune_epochs", "0"],
    "DIGER": SEM + TINY_JOINT + ["--epochs", "200", "--lr", "0.001",
                                 "--lr_id", "0.00001",
                                 "--rqvae_path", "@RQVAE@",
                                 "--freeze_id_encoder", "true"],
    # CTR family: synthetic PREDICTION dataset, AUC/LOGLOSS story
    "DeepFM": ["--epochs", "20"],
    "DCN": ["--epochs", "20"],
}

CTR_MODELS = {"DeepFM", "DCN"}
# embedding-dim tag (reference rows tag the dim, e.g. ["Sequential","64"]);
# the tiny generative/LLM configs run at 32
DIM_TAG = {"TIGER": "32", "ETEGRec": "32", "DIGER": "32", "E4SRec": "32"}
# extra per-model tags (TIGER's direct rows use the k-means tokenizer)
EXTRA_TAGS = {"TIGER": ",rqkmeans"}
# two-stage generative pipeline; the TIGER-* variants each record a
# TIGER tokenizer row (tags rqvae/gumbel/rotation/simvq/pqvae/pqkmeans)
# next to the direct rqkmeans rows — the reference's TIGER.json carries
# one entry per interchangeable tokenizer (7 entries on Beauty)
TOK_TAG = {"TIGER-RQVAE": "rqvae", "TIGER-GUMBEL": "gumbel",
           "TIGER-ROTATION": "rotation", "TIGER-SIMVQ": "simvq",
           "TIGER-PQVAE": "pqvae", "TIGER-PQKMEANS": "pqkmeans",
           "LETTER": "letter", "R3-VAE": "r3-vae"}
PIPELINE_MODELS = set(TOK_TAG)

FAMILY = {
    "MF-BPR": "General", "LightGCN": "Graph", "SASRec": "Sequential",
    "GRU4Rec": "Sequential", "BSARec": "Sequential", "HSTU": "Sequential",
    "FMLP-Rec": "Sequential", "STAMP": "Sequential", "NARM": "Sequential",
    "Caser": "Sequential", "STOSA": "Sequential", "FPMC": "Sequential",
    "NeuMF": "General", "GCN": "Graph", "SimGCL": "Graph+SSL",
    "SGL": "Graph+SSL", "JGCF": "Graph", "PairNorm": "Graph",
    "NGCF": "Graph", "GTE": "General", "SEvo": "Sequential",
    "BERT4Rec": "Sequential", "GLINT-RU": "Sequential", "RUM": "Sequential",
    "LESSR": "Session", "SimpleX": "General", "UltraGCN": "Graph",
    "CAGCN": "Graph", "AlphaRec": "Text+CF", "MMGCN": "Multimodal",
    "LATTICE": "Multimodal", "FREEDOM": "Multimodal", "BM3": "Multimodal",
    "MGCN": "Multimodal", "UniSRec": "Text+Seq", "E4SRec": "LLM+Seq",
    "CCFRec": "SemID+Seq", "TIGER": "Generative", "ETEGRec": "Generative",
    "DIGER": "Generative", "LETTER": "Generative", "R3-VAE": "Generative",
    "DeepFM": "CTR", "DCN": "CTR",
}


def prepare_collab_features(ds, args):
    """SASRec-pretrained item embeddings (E4SRec/LETTER's collab input;
    reference: LETTER/encode_collab_features.py). Trains one SASRec on
    the sweep dataset and dumps its item table via the collab tool."""
    import glob as _glob
    import runpy

    out = os.path.join(ds.path, COLLAB)
    if os.path.isfile(out):
        return
    sys.argv = [
        "run", "--model", "SASRec", "--root", args.root,
        "--dataset", args.dataset, "--epochs", "15", "--maxlen", "20",
        "--lr", "0.005", "--batch-size", "128", "--eval-freq", "5",
        "--seed", "0", "--description", "collab_prep",
        "--record-benchmark", "false",
        "--log-path", "/tmp/seed_sweep/logs",
        "--checkpoint-path", "/tmp/seed_sweep/infos",
    ]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
        runpy.run_module("recboard_tpu.run", run_name="__main__")
    run_dir = sorted(_glob.glob(
        f"/tmp/seed_sweep/logs/collab_prep/{args.dataset}/*"
    ))[-1]
    from tools import encode_collab_features

    encode_collab_features.main(["--run", run_dir, "--output", COLLAB])


def tok_scale(args):
    """Scale the tokenizer address space with the catalog (the r2
    ETEGRec lesson: 2x16 = 256 leaves suits a 300-item toy store; at a
    Beauty-scale 12k catalog it forces ~47-way collisions and caps what
    ANY generative model can address — the reference's own R3-VAE
    Beauty config runs 3x256). 3x64 = 262k addresses, matching the
    kmeans SID sizing in prepare_side_inputs."""
    return (3, 64) if args.num_items > 2000 else (2, 16)


def prepare_rqvae_stage_a(args, seed) -> str:
    """Per-seed stage-A tokenizer (kmeans-init RQVAE on the sweep
    features) for ETEGRec/DIGER warm starts. Returns the checkpoint
    path (cached across models within a seed)."""
    import runpy

    nc, nw = tok_scale(args)
    ckpt = (f"/tmp/seed_sweep/infos/rqvae_s{seed}/{args.dataset}/0/"
            "model.safetensors")
    if os.path.isfile(ckpt):
        return ckpt
    sys.argv = [
        "run", "--model", "RQVAE", "--root", args.root,
        "--dataset", args.dataset, "--sem_feat_file", FEATS,
        "--num_codewords", str(nw), "--num_codebooks", str(nc),
        "--codebook_dim", "16", "--hidden_dims", "32,16",
        "--epochs", "40", "--lr", "0.001", "--apply_kmeans_init", "true",
        # ETEGRec/DIGER consume RAW features (train_etegrec.py:116-121);
        # train the stage-A in the same space
        "--normalize_features", "false",
        "--which4best", "RECON_LOSS", "--seed", str(seed),
        "--description", f"rqvae_s{seed}", "--record-benchmark", "false",
        "--log-path", "/tmp/seed_sweep/logs",
        "--checkpoint-path", "/tmp/seed_sweep/infos",
    ]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
        runpy.run_module("recboard_tpu.run", run_name="__main__")
    if not os.path.isfile(ckpt):
        raise RuntimeError(f"stage-A RQVAE left no checkpoint at {ckpt}")
    return ckpt


def prepare_side_inputs(ds):
    from recboard_tpu import utils
    from recboard_tpu.sem.converter import SemIDConverter
    from recboard_tpu.sem.kmeans import residual_kmeans_sids

    U = ds.fields["USER", "ID"].count
    I = ds.fields["ITEM", "ID"].count
    feats_path = os.path.join(ds.path, FEATS)
    if not os.path.isfile(feats_path):
        # collaborative SVD item factors + noise — the synthetic
        # stand-in for LM/vision features. Real modality features
        # correlate with interaction structure; pure random features
        # made the feature-DRIVEN models (AlphaRec's frozen text
        # geometry, the k-means SID groups feeding TIGER/LETTER)
        # structurally random on this store.
        M = np.zeros((U, I), np.float32)
        users, items = ds.train().to_bigraph_edges()
        M[np.asarray(users), np.asarray(items)] = 1.0
        M /= np.maximum(M.sum(1, keepdims=True), 1.0) ** 0.5
        k = 24
        if U * I > 50_000_000:
            # Beauty-scale catalogs: dense LAPACK SVD of a 22k x 12k
            # matrix is ~TFLOPs (an hour of CPU); a randomized range
            # finder (Halko et al.) needs only O(U*I*(k+p)) flops and
            # matches the top-k factors to the noise floor we inject
            # below anyway.
            rng_svd = np.random.default_rng(1)
            omega = rng_svd.normal(size=(U, k + 8)).astype(np.float32)
            Y = M.T @ omega                      # (I, k+8) range sketch
            Q, _ = np.linalg.qr(M @ Y)           # (U, k+8) orthonormal
            _, s, vt = np.linalg.svd(Q.T @ M, full_matrices=False)
            s, vt = s[:k], vt[:k]
        else:
            _, s, vt = np.linalg.svd(M, full_matrices=False)
        feats = (vt[:k].T * s[:k]).astype(np.float32)
        feats /= max(np.abs(feats).max(), 1e-9)
        feats += (
            np.random.default_rng(0).normal(size=feats.shape).astype(np.float32)
            * 0.02
        )
        utils.export_pickle(feats, feats_path)
    else:
        feats = np.asarray(utils.import_pickle(feats_path), np.float32)
    codes_path = os.path.join(ds.path, CODES)
    if not os.path.isfile(codes_path):
        # SID capacity must scale with the catalog: 2x16 (256 leaves)
        # suits the 300-item toy stores; at a Beauty-scale 12k-item
        # catalog it would force ~47-way collisions per leaf and cap
        # what ANY generative model can address (the r2 ETEGRec
        # collapse failure mode). 3x64 = 262k addresses.
        nc, nw = (3, 64) if I > 2000 else (2, 16)
        codes = residual_kmeans_sids(feats, num_codebooks=nc,
                                     num_codewords=nw, iters=8)
        utils.export_pickle(codes, codes_path)
        SemIDConverter.from_codes(codes).save(os.path.join(ds.path, VOCAB))


def run_pipeline_model(model, args, seed):
    """LETTER / R3-VAE: tokenizer → TIGER generator, recorded under the
    model's own name with a tokenizer tag (the reference's TIGER.json
    rows are pipeline-level metrics per tokenizer)."""
    import runpy

    # tokenizer capacity scales with the catalog (tok_scale): the
    # committed toy rows keep 2x16; Beauty-scale runs get 3x64
    nc, nw = tok_scale(args)
    NW, NC = str(nw), str(nc)
    tok_extra = {
        "LETTER": ["--model", "LETTER", "--num_codewords", NW,
                   "--num_codebooks", NC, "--codebook_dim", "8",
                   "--hidden_dims", "16,8", "--num_diversity_clusters", "4",
                   "--collab-feat-file", COLLAB],
        "R3-VAE": ["--model", "R3-VAE", "--num_codewords", NW,
                   "--num_codebooks", NC],
        "TIGER-RQVAE": ["--model", "RQVAE", "--num_codewords", NW,
                        "--num_codebooks", NC, "--codebook_dim", "8",
                        "--hidden_dims", "16,8",
                        "--apply_kmeans_init", "true"],
        # tokenizer variants (reference configs/TIGER/{rqvae_gumbel,
        # rqvae_rotation,rqvae_simvq,pqkmeans}/): same tiny RQVAE shape,
        # per-variant strategy + its distinguishing hyperparameters
        "TIGER-GUMBEL": ["--model", "RQVAE", "--strategy", "gumbel",
                         "--gumbel_temperature", "5.0",
                         "--num_codewords", NW, "--num_codebooks", NC,
                         "--codebook_dim", "8", "--hidden_dims", "16,8",
                         "--apply_kmeans_init", "true"],
        "TIGER-ROTATION": ["--model", "RQVAE", "--strategy", "rotation",
                           "--num_codewords", NW, "--num_codebooks", NC,
                           "--codebook_dim", "8", "--hidden_dims", "16,8",
                           "--apply_kmeans_init", "true"],
        "TIGER-SIMVQ": ["--model", "RQVAE", "--strategy", "simvq",
                        "--commit_weight", "1.0",
                        "--num_codewords", NW, "--num_codebooks", NC,
                        "--codebook_dim", "8", "--hidden_dims", "16,8",
                        "--apply_kmeans_init", "true"],
        "TIGER-PQVAE": ["--model", "RQVAE", "--strategy", "product",
                        "--num_codewords", NW, "--num_codebooks", NC,
                        "--codebook_dim", "8", "--hidden_dims", "16,8",
                        "--apply_kmeans_init", "true"],
        "TIGER-PQKMEANS": ["--kmeans", "product",
                           "--num_codewords", NW, "--num_codebooks", NC],
    }[model]
    desc = "TIGER" if model.startswith("TIGER-") else model
    tok_tag = TOK_TAG[model]
    argv = [
        "tiger_pipeline.py", "--root", args.root, "--dataset", args.dataset,
        "--sem-feat-file", FEATS, "--rqvae-epochs", "40",
        "--epochs", "100", "--batch-size", "128", "--maxlen", "20",
        "--num-beams", "10", "--seed", str(seed),
        "--out", f"/tmp/seed_sweep/{model}_{seed}",
        "--embedding_dim", "32", "--num_heads", "2", "--ffn_dim", "64",
        "--num_encoder_layers", "1", "--num_decoder_layers", "1",
        "--eval-freq", "3", "--lr", "0.001",
        # ONE comma-list: --tags has replace (not append) semantics, so a
        # repeated flag silently keeps only the last value (r2 store bug:
        # every row carried tags=["64"])
        "--description", desc, "--tags", f"{FAMILY[desc]},32,{tok_tag}",
        "--record-benchmark", str(not args.no_record).lower(),
        "--benchmark-root", args.benchmark_root,
        # ISOLATED checkpoint tree, per MODEL and per SEED: pipeline
        # stage-B shares the CLI description ("TIGER" for the store
        # file), so a shared infos/ root would let concurrent runs
        # clobber each other's best.safetensors (observed: a 41-token
        # TIGER-RQVAE best loaded into a 50-token rqkmeans run at
        # load_best → shape error); the per-seed leaf makes parallel
        # single-seed processes of the SAME variant safe too
        "--log-path", f"/tmp/seed_sweep/logs_{model}/s{seed}",
        "--checkpoint-path", f"/tmp/seed_sweep/infos_{model}/s{seed}",
    ] + tok_extra + [a for a in args.pipeline_extra.split(",") if a]
    sys.argv = argv
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
        runpy.run_path(
            os.path.join(repo, "examples", "tiger_pipeline.py"),
            run_name="__main__",
        )
    line = [ln for ln in buf.getvalue().splitlines() if "best:" in ln]
    return eval(line[-1].split("best:", 1)[1]) if line else {}


# two CTR stores mirror the reference's two BARS datasets
# (DeepFM/configs/{Criteo,Frappe}_x1_BARS.yaml): the Frappe analogue is
# smaller-rows / higher-cardinality-fields
CTR_VARIANTS = {
    "SynCTR_000": dict(seed=3),
    "SynFrappe_000": dict(num_users=500, num_items=200, num_cats=16,
                          rows_per_split=(8000, 1500, 1500), seed=11),
}


def prepare_ctr(args):
    """Synthetic CTR dataset + a fields-schema config for the CLI."""
    import yaml

    from recboard_tpu.data.synthetic import (
        CTR_FIELDS_CFG, make_synthetic_ctr_dataset,
    )

    name = args.ctr_dataset
    if not os.path.isdir(os.path.join(args.root, "Processed", name)):
        make_synthetic_ctr_dataset(args.root, name, **CTR_VARIANTS[name])
    if not args.no_record:
        from recboard_tpu import benchmark as B_

        B_.write_meta(
            args.benchmark_root, name,
            statistics={"task": "CTR prediction (synthetic fields)"},
            build_command="python tools/seed_sweep.py --models DeepFM,DCN",
            description="synthetic CTR dataset with field schema "
                        "(AUC/LOGLOSS story; reference CTR configs are "
                        "Criteo/Frappe BARS with no committed store)",
            sort_by="AUC",
            core_metrics=["AUC", "LOGLOSS"],
        )
    cfg_file = "/tmp/seed_sweep/ctr_fields.yaml"
    os.makedirs("/tmp/seed_sweep", exist_ok=True)
    with open(cfg_file, "w") as fh:
        yaml.safe_dump({"fields": CTR_FIELDS_CFG, "tasktag": "PREDICTION",
                        "ranking": "pool",
                        "monitors": ["LOSS", "AUC", "LOGLOSS"],
                        "which4best": "AUC"}, fh)
    return name, cfg_file


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(MODELS))
    ap.add_argument("--seeds", type=int, default=5,
                    help="EXCLUSIVE end seed (seeds run "
                         "[seed-start, seeds)); with the default "
                         "seed-start 0 this is also the count")
    ap.add_argument("--seed-start", type=int, default=0,
                    help="first seed (top up a partially-recorded row "
                         "without duplicating its existing seeds)")
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--root", default="/tmp/seed_sweep/data")
    ap.add_argument("--benchmark-root", default="./benchmark")
    ap.add_argument("--dataset", default="SynBeauty_000_LOU")
    ap.add_argument("--num-users", type=int, default=800)
    ap.add_argument("--num-items", type=int, default=300)
    ap.add_argument("--markov-strength", type=float, default=0.45)
    ap.add_argument("--group-strength", type=float, default=0.45)
    ap.add_argument("--avg-len", type=float, default=14.0)
    ap.add_argument("--num-groups", type=int, default=6,
                    help="planted item groups; scale with the catalog "
                         "(6 suits a 300-item store; a Beauty-scale "
                         "12k-item catalog wants ~96 so the group "
                         "signal stays learnable at ~126 items/group)")
    ap.add_argument("--group-markov", action="store_true",
                    help="permute successors WITHIN item groups "
                         "(category-local transitions). Required for "
                         "fair CF-family scores at big catalogs: a "
                         "GLOBAL successor permutation puts LOU test "
                         "targets 2 markov hops from the train set — "
                         "invisible to co-occurrence models (measured: "
                         "MF valid 0.024 vs test 0.003 NDCG@10)")
    ap.add_argument("--fast-cf", action="store_true",
                    help="build the dataset with the VECTORIZED CF-graph "
                         "generator (synthetic.make_synthetic_cf_dataset: "
                         "group-affinity + Zipf popularity, no markov "
                         "chain) — the only tractable path at Yelp scale "
                         "(77k x 45.6k x 2.1M: the per-draw markov "
                         "generator would take hours). Uses "
                         "--group-strength/--num-groups/--avg-len; "
                         "ignores --markov-strength/--group-markov")
    ap.add_argument("--splitting", default="LOU", choices=("LOU", "ROU"),
                    help="second store datasets: e.g. --dataset "
                         "SynYelp_000_ROU --splitting ROU "
                         "--markov-strength 0.1 --group-strength 0.75 "
                         "(CF-favoring, the Yelp analogue)")
    ap.add_argument("--ctr-dataset", default="SynCTR_000",
                    choices=sorted(CTR_VARIANTS))
    ap.add_argument("--extra", default="",
                    help="comma-separated extra CLI args appended to every "
                         "run (A/B sweeps: --extra=--shared_negs,true)")
    ap.add_argument("--pipeline-extra", default="",
                    help="comma-separated extra args for the two-stage "
                         "pipeline runs (tiger_pipeline.py flags, e.g. "
                         "--pipeline-extra=--epochs,120,--batch-size,256,"
                         "--on-device-sampling for XL runs)")
    ap.add_argument("--tag-suffix", default="",
                    help="extra comma-led tags appended to every recorded "
                         "entry's tag list (e.g. ',per_row' to store an "
                         "HSTU negs_mode=per_row entry NEXT TO the "
                         "reference-parity per_position one instead of "
                         "topping it up — recorded_seeds matches on the "
                         "full tag list)")
    ap.add_argument("--no-record", action="store_true",
                    help="skip the benchmark store/leaderboard writes "
                         "(pure A/B comparisons)")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real TPU chip instead of pinning CPU. "
                         "The axon tunnel is SINGLE-CLIENT: never run two "
                         "--tpu processes (or any other TPU job) at once — "
                         "serialize them through one queue")
    args = ap.parse_args()
    if args.seed_start >= args.seeds:
        # --seeds is the EXCLUSIVE END seed once --seed-start is set
        # (topping up 0-4 with 5 more = --seed-start 5 --seeds 10); an
        # empty range is always a flag mistake — refuse it loudly
        ap.error(f"empty seed range: --seed-start {args.seed_start} "
                 f">= --seeds {args.seeds} (--seeds is the exclusive "
                 "end seed, not a count)")

    import jax

    # DEFAULT CPU: host generator pipes dispatch per batch, which over the
    # axon TPU tunnel measures the tunnel; and the tunnel is effectively
    # single-client — a second TPU process gets spurious UNIMPLEMENTED
    # errors (observed when this sweep ran concurrently with tpu_bench).
    # --tpu opts in for the slow generative tail (T5 epochs are ~8x
    # faster on the chip than on a sweep-loaded host; r2 ran the TIGER
    # direct rows this way), still one TPU process at a time.
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from recboard_tpu.data import synthetic
    from recboard_tpu.data.datasets import NextItemRecDataSet

    if not os.path.isdir(os.path.join(args.root, "Processed", args.dataset)):
        if args.fast_cf:
            synthetic.make_synthetic_cf_dataset(
                args.root, args.dataset, num_users=args.num_users,
                num_items=args.num_items, avg_len=args.avg_len, seed=7,
                group_strength=args.group_strength,
                num_groups=args.num_groups,
                splitting=args.splitting,
            )
        else:
            synthetic.make_synthetic_dataset(
                args.root, args.dataset, num_users=args.num_users,
                num_items=args.num_items,
                avg_len=args.avg_len, seed=7,
                markov_strength=args.markov_strength,
                group_strength=args.group_strength,
                num_groups=args.num_groups,
                group_markov=args.group_markov,
                splitting=args.splitting,
            )
    ds = NextItemRecDataSet(args.root, args.dataset)
    if not args.no_record:
        from recboard_tpu import benchmark as B_

        U = ds.fields["USER", "ID"].count
        I = ds.fields["ITEM", "ID"].count
        inter = sum(len(v) for v in (ds.train(), ds.valid(), ds.test()))
        stats = {"#Users": U, "#Items": I, "#Interactions": inter,
                 "Avg. Len.": round(inter / max(U, 1), 2)}
        meta_file = os.path.join(args.benchmark_root, args.dataset,
                                 "meta.json")
        if os.path.isfile(meta_file):
            # a committed store dir already exists for this dataset name:
            # the local data (possibly just regenerated in /tmp, which is
            # wiped between rounds) MUST reproduce it, or new rows would
            # silently mix datasets. This bit us: SynGames was originally
            # built with --avg-len 30, the flag wasn't recorded in
            # build_command, and a default-avg-len regeneration produced
            # 11.4k interactions vs the committed 24k — one TIGER row was
            # recorded against the wrong dataset before the mismatch was
            # noticed (row dropped).
            old = json.load(open(meta_file)).get("statistics", {})
            if old and old != stats:
                sys.exit(
                    f"dataset mismatch for {args.dataset}: committed "
                    f"meta.json statistics {old} != regenerated {stats}. "
                    "Pass the ORIGINAL generation knobs (see meta.json "
                    "build_command) or use a fresh dataset name."
                )
        B_.write_meta(
            args.benchmark_root, args.dataset,
            statistics=stats,
            build_command=(
                f"python tools/seed_sweep.py --dataset {args.dataset} "
                f"--splitting {args.splitting} "
                f"--markov-strength {args.markov_strength} "
                f"--group-strength {args.group_strength} "
                f"--num-users {args.num_users} --num-items {args.num_items} "
                f"--avg-len {args.avg_len} --num-groups {args.num_groups}"
                + (" --group-markov" if args.group_markov else "")
                + (" --fast-cf" if args.fast_cf else "")
            ),
            description=(
                f"synthetic planted-structure dataset (markov "
                f"{args.markov_strength} / group {args.group_strength}, "
                f"{args.splitting} split); no real Amazon/Yelp data in "
                "this environment"
            ),
        )
    wanted_models = set(args.models.split(","))
    # side inputs (SVD features / semantic codes / SID vocab) are only
    # needed by the feature-driven families; a SASRec-only sweep must
    # not pay the big-catalog SVD
    needs_side = PIPELINE_MODELS | {
        m for m, extra in MODELS.items()
        if any(a in (FEATS, CODES, VOCAB, COLLAB) for a in extra)
    }
    if wanted_models & needs_side:
        prepare_side_inputs(ds)
    if wanted_models & {"E4SRec", "LETTER"}:
        prepare_collab_features(ds, args)

    import runpy

    def recorded_seeds(model):
        """Seeds already in the store for this (model, tags) entry —
        re-running a wave or topping up must never duplicate a row."""
        if args.no_record:
            return set()
        if model in PIPELINE_MODELS:
            desc = "TIGER" if model.startswith("TIGER-") else model
            tags = [FAMILY[desc], "32", TOK_TAG[model]]
        elif model in CTR_MODELS:
            desc, tags = model, [FAMILY.get(model, "Model")]
        else:
            desc = model
            tags = ([FAMILY.get(model, "Model"), DIM_TAG.get(model, "64")]
                    + [t for t in EXTRA_TAGS.get(model, "").split(",") if t]
                    + [t for t in args.tag_suffix.split(",") if t])
        dataset = args.ctr_dataset if model in CTR_MODELS else args.dataset
        file_ = os.path.join(args.benchmark_root, dataset, f"{desc}.json")
        if not os.path.isfile(file_):
            return set()
        entries = json.load(open(file_))
        entry = next((e for e in entries if e.get("tags") == tags), None)
        if entry is None:
            return set()
        return {r.get("params", {}).get("seed") for r in entry["runs"]}

    table = {}
    wanted = args.models.split(",")
    ctr_ready = None
    for model in wanted:
        metric = "AUC" if model in CTR_MODELS else "NDCG@10"
        vals = []
        done = recorded_seeds(model)
        for seed in range(args.seed_start, args.seeds):
            if seed in done:
                print(f"{model} seed {seed}: SKIP (already in store)",
                      flush=True)
                continue
            if model in PIPELINE_MODELS:
                try:
                    best = run_pipeline_model(model, args, seed)
                except Exception as e:  # keep the sweep going
                    print(f"{model} seed {seed}: FAIL {e}", flush=True)
                    break
                vals.append(best.get(metric, float("nan")))
                print(f"{model} seed {seed}: {metric}={vals[-1]:.4f}",
                      flush=True)
                continue
            if model in CTR_MODELS:
                if ctr_ready is None:
                    ctr_ready = prepare_ctr(args)
                ctr_name, ctr_cfg = ctr_ready
                argv = [
                    "run", "--model", model, "--root", args.root,
                    "--dataset", ctr_name, "--config", ctr_cfg,
                    "--epochs", str(args.epochs),
                    "--lr", "0.002", "--batch-size", "256",
                    "--eval-freq", "3",
                    "--seed", str(seed), "--description", model,
                    "--record-benchmark", str(not args.no_record).lower(),
                    "--benchmark-root", args.benchmark_root,
                    "--tags", FAMILY.get(model, "Model"),
                    "--log-path", "/tmp/seed_sweep/logs",
                    # per-seed tree: parallel single-seed CTR processes
                    # must not share infos/<desc> (clobbered best.safetensors)
                    "--checkpoint-path", f"/tmp/seed_sweep/infos/s{seed}",
                ] + MODELS.get(model, [])
            else:
                tag = (FAMILY.get(model, "Model") + ","
                       + DIM_TAG.get(model, "64") + EXTRA_TAGS.get(model, "")
                       + args.tag_suffix)
                argv = [
                    "run", "--model", model, "--root", args.root,
                    "--dataset", args.dataset, "--epochs", str(args.epochs),
                    "--lr", "0.005", "--batch-size", "128",
                    "--eval-freq", "3",
                    "--seed", str(seed), "--description", model,
                    "--record-benchmark", str(not args.no_record).lower(),
                    "--benchmark-root", args.benchmark_root,
                    "--tags", tag,
                    "--log-path", "/tmp/seed_sweep/logs",
                    # per-SEED checkpoint tree: same-description runs
                    # share infos/<desc>/<dataset>/<ordinal>, so seeds
                    # of one model running in PARALLEL processes would
                    # clobber each other's best.safetensors (the r2
                    # TIGER store bug, this time across seeds)
                    "--checkpoint-path", f"/tmp/seed_sweep/infos/s{seed}",
                ] + MODELS.get(model, [])
                if model in ("ETEGRec", "DIGER"):
                    # tokenizer capacity must scale with the catalog AND
                    # match the stage-A warm start (tok_scale; later
                    # flags override TINY_JOINT's toy 2x16)
                    nc_, nw_ = tok_scale(args)
                    argv += ["--num_codewords", str(nw_),
                             "--num_codebooks", str(nc_)]
            argv += [a for a in args.extra.split(",") if a]
            if "@RQVAE@" in argv:
                try:
                    ckpt = prepare_rqvae_stage_a(args, seed)
                except Exception as e:  # keep the sweep going
                    print(f"{model} seed {seed}: STAGE_A_FAIL {e}", flush=True)
                    break
                argv = [ckpt if a == "@RQVAE@" else a for a in argv]
            sys.argv = argv
            buf = io.StringIO()
            try:
                with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                    runpy.run_module("recboard_tpu.run", run_name="__main__")
            except SystemExit as e:
                print(f"{model} seed {seed}: GUIDED_EXIT {e}", flush=True)
                break
            except Exception as e:
                print(f"{model} seed {seed}: FAIL {type(e).__name__} {e}",
                      flush=True)
                break
            # read the recorded best back out of the run artifacts
            line = [ln for ln in buf.getvalue().splitlines() if "best:" in ln]
            best = eval(line[-1].split("best:", 1)[1]) if line else {}
            vals.append(best.get(metric, float("nan")))
            print(f"{model} seed {seed}: {metric}={vals[-1]:.4f}", flush=True)
        if vals:
            table[model] = (float(np.mean(vals)), float(np.std(vals)))

    from recboard_tpu import benchmark as B

    if not args.no_record:
        B.build_leaderboard_data(
            args.benchmark_root, "./leaderboard/results.json"
        )
    print(json.dumps({
        m: f"{mu:.4f}±{sd:.4f}" for m, (mu, sd) in table.items()
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
