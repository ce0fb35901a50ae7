"""Round-end CLI gate: launch every zoo model through the generic
runner on a tiny synthetic dataset and TRAIN it — side inputs the
reference obtains offline (modality feature pickles, semantic codes,
SID vocabularies) are synthesized here, so OK means "trains end to end
through the CLI", not merely "exits with guidance".

Expected outcome: OK for every model; any FAIL is a runner-wiring or
model bug; GUIDED_EXIT should be empty (kept as a category so a
regression in input synthesis is visible, not fatal).

Usage: python tools/zoo_sweep.py  (CPU, ~10 min warm cache)
"""
import sys, os, io, contextlib, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np

from recboard_tpu import utils
from recboard_tpu.data import synthetic
from recboard_tpu.data.datasets import NextItemRecDataSet
from recboard_tpu.models.zoo import REGISTRY

root = os.environ.get("SWEEP_ROOT", "/tmp/sweep/data")
name = "SW_000_LOU"
if not os.path.isdir(os.path.join(root, "Processed", name)):
    synthetic.make_synthetic_dataset(root, name, num_users=120, num_items=60,
                                     avg_len=10.0, seed=3, markov_strength=0.6,
                                     group_strength=0.3)

# ---- synthesized side inputs (the reference's offline prep steps) ----
ds = NextItemRecDataSet(root, name)
I = ds.fields["ITEM", "ID"].count
feats = np.random.default_rng(0).normal(size=(I, 24)).astype(np.float32)
FEATS = "sweep_feats.pkl"
utils.export_pickle(feats, os.path.join(ds.path, FEATS))

from recboard_tpu.sem.converter import SemIDConverter
from recboard_tpu.sem.kmeans import residual_kmeans_sids

codes = residual_kmeans_sids(feats, num_codebooks=2, num_codewords=8, iters=5)
CODES = "sweep_sem_codes.pkl"
utils.export_pickle(codes, os.path.join(ds.path, CODES))
VOCAB = os.path.join(ds.path, "sweep_sid_vocab.json")
SemIDConverter.from_codes(codes).save(VOCAB)

TFILE = ["--tfile", FEATS]
VFILE = ["--vfile", FEATS]
SEM = ["--sem_feat_file", FEATS]
TINY_T5 = ["--embedding_dim", "32", "--num_heads", "2", "--ffn_dim", "64",
           "--num_beams", "4"]
TINY_TOK = ["--num_codewords", "8", "--num_codebooks", "2",
            "--codebook_dim", "8", "--hidden_dims", "16,8"]

EXTRA = {
    # multimodal family: visual+text feature pickles
    "MMGCN": VFILE + TFILE, "LATTICE": VFILE + TFILE,
    "FREEDOM": VFILE + TFILE, "BM3": VFILE + TFILE, "MGCN": VFILE + TFILE,
    # LLM/text-side models
    "AlphaRec": TFILE,
    "UniSRec": TFILE,
    "E4SRec": TFILE + ["--backbone_dim", "32", "--num_blocks", "1",
                       "--num-heads", "2", "--lora_rank", "4"],
    "CCFRec": TFILE + ["--sem_codes_file", CODES, "--num_negs", "8"],
    # generative family (tokenizers + generators), tiny dims for CPU
    "RQVAE": SEM + TINY_TOK + ["--which4best", "LOSS"],
    "LETTER": SEM + TINY_TOK + ["--which4best", "LOSS",
                                "--num_diversity_clusters", "3"],
    "R3-VAE": SEM + ["--num_codewords", "8", "--num_codebooks", "2",
                     "--which4best", "LOSS"],
    "TIGER": ["--sid_vocab_file", VOCAB] + TINY_T5 +
             ["--num_encoder_layers", "1", "--num_decoder_layers", "1"],
    "ETEGRec": SEM + TINY_TOK + TINY_T5 +
               ["--num_layers", "1", "--num_decoder_layers", "1",
                "--warmup_steps", "2", "--finetune_epochs", "0"],
    "DIGER": SEM + TINY_TOK + TINY_T5 +
             ["--num_layers", "1", "--num_decoder_layers", "1",
              "--freeze_id_encoder", "false"],
}

# CTR models run on a synthetic PREDICTION dataset with a fields schema
import yaml

from recboard_tpu.data.synthetic import CTR_FIELDS_CFG, make_synthetic_ctr_dataset

CTR_NAME = "SW_CTR_000"
if not os.path.isdir(os.path.join(root, "Processed", CTR_NAME)):
    make_synthetic_ctr_dataset(root, CTR_NAME, seed=3)
CTR_CFG = "/tmp/sweep/ctr_fields.yaml"
os.makedirs("/tmp/sweep", exist_ok=True)
with open(CTR_CFG, "w") as fh:
    yaml.safe_dump({"fields": CTR_FIELDS_CFG, "tasktag": "PREDICTION",
                    "ranking": "pool", "monitors": ["LOSS", "AUC"],
                    "which4best": "AUC"}, fh)
CTR_MODELS = {"DeepFM", "DCN"}

import runpy

results = {}
for model in sorted(REGISTRY):
    if model in CTR_MODELS:
        argv = ["run", "--model", model, "--root", root,
                "--dataset", CTR_NAME, "--config", CTR_CFG,
                "--epochs", "1", "--lr", "0.002", "--batch-size", "256",
                "--eval-freq", "10",
                "--log-path", "/tmp/sweep/logs",
                "--checkpoint-path", "/tmp/sweep/infos"]
    else:
        argv = ["run", "--model", model, "--root", root, "--dataset", name,
                "--epochs", "1", "--lr", "0.01", "--batch-size", "32",
                "--eval-freq", "10", "--maxlen", "12",
                "--log-path", "/tmp/sweep/logs",
                "--checkpoint-path", "/tmp/sweep/infos"] + EXTRA.get(model, [])
    sys.argv = argv
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
            runpy.run_module("recboard_tpu.run", run_name="__main__")
        results[model] = ("OK", "")
    except SystemExit as e:
        msg = str(e)[:110].replace("\n", " ")
        results[model] = ("GUIDED_EXIT", msg)
    except Exception as e:
        tb = traceback.format_exc().strip().split("\n")[-1][:110]
        results[model] = ("FAIL", tb)
    print(f"{model:12s} {results[model][0]:12s} {results[model][1]}", flush=True)

n_ok = sum(1 for s, _ in results.values() if s == "OK")
n_g = sum(1 for s, _ in results.values() if s == "GUIDED_EXIT")
n_f = sum(1 for s, _ in results.values() if s == "FAIL")
print(f"\nOK={n_ok} GUIDED={n_g} FAIL={n_f}")
sys.exit(1 if n_f else 0)
