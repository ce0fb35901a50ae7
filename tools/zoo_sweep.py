"""Round-end CLI gate: launch every zoo model through the generic
runner on a tiny synthetic dataset. Expected outcome: every model
either trains (OK) or exits with guidance naming the missing side
input (GUIDED_EXIT); any FAIL is a runner-wiring or model bug.

Usage: python tools/zoo_sweep.py  (CPU, ~6 min warm cache)
"""
import sys, os, io, contextlib, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from recboard_tpu.data import synthetic
from recboard_tpu.models.zoo import REGISTRY

root = os.environ.get("SWEEP_ROOT", "/tmp/sweep/data")
name = "SW_000_LOU"
if not os.path.isdir(os.path.join(root, "Processed", name)):
    synthetic.make_synthetic_dataset(root, name, num_users=120, num_items=60,
                                     avg_len=10.0, seed=3, markov_strength=0.6,
                                     group_strength=0.3)

import runpy

SKIP = {"RQVAE"}  # tokenizer stage, driven by examples/tiger_pipeline.py
results = {}
for model in sorted(REGISTRY):
    if model in SKIP:
        continue
    argv = ["run", "--model", model, "--root", root, "--dataset", name,
            "--epochs", "1", "--lr", "0.01", "--batch-size", "32",
            "--eval-freq", "10", "--maxlen", "12",
            "--log-path", "/tmp/sweep/logs", "--checkpoint-path", "/tmp/sweep/infos"]
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
