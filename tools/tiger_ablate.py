"""TIGER stage-B step decomposition on the TPU (r2 verdict weak #5).

Times nested subsets of the training step (encoder-only → full
seq2seq logits → logits+CE loss) and of the serving path (encode-only
→ encode+beam+scatter), each as fwd+bwd lax.scan chunks, so the deltas
attribute the step to encoder attention / decoder+cross-attention /
vocab CE, and serving to encode vs trie-beam decode. Results land in
docs/PERF.md.

    python tools/tiger_ablate.py [--steps 20] [--batch 256]

Reference hot path being decomposed: TIGER/train_t5.py:150-210 (train
step + beam generate).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_chunk(fn, steps):
    import jax

    fn(0).block_until_ready()
    best = 1e9
    for k in range(1, 4):
        t0 = time.perf_counter()
        fn(k).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / steps)
    return best * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    from tools.tpu_bench import MAXLEN, _dataset

    from recboard_tpu.data.tags import ID, ITEM
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.sem.converter import SemIDConverter

    ds = _dataset()
    Item = ds.fields[ITEM, ID]
    codes = np.random.default_rng(0).integers(0, 256, size=(Item.count, 3))
    conv = SemIDConverter.from_codes(codes)
    B = args.batch
    model = REGISTRY["TIGER"](ds, converter=conv, maxlen=MAXLEN, num_beams=10)
    rng = np.random.default_rng(0)
    batch = {
        model.ISeq: jnp.asarray(
            rng.integers(0, Item.count, (B, MAXLEN)), jnp.int32
        ),
        model.IPos: jnp.asarray(rng.integers(0, Item.count, (B, 1)), jnp.int32),
    }
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
    )["params"]
    seqs, pos = batch[model.ISeq], batch[model.IPos]
    steps = args.steps

    def scan_grad(loss_of):
        """ms for fwd+bwd of loss_of(params, i) over a scan chunk."""

        @jax.jit
        def chunk(k):
            def body(c, i):
                g = jax.grad(loss_of)(params, i)
                # keep EVERY gradient leaf alive — reducing only one
                # lets XLA dead-code-eliminate most of the backward
                total = sum(
                    leaf.sum() for leaf in jax.tree_util.tree_leaves(g)
                )
                return c + total, None

            out, _ = jax.lax.scan(
                body, jnp.float32(0), k * steps + jnp.arange(steps)
            )
            return out

        return _time_chunk(chunk, steps)

    def fit_loss(p, i):
        loss, _ = model.apply(
            {"params": p}, batch, method="fit",
            rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(7), i)},
        )
        return loss

    def enc_loss(p, i):
        def run(mdl, s):
            toks = mdl._input_tokens(s)
            enc, _ = mdl.seq2seq.encode(toks, deterministic=False)
            return enc.sum()

        return model.apply(
            {"params": p}, seqs, method=run,
            rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(7), i)},
        )

    def logits_loss(p, i):
        def run(mdl, s, t):
            toks = mdl._input_tokens(s)
            targets = mdl._token_table[t[:, 0]]
            dec = jnp.concatenate(
                [jnp.full((targets.shape[0], 1), mdl.converter.pad_id,
                          jnp.int32), targets[:, :-1]], axis=1)
            return mdl.seq2seq(toks, dec, deterministic=False).sum()

        return model.apply(
            {"params": p}, seqs, pos, method=run,
            rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(7), i)},
        )

    out = {"batch": B, "maxlen": MAXLEN, "num_items": int(Item.count),
           "config": "128d 6+6L h4 (reference Beauty scale)"}
    out["train_encoder_ms"] = round(scan_grad(enc_loss), 3)
    out["train_seq2seq_ms"] = round(scan_grad(logits_loss), 3)
    out["train_full_ms"] = round(scan_grad(fit_loss), 3)

    # ---- serving: encode-only vs full beam path ----------------------
    def serve_chunk(apply_fn):
        @jax.jit
        def chunk(k):
            def body(c, i):
                return c + apply_fn(), None

            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
            return out

        return _time_chunk(chunk, steps)

    def enc_only():
        def run(mdl, s):
            enc, _ = mdl.seq2seq.encode(mdl._input_tokens(s))
            return enc.sum()

        return model.apply({"params": params}, seqs, method=run)

    def full_serve():
        scores = model.apply(
            {"params": params}, {model.ISeq: seqs},
            method="recommend_from_full",
        )
        return scores[:, 0].sum()

    out["serve_encode_ms"] = round(serve_chunk(enc_only), 3)
    out["serve_full_ms"] = round(serve_chunk(full_serve), 3)
    dec_cross = out["train_seq2seq_ms"] - out["train_encoder_ms"]
    out["derived"] = {
        "train_decoder_cross_ms": round(dec_cross, 3),
        "train_ce_ms": round(out["train_full_ms"] - out["train_seq2seq_ms"], 3),
        "serve_beam_ms": round(out["serve_full_ms"] - out["serve_encode_ms"], 3),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
