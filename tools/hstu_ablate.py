"""Decompose the HSTU training-step time on TPU by ablation.

Variants of the Beauty-config step (B=1024, L=50, D=64, 4 blocks,
2 heads, shared_negs) timed in lax.scan chunks:

  full          the tpu_bench step
  bias_nograd   stop_gradient around rel_bias (kills the backward
                one-hot contraction)
  bias_zero     rel_bias replaced by zeros (kills fwd+bwd bias cost)
  fwd_only      loss value only

Usage: python tools/hstu_ablate.py [--steps 50]
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

BATCH = 1024
MAXLEN = 50
NUM_ITEMS = 12_101


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--extended", action="store_true",
                    help="also time tower-only and single-block variants")
    ap.add_argument("--blocks", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    from recboard_tpu.data import synthetic
    from recboard_tpu.models.zoo import HSTU
    from recboard_tpu.models.zoo import hstu as hstu_mod

    ds = synthetic.synthetic_next_item(
        root="/tmp/recboard_tpu_bench2",
        name="Bench_001_LOU",
        num_users=2048,
        num_items=NUM_ITEMS,
        avg_len=50.0,
        seed=0,
        kcore4user=1,
        kcore4item=0,
    )

    def build(**kw):
        kw.setdefault("num_blocks", args.blocks)
        return HSTU(
            ds, maxlen=MAXLEN, embedding_dim=64, num_heads=2,
            linear_hidden_dim=4, attention_dim=4, num_buckets=128,
            temperature=0.1, shared_negs=True, **kw,
        )

    model = build()
    N = model.Item.count
    rng = np.random.default_rng(0)
    times = np.sort(rng.integers(0, 3_000_000, (BATCH, MAXLEN)), axis=1)
    batch = {
        model.ISeq: jnp.asarray(rng.integers(1, N + 1, (BATCH, MAXLEN)), jnp.int32),
        model.IPos: jnp.asarray(rng.integers(0, N, (BATCH, MAXLEN)), jnp.int32),
        model.Time: jnp.asarray(times, jnp.int32),
    }
    params = model.init(
        {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "sampling": jax.random.PRNGKey(2),
        },
        batch,
    )["params"]
    tx = optax.adam(1e-3)
    base = jax.random.PRNGKey(7)
    steps = args.steps

    def timeit(name, loss_of):
        def step(carry, i):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_of)(p, i)
            up, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, up), o), loss

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_chunk(carry, i0):
            carry, out = jax.lax.scan(step, carry, i0 + jnp.arange(steps))
            return carry, out[-1]

        c = jax.tree_util.tree_map(jnp.copy, (params, tx.init(params)))
        c, out = run_chunk(c, jnp.int32(0))
        jax.block_until_ready(out)
        best = 1e9
        for k in range(1, 4):
            t0 = time.perf_counter()
            c, out = run_chunk(c, jnp.int32(k * steps))
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / steps)
        print(json.dumps({"variant": name, "ms": round(best * 1e3, 4)}), flush=True)

    def loss_plain(p, i):
        loss, _ = model.apply(
            {"params": p},
            batch,
            method="fit",
            rngs={
                "dropout": jax.random.fold_in(base, i),
                "sampling": jax.random.fold_in(base, i + 1_000_000),
            },
        )
        return loss

    timeit("full", loss_plain)

    # non-rematerialized blocks (the pre-default behavior): backward
    # reloads each block's saved (B, H, L, L) qk/attn intermediates
    # from HBM instead of recomputing them (measured 6.09 vs 5.12 ms)
    model_no_remat = build(remat=False)

    def loss_no_remat(p, i):
        loss, _ = model_no_remat.apply(
            {"params": p},
            batch,
            method="fit",
            rngs={
                "dropout": jax.random.fold_in(base, i),
                "sampling": jax.random.fold_in(base, i + 1_000_000),
            },
        )
        return loss

    timeit("no_remat", loss_no_remat)

    # patch StackedRelBias.__call__ via monkeypatching the module class
    orig_call = hstu_mod.StackedRelBias.__call__

    def make_variant(name, wrapped_call):
        hstu_mod.StackedRelBias.__call__ = wrapped_call
        try:
            timeit(name, loss_plain)
        finally:
            hstu_mod.StackedRelBias.__call__ = orig_call

    def call_nograd(self, timestamps):
        return jax.lax.stop_gradient(orig_call(self, timestamps))

    make_variant("bias_nograd", call_nograd)

    def call_zero(self, timestamps):
        out = orig_call(self, timestamps)
        return jnp.zeros_like(jax.lax.stop_gradient(out))

    make_variant("bias_zero", call_zero)

    if args.extended:
        # kill the loss path: grads flow only through mean(user_embds)
        def loss_mean(p, i):
            seqs = batch[model.ISeq]
            user_embds, item_embds = model.apply(
                {"params": p}, batch, False, method="encode",
                rngs={"dropout": jax.random.fold_in(base, i),
                      "sampling": jax.random.fold_in(base, i + 1_000_000)},
            )
            return user_embds.mean() + 0.0 * item_embds.mean()

        timeit("tower_only", loss_mean)

        # single-block model: isolates per-block backward cost
        model1 = HSTU(
            ds, maxlen=MAXLEN, embedding_dim=64, num_heads=2, num_blocks=1,
            linear_hidden_dim=4, attention_dim=4, num_buckets=128,
            temperature=0.1, shared_negs=True,
        )
        params1 = model1.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
             "sampling": jax.random.PRNGKey(2)}, batch)["params"]

        def loss1(p, i):
            loss, _ = model1.apply(
                {"params": p}, batch, method="fit",
                rngs={"dropout": jax.random.fold_in(base, i),
                      "sampling": jax.random.fold_in(base, i + 1_000_000)},
            )
            return loss

        saved = params
        params = params1  # timeit reads the enclosing params
        try:
            timeit("one_block", loss1)
        finally:
            params = saved

    def fwd_step(carry, i):
        return carry, loss_plain(carry, i)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_fwd(carry, i0):
        carry, out = jax.lax.scan(fwd_step, carry, i0 + jnp.arange(steps))
        return carry, out[-1]

    c = jax.tree_util.tree_map(jnp.copy, params)
    c, out = run_fwd(c, jnp.int32(0))
    jax.block_until_ready(out)
    best = 1e9
    for k in range(1, 4):
        t0 = time.perf_counter()
        c, out = run_fwd(c, jnp.int32(k * steps))
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    print(json.dumps({"variant": "fwd_only", "ms": round(best * 1e3, 4)}), flush=True)


if __name__ == "__main__":
    main()
