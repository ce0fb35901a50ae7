"""Decompose the SASRec training-step time on TPU by ablation.

Each variant is the bench step (B=1024, L=50, D=64, 12.1k items,
BCE) with one piece removed, timed inside a lax.scan chunk (tunnel
noise rule, see CLAUDE.md). The deltas between variants bound each
component's cost:

  full         fwd + bwd + adam  (the bench step)
  no_adam      fwd + bwd, grads consumed by a sum
  no_embgrad   fwd + bwd but stop_gradient at the embedding gathers
               (kills the table scatters; dense-layer grads remain)
  fwd_only     loss value only, no backward
  fwd_nodrop   loss value, deterministic (no dropout masks)
  encode_only  transformer tower fwd only (no loss, no neg gather)

Usage: python tools/step_ablate.py [--steps 50]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    from recboard_tpu.data import synthetic
    from recboard_tpu.models.zoo import SASRec

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
    model = SASRec(ds, maxlen=MAXLEN, embedding_dim=64, num_blocks=2)
    N = model.Item.count
    rng = np.random.default_rng(0)
    batch = {
        model.ISeq: jnp.asarray(rng.integers(1, N + 1, (BATCH, MAXLEN)), jnp.int32),
        model.IPos: jnp.asarray(rng.integers(0, N, (BATCH, MAXLEN)), jnp.int32),
        model.INeg: jnp.asarray(rng.integers(0, N, (BATCH, MAXLEN)), jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
    )["params"]
    tx = optax.adam(1e-3)
    base = jax.random.PRNGKey(7)
    steps = args.steps

    def timeit(name, step_fn, carry_init):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_chunk(carry, i0):
            carry, out = jax.lax.scan(step_fn, carry, i0 + jnp.arange(steps))
            return carry, out[-1]

        # donation consumes the carry — hand each variant its own copy
        c = jax.tree_util.tree_map(jnp.copy, carry_init())
        c, out = run_chunk(c, jnp.int32(0))
        jax.block_until_ready(out)
        best = 1e9
        for k in range(1, 4):
            t0 = time.perf_counter()
            c, out = run_chunk(c, jnp.int32(k * steps))
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / steps)
        print(json.dumps({"variant": name, "ms": round(best * 1e3, 4)}), flush=True)

    model_nodrop = SASRec(
        ds, maxlen=MAXLEN, embedding_dim=64, num_blocks=2, dropout_rate=0.0
    )

    def loss_of(p, i, nodrop=False, stop_emb=False):
        rngs = {"dropout": jax.random.fold_in(base, i)}
        if stop_emb:
            p = jax.tree_util.tree_map_with_path(
                lambda path, x: (
                    jax.lax.stop_gradient(x)
                    if any("embeddings" in str(getattr(k, "key", k)) for k in path)
                    else x
                ),
                p,
            )
        mdl = model_nodrop if nodrop else model
        loss, _ = mdl.apply({"params": p}, batch, method="fit", rngs=rngs)
        return loss

    # full step
    def full_step(carry, i):
        p, o = carry
        loss, grads = jax.value_and_grad(loss_of)(p, i)
        up, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, up), o), loss

    timeit("full", full_step, lambda: (params, tx.init(params)))

    # full step, bf16 compute (the Coach's cast_compute mixed precision)
    def loss_bf16(p, i):
        pc = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            p,
        )
        return loss_of(pc, i)

    def full_bf16_step(carry, i):
        p, o = carry
        loss, grads = jax.value_and_grad(loss_bf16)(p, i)
        up, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, up), o), loss

    timeit("full_bf16", full_bf16_step, lambda: (params, tx.init(params)))

    # block rematerialization: recompute the forward in bwd instead of
    # reloading saved intermediates. Measured LOSING on SASRec (2.87 vs
    # 3.48 ms on the v5e bench config): the dropout-heavy forward
    # recompute costs more than the reloads it saves at 2 blocks —
    # unlike HSTU, whose 4 blocks of (B, H, L, L) intermediates make
    # remat a 16% win (tools/hstu_ablate.py).
    model_remat = SASRec(
        ds, maxlen=MAXLEN, embedding_dim=64, num_blocks=2, remat=True
    )

    def full_remat_step(carry, i):
        p, o = carry

        def loss_remat(p, i):
            loss, _ = model_remat.apply(
                {"params": p}, batch, method="fit",
                rngs={"dropout": jax.random.fold_in(base, i)},
            )
            return loss

        loss, grads = jax.value_and_grad(loss_remat)(p, i)
        up, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, up), o), loss

    timeit("full_remat", full_remat_step, lambda: (params, tx.init(params)))

    # no adam: consume grads with a scalar reduction, keep params as carry
    def no_adam(p, i):
        loss, grads = jax.value_and_grad(loss_of)(p, i)
        s = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        p = jax.tree_util.tree_map(lambda x: x + 0e0 * jnp.float32(0), p)
        return p, loss + s * 1e-30

    def no_adam_step(carry, i):
        p = carry
        p, loss = no_adam(p, i)
        return p, loss

    timeit("no_adam", no_adam_step, lambda: params)

    # no embedding grads
    def no_embgrad_step(carry, i):
        p, o = carry
        loss, grads = jax.value_and_grad(
            functools.partial(loss_of, stop_emb=True)
        )(p, i)
        up, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, up), o), loss

    timeit("no_embgrad", no_embgrad_step, lambda: (params, tx.init(params)))

    # fwd only
    def fwd_step(carry, i):
        loss = loss_of(carry, i)
        return carry, loss

    timeit("fwd_only", fwd_step, lambda: params)

    def fwd_nodrop_step(carry, i):
        loss = loss_of(carry, i, nodrop=True)
        return carry, loss

    timeit("fwd_nodrop", fwd_nodrop_step, lambda: params)

    # encode only
    def encode_step(carry, i):
        u, _ = model.apply(
            {"params": carry},
            batch,
            method="encode",
            rngs={"dropout": jax.random.fold_in(base, i)},
            deterministic=False,
        )
        return carry, jnp.sum(u) * 1e-30
    timeit("encode_only", encode_step, lambda: params)


if __name__ == "__main__":
    main()
