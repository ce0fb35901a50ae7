"""HBM-scale catalog benchmark — train + serve a SASRec-style model
over a multi-10M-row item table on ONE chip.

The BASELINE.json north star calls for "tables exceeding single-chip
HBM"; every other bench in this repo runs the reference's 12.1k-item
catalogs. This tool exercises the big-table machinery
(parallel/big_table.py) at production catalog scale:

* item table 20M x 64 f32 = 5.1 GB (40M = 10.2 GB — most of a 16 GB
  v5e) trained with row-wise AdaGrad sparse updates: the step cost is
  O(touched rows), a dense-Adam step would need 3x the table in HBM
  plus an O(V*D) update and does not fit at 40M.
* training step: (B, L) sequence gather -> 2-block causal tower ->
  per-row sampled softmax over (B, K) negatives (the recommended TPU
  negatives mode, docs/PERF.md) with positives as a shifted view of
  the sequence gather (no second table gather).
* serving: blocked_top_k streams the FULL catalog in 2M-row slabs —
  a (B, 20M) score matrix would be 82 GB and can never exist.

    python tools/big_table_bench.py [--vocab 20000000] [--steps 20]

Prints one JSON line per phase (train/serve) with ms, examples/s,
table GB, and device memory stats. Multi-chip correctness of the same
path (row-sharded table, no full-table all-gather) is pinned on the
8-device CPU mesh by tests/test_big_table.py.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(vocab=20_000_000, dim=64, batch=1024, maxlen=50, negs=512,
            steps=20, topk_block=131_072, quiet=False):
    """Run both phases; returns [train_dict, serve_dict]."""
    import types

    args = types.SimpleNamespace(
        vocab=vocab, dim=dim, batch=batch, maxlen=maxlen, negs=negs,
        steps=steps, topk_block=topk_block, quiet=quiet,
    )
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    from recboard_tpu.ops import attention as attn_ops
    from recboard_tpu.parallel.big_table import (
        apply_row_grads,
        blocked_top_k,
        init_rowwise_adagrad,
    )

    V, D, B, L, K = args.vocab, args.dim, args.batch, args.maxlen, args.negs

    import flax.linen as nn

    class Tower(nn.Module):
        """Causal encoder over pre-gathered rows (the table lives
        outside the module — that's the point)."""

        @nn.compact
        def __call__(self, rows):  # (B, L, D)
            x = rows * jnp.sqrt(jnp.float32(D))
            x = x + self.param(
                "pos", nn.initializers.normal(0.02), (L, D)
            )[None]
            for _ in range(2):
                qkv = nn.DenseGeneral((3, D), axis=-1)(nn.LayerNorm()(x))
                x = x + attn_ops.mha(
                    qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :],
                    num_heads=1, causal=True,
                )
                h = nn.Dense(4 * D)(nn.LayerNorm()(x))
                x = x + nn.Dense(D)(nn.relu(h))
            return nn.LayerNorm()(x)

    tower = Tower()
    key = jax.random.PRNGKey(0)
    state = init_rowwise_adagrad(key, V, D, scale=0.05)
    dense = tower.init(key, jnp.zeros((B, L, D)))
    tx = optax.adam(1e-3)
    opt = tx.init(dense)

    t_bytes = state.table.nbytes + state.acc.nbytes

    # TWO programs, not one: a single jitted program that GATHERS from
    # the table and later SCATTERS into it forces the compiler to keep
    # two table-sized buffers live (measured: 17.8 GB assignment for a
    # 5.1 GB table at V=20M — compile-time OOM on a 16 GB chip). With
    # the gather+grad program reading the table (no donation) and a
    # separate donated update program, each aliases in place.
    @jax.jit
    def grad_step(table, dense, ids_seq, ids_neg):
        rows_seq = table[ids_seq]  # (B, L, D)
        rows_neg = table[ids_neg]  # (B, K, D)

        def loss_fn(dense, rows_seq, rows_neg):
            h = tower.apply(dense, rows_seq)
            # positives = next item's rows — a shifted VIEW of the
            # sequence gather (no extra table gather; ops/losses
            # fused-gather trick, tests/test_fused_gather.py)
            pos = jnp.roll(rows_seq, -1, axis=1)
            q = h[:, :-1]  # predict positions 1..L-1
            p = pos[:, :-1]
            pl = jnp.einsum("bld,bld->bl", q, p)
            nl = jnp.einsum("bld,bkd->blk", q, rows_neg)
            logits = jnp.concatenate([pl[..., None], nl], axis=-1)
            return -jnp.mean(jax.nn.log_softmax(logits)[..., 0])

        loss, (g_dense, g_seq, g_neg) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2)
        )(dense, rows_seq, rows_neg)
        grads = jnp.concatenate(
            [g_seq.reshape(-1, D), g_neg.reshape(-1, D)]
        )
        return loss, g_dense, grads

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("lr",))
    def update_table(state, ids, grads, lr):
        return apply_row_grads(state, ids, grads, lr=lr)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def update_dense(dense, opt, g_dense):
        up, opt = tx.update(g_dense, opt, dense)
        return optax.apply_updates(dense, up), opt

    rng = np.random.default_rng(0)
    ids_seq = jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32)
    ids_neg = jnp.asarray(rng.integers(0, V, (B, K)), jnp.int32)
    ids_all = jnp.concatenate([ids_seq.reshape(-1), ids_neg.reshape(-1)])

    def step():
        nonlocal state, dense, opt
        loss, g_dense, grads = grad_step(state.table, dense, ids_seq, ids_neg)
        state = update_table(state, ids_all, grads, lr=0.05)
        dense, opt = update_dense(dense, opt, g_dense)
        return loss

    loss = step()
    loss.block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            loss = step()
        loss.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / args.steps)
    mem = {}
    try:
        ms = jax.local_devices()[0].memory_stats()
        mem = {"hbm_in_use_gb": round(ms["bytes_in_use"] / 2**30, 2),
               "hbm_peak_gb": round(ms.get("peak_bytes_in_use", 0) / 2**30, 2)}
    except Exception:
        pass
    train_res = {
        "phase": "train", "vocab": V, "dim": D, "batch": B,
        "table_gb": round(t_bytes / 2**30, 2),
        "ms_per_step": round(best * 1e3, 2),
        "examples_per_s": round(B / best, 1),
        "rows_touched_per_step": B * (L + K),
        "loss": round(float(loss), 4), **mem,
    }
    if not args.quiet:
        print(json.dumps(train_res), flush=True)

    # ---- serving: streamed full-catalog top-10 --------------------
    # block-size choice is a memory knob twice over: the (B, C) score
    # slab is B*C*4 bytes (C=2M at B=1024 is 8.2 GB — OOM), and a
    # non-dividing C makes blocked_top_k pad by COPYING the table.
    # Pick the largest divisor of V at or under the requested block.
    def _divisor_block(V, target):
        for c in range(min(target, V), 4095, -1):
            if V % c == 0:
                return c
        return target  # prime-ish V: accept the pad copy

    args.topk_block = _divisor_block(V, args.topk_block)

    @functools.partial(
        jax.jit, static_argnames=("k", "block_size", "approx")
    )
    def serve(table, q, k, block_size, approx):
        return blocked_top_k(q, table, k=k, block_size=block_size,
                             approx=approx)

    q = jax.random.normal(jax.random.PRNGKey(1), (B, D)) * 0.05
    out = [train_res]
    for approx in (False, True):
        v_, i_ = serve(state.table, q, k=10,
                       block_size=args.topk_block, approx=approx)
        v_.block_until_ready()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            v_, i_ = serve(state.table, q, k=10,
                           block_size=args.topk_block, approx=approx)
            v_.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        serve_res = {
            "phase": ("serve_full_catalog_top10_approx" if approx
                      else "serve_full_catalog_top10"),
            "vocab": V, "batch": B,
            "ms_per_batch": round(best * 1e3, 2),
            "queries_per_s": round(B / best, 1),
            "score_flops": 2 * B * V * D,
            "achieved_tflops": round(2 * B * V * D / best / 1e12, 2),
        }
        out.append(serve_res)
        if not args.quiet:
            print(json.dumps(serve_res), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=20_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--maxlen", type=int, default=50)
    ap.add_argument("--negs", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--topk-block", type=int, default=131_072)
    args = ap.parse_args()
    measure(vocab=args.vocab, dim=args.dim, batch=args.batch,
            maxlen=args.maxlen, negs=args.negs, steps=args.steps,
            topk_block=args.topk_block)


if __name__ == "__main__":
    main()
