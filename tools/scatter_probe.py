"""Probe: fastest way to accumulate embedding gradients on TPU.

The SASRec-shaped workload scatters N=3*B*L=153.6k (D=64) rows into a
12,103-row table every step; the naive `zeros.at[ids].add(g)` measured
1.34 ms on the v5e — ~10x off HBM speed-of-light (~40 MB moved).
Variants measured here (each inside a lax.scan chunk so the axon
tunnel's ~1 ms dispatch noise cannot contaminate; see CLAUDE.md):

  scatter        zeros.at[ids].add(g)                      (baseline)
  scatter_bf16   same with bf16 values
  segsum         jax.ops.segment_sum(g, ids, T)
  sort_segsum    argsort ids -> segment_sum(indices_are_sorted=True)
  sort_scatter   argsort ids -> at[].add(indices_are_sorted=True)
  onehot_scan    scan over C-chunks: acc += onehot(ids).T @ g  (MXU, bf16)
  argsort_only   just the argsort (component cost)

Usage: python tools/scatter_probe.py [--n 153600] [--table 12103]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=153_600)
    ap.add_argument("--table", type=int, default=12_103)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--chunk", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    N, T, D = args.n, args.table, args.dim
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, T, size=(N,)), jnp.int32)
    g = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

    def timeit(name, fn):
        # vary input cheaply per iteration so XLA can't hoist the body
        def body(carry, i):
            out = fn(ids, g + carry)
            return out.astype(jnp.float32).sum() * 1e-20, out[0, 0]

        @jax.jit
        def chunk(z):
            z, outs = jax.lax.scan(body, z, jnp.arange(args.steps))
            return z, outs[-1]

        z, o = chunk(jnp.float32(0.0))
        o.block_until_ready()
        t0 = time.perf_counter()
        z, o = chunk(z)
        o.block_until_ready()
        dt = (time.perf_counter() - t0) / args.steps * 1e3
        print(json.dumps({"variant": name, "ms": round(dt, 4)}), flush=True)
        return dt

    timeit("scatter", lambda i, v: jnp.zeros((T, D), v.dtype).at[i].add(v))
    timeit(
        "scatter_bf16",
        lambda i, v: jnp.zeros((T, D), jnp.bfloat16).at[i].add(
            v.astype(jnp.bfloat16)
        ),
    )
    timeit("segsum", lambda i, v: jax.ops.segment_sum(v, i, num_segments=T))

    def sort_segsum(i, v):
        order = jnp.argsort(i)
        return jax.ops.segment_sum(
            v[order], i[order], num_segments=T, indices_are_sorted=True
        )

    timeit("sort_segsum", sort_segsum)

    def sort_scatter(i, v):
        order = jnp.argsort(i)
        return (
            jnp.zeros((T, D), v.dtype)
            .at[i[order]]
            .add(v[order], indices_are_sorted=True)
        )

    timeit("sort_scatter", sort_scatter)

    def onehot_scan(i, v):
        C = args.chunk
        iC = i.reshape(-1, C)
        vC = v.reshape(-1, C, D).astype(jnp.bfloat16)

        def body(acc, iv):
            idx, val = iv
            oh = (idx[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :]).astype(
                jnp.bfloat16
            )
            return acc + jax.lax.dot_general(
                oh,
                val,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ), None

        acc, _ = jax.lax.scan(body, jnp.zeros((T, D), jnp.float32), (iC, vC))
        return acc

    timeit("onehot_scan", onehot_scan)

    def argsort_only(i, v):
        order = jnp.argsort(i)
        return v[order]

    timeit("argsort_only", argsort_only)

    # --- layout-aware variants ---
    T8 = (T + 7) // 8 * 8  # sublane-aligned table rows
    timeit(
        "scatter_pad8",
        lambda i, v: jnp.zeros((T8, D), v.dtype).at[i].add(v)[:T],
    )
    timeit(
        "segsum_pad8",
        lambda i, v: jax.ops.segment_sum(v, i, num_segments=T8)[:T],
    )
    Tpow2 = 1 << (T - 1).bit_length()
    timeit(
        "segsum_pow2",
        lambda i, v: jax.ops.segment_sum(v, i, num_segments=Tpow2)[:T],
    )

    def packed128(i, v):
        # view the (T,64) table as (ceil(T/2),128): row i -> (i//2, 64*(i%2))
        Th = (T + 1) // 2
        half = (i & 1)[:, None].astype(v.dtype)  # 1 -> upper half
        v128 = jnp.concatenate([v * (1 - half), v * half], axis=-1)  # (N,128)
        acc = jax.ops.segment_sum(v128, i >> 1, num_segments=Th)
        return acc.reshape(-1, D)[:T]

    timeit("packed128_segsum", packed128)

    def packed256(i, v):
        Tq = (T + 3) // 4
        lane = (i & 3).astype(jnp.int32)  # 0..3
        sel = (lane[:, None] == jnp.arange(4)[None, :]).astype(v.dtype)  # (N,4)
        v256 = (sel[:, :, None] * v[:, None, :]).reshape(-1, 4 * D)
        acc = jax.ops.segment_sum(v256, i >> 2, num_segments=Tq)
        return acc.reshape(-1, D)[:T]

    timeit("packed256_segsum", packed256)

    # correctness spot-check
    ref = np.zeros((T, D), np.float32)
    np.add.at(ref, np.asarray(ids), np.asarray(g))
    got = np.asarray(sort_segsum(ids, g))
    print("sort_segsum max err:", float(np.abs(ref - got).max()), flush=True)
    got2 = np.asarray(onehot_scan(ids, g))
    print("onehot max err:", float(np.abs(ref - got2).max()), flush=True)


if __name__ == "__main__":
    main()
