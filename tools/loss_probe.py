"""A/B the shared-negative sampled-softmax paths on TPU.

Times fwd and fwd+bwd of sampled_softmax_loss_shared at the HSTU
Beauty step shape (M=B*L=51200 rows, K=512 negatives, D=64, N=12101
item rows) for fused=False (XLA, materializes the (M, K) logits) vs
fused=True (Pallas flash-style, ops/losses.py). lax.scan chunks per
the benchmarking rules in docs/PERF.md.

Usage: python tools/loss_probe.py [--steps 60]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M, K, D, N = 51_200, 512, 64, 12_101


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    from recboard_tpu.ops import losses as L

    key = jax.random.PRNGKey(0)
    user = jax.random.normal(key, (M, D), jnp.float32)
    table = jax.random.normal(jax.random.fold_in(key, 1), (N, D), jnp.float32)
    pos_ids = jax.random.randint(jax.random.fold_in(key, 2), (M,), 0, N)
    w = (jax.random.uniform(jax.random.fold_in(key, 3), (M,)) < 0.9).astype(
        jnp.float32
    )
    steps = args.steps

    def timeit(name, step):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def chunk(carry, i0):
            return jax.lax.scan(step, carry, i0 + jnp.arange(steps))

        c = (jnp.zeros_like(user), jnp.zeros_like(table))
        c, out = chunk(c, jnp.int32(0))
        jax.block_until_ready(out)
        best = 1e9
        for k in range(1, 4):
            t0 = time.perf_counter()
            c, out = chunk(c, jnp.int32(k * steps))
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / steps)
        print(json.dumps({"variant": name, "ms": round(best * 1e3, 4)}), flush=True)

    def make_step(fused, bwd):
        def loss_of(uacc, tacc, i):
            negs = jax.random.randint(jax.random.fold_in(key, i), (K,), 0, N)
            return L.sampled_softmax_loss_shared(
                user + 0.0 * uacc.sum(), pos_ids, negs, table + 0.0 * tacc.sum(),
                w, 0.05, fused=fused,
            )

        def step(carry, i):
            uacc, tacc = carry
            if bwd:
                loss, grads = jax.value_and_grad(
                    lambda u, t: L.sampled_softmax_loss_shared(
                        u, pos_ids,
                        jax.random.randint(jax.random.fold_in(key, i), (K,), 0, N),
                        t, w, 0.05, fused=fused,
                    ),
                    argnums=(0, 1),
                )(user + 0.0 * uacc.sum(), table + 0.0 * tacc.sum())
                return (uacc + grads[0], tacc + grads[1]), loss
            return (uacc, tacc), loss_of(uacc, tacc, i)

        return step

    for fused in (False, True):
        tag = "fused" if fused else "xla"
        timeit(f"{tag}_fwd", make_step(fused, bwd=False))
        timeit(f"{tag}_fwd_bwd", make_step(fused, bwd=True))


if __name__ == "__main__":
    main()
