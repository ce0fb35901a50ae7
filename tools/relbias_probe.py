"""A/B the stacked rel-bias backward on TPU: XLA autodiff vs the
Pallas kernel (ops/rel_bias.py), at the HSTU Beauty step shape
(B=1024, L=50, NB=4, K=active buckets). Times fwd and fwd+bwd in
lax.scan chunks.

Usage: python tools/relbias_probe.py [--steps 60]
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

B, L, NB, KT = 1024, 50, 4, 129
MAX_TS = 3_000_000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from recboard_tpu.models.zoo.hstu import max_reachable_bucket
    from recboard_tpu.ops import rel_bias as RB

    K = min(KT - 1, max_reachable_bucket(MAX_TS)) + 1
    print(json.dumps({"active_buckets": K}), flush=True)

    rng = np.random.default_rng(0)
    ts = jnp.asarray(np.sort(rng.integers(0, MAX_TS, (B, L)), axis=1), jnp.int32)
    ts_w = jnp.asarray(rng.normal(size=(NB, KT)) * 0.02, jnp.float32)
    pos_w = jnp.asarray(rng.normal(size=(NB, 2 * L - 1)) * 0.02, jnp.float32)
    steps = args.steps

    def timeit(name, step):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def chunk(carry, i0):
            return jax.lax.scan(step, carry, i0 + jnp.arange(steps))

        c = (jnp.zeros_like(ts_w), jnp.zeros_like(pos_w))
        c, out = chunk(c, jnp.int32(0))
        jax.block_until_ready(out)
        best = 1e9
        for k in range(1, 4):
            t0 = time.perf_counter()
            c, out = chunk(c, jnp.int32(k * steps))
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / steps)
        print(json.dumps({"variant": name, "ms": round(best * 1e3, 4)}), flush=True)

    def make_step(kernel_bwd, bwd):
        def value(tw, pw, i):
            out = RB.stacked_rel_bias(ts + i, tw, pw, K, kernel_bwd=kernel_bwd)
            # cheap data-dependent reduction standing in for the blocks
            return jnp.sum(out * jnp.sin(out))

        def step(carry, i):
            tw_acc, pw_acc = carry
            if bwd:
                v, grads = jax.value_and_grad(value, argnums=(0, 1))(
                    ts_w + 0.0 * tw_acc.sum(), pos_w + 0.0 * pw_acc.sum(), i
                )
                return (tw_acc + grads[0], pw_acc + grads[1]), v
            return carry, value(ts_w + 0.0 * tw_acc.sum(), pos_w, i)

        return step

    for kernel in (False, True):
        tag = "pallas" if kernel else "xla"
        timeit(f"{tag}_fwd", make_step(kernel, bwd=False))
        timeit(f"{tag}_fwd_bwd", make_step(kernel, bwd=True))


if __name__ == "__main__":
    main()
