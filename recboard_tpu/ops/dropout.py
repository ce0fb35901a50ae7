"""Hardware-PRNG dropout for TPU.

Dropout-mask generation dominates small-dim recommender steps: at the
SASRec headline config (B=1024, L=50, D=64) each of the step's seven
(B, L, D) masks costs ~0.6 ms through `jax.random.bernoulli` even with
the rbg generator, and threefry additionally costs minutes of XLA
compile time — while the whole no-dropout forward pass runs in 0.09 ms
(measured on a v5e; see CLAUDE.md perf rules). The reference leans on
cuDNN's fused dropout (torch nn.Dropout, SASRec/main.py:74-90
dropout layers); this is the TPU-native equivalent.

`dropout_mask` is a Pallas kernel driving the per-core hardware PRNG
(`pltpu.prng_seed` + `pltpu.prng_random_bits`): one pass, writes the
inverse-keep-scaled mask at memory bandwidth. Autodiff needs no custom
VJP — the mask is a constant w.r.t. the differentiated inputs, so
`y = x * mask` differentiates to `dx = dy * mask` with the mask reused
from the forward pass.

On CPU (tests) it falls back to `jax.random.bernoulli`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dropout", "dropout_mask"]

_LANES = 128
_BLOCK_ROWS = 2048  # 2048x128 f32 = 1 MB per program — deep in VMEM


def _mask_kernel(seed_ref, out_ref, *, threshold: int, scale: float):
    # decorrelate grid cells: fold the program id into the seed with an
    # odd multiplier (Knuth); the hardware PRNG streams are independent
    # per seed
    pltpu.prng_seed(
        seed_ref[0] + pl.program_id(0) * jnp.int32(-1640531535)  # 0x9E3779B1
    )
    bits = pltpu.bitcast(
        pltpu.prng_random_bits(out_ref.shape), jnp.uint32
    )  # prng_random_bits alone yields SIGNED int32 — comparing that
    # against the threshold drops P(negative)+rate instead of rate
    keep = bits >= jnp.uint32(threshold)
    out_ref[:] = jnp.where(keep, jnp.float32(scale), jnp.float32(0.0))


def dropout_mask(key, shape, rate: float, interpret: bool = False) -> jnp.ndarray:
    """(shape) float32 mask: 1/(1-rate) with prob (1-rate), else 0."""
    n = 1
    for d in shape:
        n *= int(d)
    rows = pl.cdiv(n, _LANES)
    padded_rows = pl.cdiv(rows, 8) * 8
    grid = pl.cdiv(padded_rows, _BLOCK_ROWS)
    # one cheap draw per call turns the (possibly typed) key into the
    # scalar hardware seed
    seed = jax.random.randint(key, (1,), -(2**31), 2**31 - 1, dtype=jnp.int32)
    threshold = min(int(round(rate * 2**32)), 2**32 - 1)
    scale = 1.0 / (1.0 - rate)
    out = pl.pallas_call(
        functools.partial(_mask_kernel, threshold=threshold, scale=scale),
        out_shape=jax.ShapeDtypeStruct((padded_rows, _LANES), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (_BLOCK_ROWS, _LANES),
            lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(seed)
    return out.reshape(-1)[:n].reshape(shape)


def dropout(
    x: jnp.ndarray, rate: float, key, deterministic: bool = False
) -> jnp.ndarray:
    """Drop-in for `nn.Dropout(rate)(x, deterministic)` given a key."""
    if deterministic or rate == 0.0:
        return x
    if jax.default_backend() != "tpu":
        keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), 0.0)
    return x * dropout_mask(key, x.shape, rate).astype(x.dtype)
