"""HSTU stacked relative time+position bias.

Semantics are exactly HSTU/modules.py:59-129 (see models/zoo/hstu.py):
  bias[nb, b, m, n] = pos_w[nb, n-m+L-1] + ts_w[nb, bucket(b, m, n)]
  bucket = clip(floor(ln(max(|ext[m+1]-ext[n]|, 1)) / 0.301), 0, K-1)
Output layout is (NB, B, L, L) so the cotangent needs no transpose.

The forward one-hot contraction lowers to a fused XLA select-accumulate
(~0.35 ms at B=1024, L=50, K=51 on a v5e — VPU-compare bound). A Pallas
custom-VJP backward (`kernel_bwd=True`) was built to keep the
recomputed one-hot out of HBM, and is kept here as a measured NEGATIVE
result: the weight-gradient histogram is a (NB, X) @ (X, K) contraction
with M=NB=4, so the MXU pays X/128 K-passes at ~3% utilization —
3.7 ms vs XLA autodiff's 1.5 ms at the Beauty shape (three layout
variants tried: (X,1) column index math 7.9 ms; lane-contracted
dot_general 2.4 ms; native A@B with transposed aux 3.7 ms; see
tools/relbias_probe.py). XLA's fused reduce wins; default stays XLA.

Equivalence (value + grads, interpret mode) pinned by
tests/test_ops.py::test_stacked_rel_bias_kernel_bwd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stacked_rel_bias", "stacked_rel_bias_reference"]


def _bucketize(timestamps: jnp.ndarray, L: int, K: int) -> jnp.ndarray:
    """(B, L) int timestamps -> (B, L, L) int32 bucket ids in [0, K)."""
    ext = jnp.concatenate([timestamps, timestamps[:, L - 1 : L]], axis=1)
    diff = ext[:, 1:, None] - ext[:, None, :-1]  # (B, L, L)
    bucket = jnp.floor(
        jnp.log(jnp.maximum(jnp.abs(diff).astype(jnp.float32), 1.0)) / 0.301
    ).astype(jnp.int32)
    return jnp.clip(bucket, 0, K - 1)


def _bias_from_bucket(bucket, ts_w, pos_w, K):
    """(NB, B, L, L) bias given precomputed buckets (pure XLA)."""
    NB = ts_w.shape[0]
    L = bucket.shape[-1]
    m = jnp.arange(L)[:, None]
    n = jnp.arange(L)[None, :]
    rel_pos = pos_w[:, n - m + L - 1]  # (NB, L, L)
    one_hot = jax.nn.one_hot(bucket, K, dtype=ts_w.dtype)
    ts_bias = jnp.einsum(
        "blmk,nk->nblm", one_hot, ts_w[:, :K], preferred_element_type=jnp.float32
    )
    return ts_bias + rel_pos[:, None]


def stacked_rel_bias_reference(timestamps, ts_w, pos_w, K: int):
    """Plain-XLA path (used on CPU and as the numerics oracle)."""
    L = timestamps.shape[1]
    return _bias_from_bucket(_bucketize(timestamps, L, K), ts_w, pos_w, K)


# ------------------------------------------------------------------ backward


def _bwd_kernel(aux_ref, g_ref, dts_ref, dpos_ref, *, Kp, Rp, XT):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dts_ref[...] = jnp.zeros_like(dts_ref)
        dpos_ref[...] = jnp.zeros_like(dpos_ref)

    g = g_ref[...]  # (NB, XT) — x in lanes, the array's native layout
    # aux rows: [bucket(x); rel(x)] — ONE small transpose puts x into
    # sublanes so the one-hots build in (XT, K) orientation, which is
    # the MXU-native RHS for dot(g, oh). Earlier variants measured:
    # (X, 1)-column index math = 6x slower than the XLA backward
    # (127/128 lanes idle); (K, XT) one-hots with a lane-contracted
    # dot_general = 2x slower (Mosaic re-lays the RHS out per step).
    aux_t = jnp.transpose(aux_ref[...], (1, 0))  # (XT, 2) int32
    bucket = aux_t[:, 0:1]  # (XT, 1)
    rel = aux_t[:, 1:2]

    kk = jax.lax.broadcasted_iota(jnp.int32, (1, Kp), 1)
    oh_ts = (bucket == kk).astype(jnp.float32)  # (XT, Kp)
    # dts[n, k] = sum_x g[n, x] * oh_ts[x, k]  (A @ B, both native)
    dts_ref[...] += jax.lax.dot_general(
        g, oh_ts, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    rr = jax.lax.broadcasted_iota(jnp.int32, (1, Rp), 1)
    oh_pos = (rel == rr).astype(jnp.float32)  # (XT, Rp)
    dpos_ref[...] += jax.lax.dot_general(
        g, oh_pos, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bwd_pallas(bucket, g, K: int, L: int, interpret: bool):
    """d_ts_w (NB, K), d_pos_w (NB, 2L-1) from cotangent g (NB, B, L, L)."""
    NB = g.shape[0]
    X = g.shape[1] * L * L
    XT = min(8192, _round_up(X, 128))
    pad = (-X) % XT
    g2 = g.reshape(NB, X)
    Bn = g.shape[1]
    # toeplitz offset rel(x) = n - m + L - 1 for x = (b*L + m)*L + n:
    # pattern repeats per batch row — tile it next to the buckets
    m = jnp.arange(L)[:, None]
    n = jnp.arange(L)[None, :]
    rel_row = jnp.broadcast_to((n - m + L - 1).reshape(-1), (Bn, L * L))
    aux = jnp.stack(
        [bucket.reshape(Bn * L * L), rel_row.reshape(Bn * L * L)]
    )  # (2, X) int32
    if pad:
        g2 = jnp.pad(g2, ((0, 0), (0, pad)))
        aux = jnp.pad(aux, ((0, 0), (0, pad)), constant_values=-1)  # no match
    G = g2.shape[1] // XT
    Kp = _round_up(K, 8)
    Rp = _round_up(2 * L - 1, 8)
    dts, dpos = pl.pallas_call(
        functools.partial(_bwd_kernel, Kp=Kp, Rp=Rp, XT=XT),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((2, XT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, XT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NB, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, Rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, Kp), jnp.float32),
            jax.ShapeDtypeStruct((NB, Rp), jnp.float32),
        ],
        interpret=interpret,
    )(aux, g2)
    return dts[:, :K], dpos[:, : 2 * L - 1]


# ------------------------------------------------------------- custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _stacked_rel_bias_cv(timestamps, ts_w, pos_w, K, interpret):
    L = timestamps.shape[1]
    return _bias_from_bucket(_bucketize(timestamps, L, K), ts_w, pos_w, K)


def _cv_fwd(timestamps, ts_w, pos_w, K, interpret):
    L = timestamps.shape[1]
    bucket = _bucketize(timestamps, L, K)
    out = _bias_from_bucket(bucket, ts_w, pos_w, K)
    return out, (bucket, timestamps, ts_w)


def _cv_bwd(K, interpret, res, g):
    bucket, timestamps, ts_w = res
    L = bucket.shape[-1]
    dts, dpos = _bwd_pallas(bucket, g, K, L, interpret)
    dts_full = jnp.zeros_like(ts_w).at[:, :K].set(dts)
    d_ts = np.zeros(timestamps.shape, dtype=jax.dtypes.float0)  # int: no grad
    return d_ts, dts_full, dpos.astype(jnp.float32)


_stacked_rel_bias_cv.defvjp(_cv_fwd, _cv_bwd)


def stacked_rel_bias(
    timestamps: jnp.ndarray,  # (B, L) int
    ts_w: jnp.ndarray,  # (NB, num_buckets + 1)
    pos_w: jnp.ndarray,  # (NB, 2L - 1)
    K: int,  # active bucket count (<= num_buckets + 1)
    kernel_bwd: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(NB, B, L, L) stacked bias; XLA backward by default (the Pallas
    backward is a documented negative result — see module docstring)."""
    if kernel_bwd is None:
        kernel_bwd = False
    if not kernel_bwd:
        return stacked_rel_bias_reference(timestamps, ts_w, pos_w, K)
    return _stacked_rel_bias_cv(timestamps, ts_w, pos_w, K, interpret)
