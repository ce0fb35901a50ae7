"""Memory-fused sampled-softmax loss.

The HSTU objective scores each valid position against [positive;
num_negs sampled items] (HSTU/main.py:157-201). The naive formulation
materializes the gathered candidate embeddings (B·L, C, D) — ~1.7 GB
of HBM traffic per direction at the Beauty config (B=256, L=50, C=513,
D=64), dominating the step. Two fused paths:

* `sampled_softmax_loss` (default): a `lax.scan` over position chunks —
  each chunk gathers (TM, C, D) ≈ 33 MB, computes logits + CE, and is
  freed before the next chunk; autodiff re-runs the same chunking in
  reverse, so peak activation memory drops ~64× with no custom VJP.
* `sampled_softmax_loss_pallas`: a Pallas kernel holding the whole item
  table in VMEM and gathering on-chip. NOTE: current Mosaic lowers no
  vectorized int gather from VMEM ("Cannot do int indexing on TPU"), so
  this path only runs in interpret mode today — kept as groundwork for
  when the primitive lands; the scan path is the production one.

Equivalence and gradient tests: tests/test_ops.py. Measured on a
v5e chip at the Beauty config: fwd 61→25 ms, fwd+bwd 177→97 ms vs the
naive gather.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "sampled_softmax_loss",
    "sampled_softmax_loss_reference",
    "sampled_softmax_loss_pallas",
    "sampled_softmax_loss_shared",
    "sampled_softmax_loss_per_row",
    "sampled_softmax_shared_fused",
]


def sampled_softmax_loss_per_row(
    user: jnp.ndarray,  # (B, L, D)
    pos_ids: jnp.ndarray,  # (B, L)
    neg_ids: jnp.ndarray,  # (B, K) — one negative set per sequence
    table: jnp.ndarray,  # (N, D)
    weights: jnp.ndarray,  # (B, L)
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Sampled softmax with one negative set PER SEQUENCE.

    The middle point between the reference's per-position sampler
    (HSTU/main.py:157-162: (B, L, K) ids → a B·L·K-row random gather,
    gather-bound by construction) and the fully shared set
    (`sampled_softmax_loss_shared`: one K-row gather, but every
    position in the batch scores the same pool). Per-row gathers
    (B, K, D) rows — K-fold fewer than per-position — and scores them
    with a batched (L, D) @ (D, K) MXU matmul per sequence; positions
    within a sequence share the set, sequences do not. Accidental
    positive hits are left in, as in the reference.
    """
    neg = table[neg_ids]  # (B, K, D): the only large gather
    pos = table[pos_ids]  # (B, L, D)
    pos_logit = (user * pos).sum(-1) / temperature  # (B, L)
    neg_logits = jnp.einsum("bld,bkd->blk", user, neg) / temperature
    logz = jax.scipy.special.logsumexp(
        jnp.concatenate([pos_logit[..., None], neg_logits], axis=-1), axis=-1
    )
    loss = (logz - pos_logit) * weights
    return loss.sum() / jnp.maximum(weights.sum(), 1.0)


def sampled_softmax_loss_shared(
    user: jnp.ndarray,  # (M, D)
    pos_ids: jnp.ndarray,  # (M,)
    neg_ids: jnp.ndarray,  # (K,) shared across all positions
    table: jnp.ndarray,  # (N, D)
    weights: jnp.ndarray,  # (M,)
    temperature: float = 1.0,
    pos: jnp.ndarray = None,  # (M, D) precomputed positive embeddings
    fused: Optional[bool] = None,
) -> jnp.ndarray:
    """Sampled softmax with one SHARED negative set per step.

    TPU-first reformulation of the per-position variant: instead of
    gathering (M, C, D) candidate embeddings (M·C random HBM rows —
    gather/scatter bound), gather K shared rows once and hit the MXU
    with a single (M, D) @ (D, K) matmul. With uniform sampling the
    estimator is the standard shared-negative sampled softmax (same
    family the reference's per-position sampler approximates,
    HSTU/main.py:157-201); accidental positive hits are left in, as in
    the reference.

    ``fused`` (default: auto — on for TPU) routes through the Pallas
    flash-style kernel (sampled_softmax_shared_fused) that never
    materializes the (M, K) logits matrix in HBM.
    """
    neg = table[neg_ids]  # (K, D) — the only gather beyond positives
    if pos is None:
        pos = table[pos_ids]  # (M, D)
    if fused is None:
        fused = (
            jax.default_backend() == "tpu"
            and neg.shape[0] * user.shape[1] * 4 <= 2**22  # neg fits VMEM
        )
    if fused:
        return sampled_softmax_shared_fused(user, pos, neg, weights, temperature)
    pos_logit = (user * pos).sum(-1) / temperature  # (M,)
    neg_logits = (user @ neg.T) / temperature  # (M, K) — MXU
    logz = jax.scipy.special.logsumexp(
        jnp.concatenate([pos_logit[:, None], neg_logits], axis=1), axis=-1
    )
    loss = (logz - pos_logit) * weights
    return loss.sum() / jnp.maximum(weights.sum(), 1.0)


def sampled_softmax_loss_reference(
    user: jnp.ndarray,  # (M, D)
    cand_ids: jnp.ndarray,  # (M, C); positive at column 0
    table: jnp.ndarray,  # (N, D)
    weights: jnp.ndarray,  # (M,)
    temperature: float = 1.0,
) -> jnp.ndarray:
    cand = table[cand_ids]  # (M, C, D): the big gather
    logits = jnp.einsum("md,mcd->mc", user, cand) / temperature
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    loss = (logz - logits[:, 0]) * weights
    return loss.sum() / jnp.maximum(weights.sum(), 1.0)


def sampled_softmax_loss(
    user: jnp.ndarray,
    cand_ids: jnp.ndarray,
    table: jnp.ndarray,
    weights: jnp.ndarray,
    temperature: float = 1.0,
    chunk: int = 512,
) -> jnp.ndarray:
    """Chunk-scanned sampled softmax: identical value/grads to the
    reference, ~chunk/M of its peak activation memory."""
    M, D = user.shape
    C = cand_ids.shape[1]
    if M <= chunk:
        return sampled_softmax_loss_reference(
            user, cand_ids, table, weights, temperature
        )
    pad = (-M) % chunk
    if pad:
        user = jnp.pad(user, ((0, pad), (0, 0)))
        cand_ids = jnp.pad(cand_ids, ((0, pad), (0, 0)))
        weights = jnp.pad(weights, (0, pad))
    n_chunks = user.shape[0] // chunk
    users_c = user.reshape(n_chunks, chunk, D)
    ids_c = cand_ids.reshape(n_chunks, chunk, C)
    w_c = weights.reshape(n_chunks, chunk)

    def body(acc, inputs):
        u, ids, w = inputs
        cand = table[ids]  # (chunk, C, D) — freed after this step
        logits = jnp.einsum("md,mcd->mc", u, cand) / temperature
        logz = jax.scipy.special.logsumexp(logits, axis=-1)
        return acc + ((logz - logits[:, 0]) * w).sum(), None

    total, _ = jax.lax.scan(body, 0.0, (users_c, ids_c, w_c))
    return total / jnp.maximum(weights.sum(), 1.0)


def _fwd_kernel(user_ref, ids_ref, w_ref, table_ref, loss_ref, *, C, temperature):
    user = user_ref[...]  # (TM, D)
    ids = ids_ref[...]  # (TM, C)
    TM, D = user.shape
    cand = table_ref[ids.reshape(-1)].reshape(TM, C, D)  # VMEM gather
    logits = jax.lax.dot_general(
        user[:, None, :], cand,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :] / temperature
    m = jnp.max(logits, axis=-1, keepdims=True)
    z = jnp.sum(jnp.exp(logits - m), axis=-1)
    logz = jnp.log(z) + m[:, 0]
    loss_ref[...] = ((logz - logits[:, 0]) * w_ref[..., 0])[:, None]


def sampled_softmax_loss_pallas(
    user: jnp.ndarray,
    cand_ids: jnp.ndarray,
    table: jnp.ndarray,
    weights: jnp.ndarray,
    temperature: float = 1.0,
    block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Forward-only fused kernel: whole table resident in VMEM."""
    M, D = user.shape
    C = cand_ids.shape[1]
    pad = (-M) % block
    if pad:
        user = jnp.pad(user, ((0, pad), (0, 0)))
        cand_ids = jnp.pad(cand_ids, ((0, pad), (0, 0)))
        weights = jnp.pad(weights, (0, pad))
    Mp = user.shape[0]
    w2 = weights[:, None].astype(jnp.float32)
    loss_rows = pl.pallas_call(
        functools.partial(_fwd_kernel, C=C, temperature=temperature),
        grid=(Mp // block,),
        in_specs=[
            pl.BlockSpec((block, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        interpret=interpret,
    )(
        user.astype(jnp.float32),
        cand_ids.astype(jnp.int32),
        w2,
        table.astype(jnp.float32),
    )
    return loss_rows[:, 0].sum() / jnp.maximum(weights.sum(), 1.0)


# ---------------------------------------------------------------------------
# Fused shared-negative sampled softmax (Pallas, custom VJP)
#
# sampled_softmax_loss_shared materializes the (M, K) logits matrix in
# HBM (105 MB at HSTU's Beauty step, read ~4x across fwd/LSE/bwd). The
# shared negative set is a dense (K, D) matrix, so — unlike the
# per-position variant — nothing here needs an int gather: a flash-
# style kernel computes logits tile-by-tile in VMEM, reduces the
# log-partition online, and the backward recomputes the tile instead of
# reloading it. Residuals are two (M,) vectors.
# ---------------------------------------------------------------------------


def _shared_fwd_kernel(u_ref, p_ref, n_ref, logz_ref, pl_ref, *, inv_tau):
    u = u_ref[...]  # (TM, D)
    pos = p_ref[...]  # (TM, D)
    neg = n_ref[...]  # (K, D)
    logits = jax.lax.dot_general(
        u, neg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * inv_tau  # (TM, K)
    pos_logit = jnp.sum(u * pos, axis=-1, keepdims=True) * inv_tau  # (TM, 1)
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), pos_logit)
    z = jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True) + jnp.exp(
        pos_logit - m
    )
    logz_ref[...] = jnp.log(z) + m
    pl_ref[...] = pos_logit


def _shared_bwd_kernel(
    u_ref, p_ref, n_ref, logz_ref, pl_ref, s_ref,
    du_ref, dp_ref, dn_ref, *, inv_tau,
):
    u = u_ref[...]
    pos = p_ref[...]
    neg = n_ref[...]
    logz = logz_ref[...]  # (TM, 1)
    s = s_ref[...]  # (TM, 1) = g * w / W
    logits = jax.lax.dot_general(
        u, neg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * inv_tau
    p = jnp.exp(logits - logz) * s  # (TM, K): s_i * softmax prob
    ppos = jnp.exp(pl_ref[...] - logz)  # (TM, 1)
    coef = s * (ppos - 1.0)  # d pos_logit
    du_ref[...] = (
        jax.lax.dot_general(
            p, neg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        + coef * pos
    ) * inv_tau
    dp_ref[...] = (coef * u) * inv_tau

    @pl.when(pl.program_id(0) == 0)
    def _():
        dn_ref[...] = jnp.zeros_like(dn_ref)

    dn_ref[...] += jax.lax.dot_general(
        p, u, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * inv_tau  # (K, D)


def _shared_tiles(M: int, tile: int = 512):
    TM = min(tile, max(8, M))
    TM = ((TM + 7) // 8) * 8
    pad = (-M) % TM
    return TM, pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sampled_softmax_shared_fused(
    user: jnp.ndarray,  # (M, D)
    pos: jnp.ndarray,  # (M, D)
    neg: jnp.ndarray,  # (K, D)
    weights: jnp.ndarray,  # (M,)
    temperature: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    loss, _ = _shared_fused_fwd(user, pos, neg, weights, temperature, interpret)
    return loss


def _shared_fused_run(user, pos, neg, temperature, interpret):
    M, D = user.shape
    K = neg.shape[0]
    TM, pad = _shared_tiles(M)
    if pad:
        user = jnp.pad(user, ((0, pad), (0, 0)))
        pos = jnp.pad(pos, ((0, pad), (0, 0)))
    G = user.shape[0] // TM
    logz, pos_logit = pl.pallas_call(
        functools.partial(_shared_fwd_kernel, inv_tau=1.0 / temperature),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((TM, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * TM, 1), jnp.float32),
            jax.ShapeDtypeStruct((G * TM, 1), jnp.float32),
        ],
        interpret=interpret,
    )(user, pos, neg)
    return logz[:M, 0], pos_logit[:M, 0]


def _shared_fused_fwd(user, pos, neg, weights, temperature, interpret):
    logz, pos_logit = _shared_fused_run(user, pos, neg, temperature, interpret)
    nll = logz - pos_logit
    W = jnp.maximum(weights.sum(), 1.0)
    loss = (nll * weights).sum() / W
    return loss, (user, pos, neg, weights, logz, pos_logit, nll, W, loss)


def _shared_fused_bwd(temperature, interpret, res, g):
    user, pos, neg, weights, logz, pos_logit, nll, W, loss = res
    M, D = user.shape
    K = neg.shape[0]
    TM, pad = _shared_tiles(M)
    s = (g * weights / W)[:, None]  # (M, 1)
    if pad:
        user = jnp.pad(user, ((0, pad), (0, 0)))
        pos = jnp.pad(pos, ((0, pad), (0, 0)))
        s = jnp.pad(s, ((0, pad), (0, 0)))
        logz = jnp.pad(logz, (0, pad), constant_values=1.0)
        pos_logit = jnp.pad(pos_logit, (0, pad))
    G = user.shape[0] // TM
    du, dpos, dneg = pl.pallas_call(
        functools.partial(_shared_bwd_kernel, inv_tau=1.0 / temperature),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((TM, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * TM, D), jnp.float32),
            jax.ShapeDtypeStruct((G * TM, D), jnp.float32),
            jax.ShapeDtypeStruct((K, D), jnp.float32),
        ],
        interpret=interpret,
    )(
        user,
        pos,
        neg,
        logz[:, None],
        pos_logit[:, None],
        s,
    )
    # d loss / d w_i = (nll_i - loss * [sum(w) >= 1]) / W  (mirrors the
    # autodiff of (nll*w).sum()/maximum(w.sum(), 1); weights come from
    # integer masks in practice, so this grad is discarded upstream)
    flow = (weights.sum() >= 1.0).astype(jnp.float32)
    dweights = g * (nll - loss * flow) / W
    return du[:M].astype(user.dtype), dpos[:M].astype(pos.dtype), dneg.astype(
        neg.dtype
    ), dweights


sampled_softmax_shared_fused.defvjp(_shared_fused_fwd, _shared_fused_bwd)
