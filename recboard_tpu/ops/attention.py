"""Fused multi-head attention for recommender sequence lengths.

Replaces the reference's cuDNN `nn.MultiheadAttention`
(SASRec/main.py:96-103) with a TPU-native path:

* `mha_reference` — pure-jnp scaled dot-product attention with causal
  and key-padding masks; XLA fuses the softmax chain; this is the
  numerically authoritative implementation.
* `mha_pallas` — a Pallas kernel fusing QK^T → mask → softmax → PV in
  VMEM, one (batch*head) grid cell per program. Rec models run short
  sequences (maxlen 20–200, SURVEY.md §5.7), so whole (L, L) score
  tiles fit comfortably in VMEM; blocks are padded to the (8,128)
  float32 tile. Equivalence is pinned by tests/test_ops.py.

`mha` dispatches: Pallas on TPU when shapes are supported, reference
otherwise (CPU tests, odd shapes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mha", "mha_reference", "mha_pallas", "additive_causal_mask"]

NEG_INF = -1e30


def _merge_masks(
    L: int,
    S: int,
    causal: bool,
    key_padding_mask: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    batch: int,
    dtype,
) -> Optional[jnp.ndarray]:
    """(B, L, S) additive mask (0 or NEG_INF) + optional bias."""
    add = None
    if causal:
        causal_mask = jnp.tril(jnp.ones((L, S), dtype=bool), k=S - L)
        add = jnp.where(causal_mask, 0.0, NEG_INF).astype(dtype)[None]
    if key_padding_mask is not None:
        pad = jnp.where(key_padding_mask[:, None, :], NEG_INF, 0.0).astype(dtype)
        add = pad if add is None else add + pad
    if bias is not None:
        add = bias if add is None else add + bias
    return add


def additive_causal_mask(key_padding_mask: jnp.ndarray, value: float = -1.0e4):
    """(B, L) True-at-pads → (B, 1, L, L) additive mask in the recbole
    convention (tril ∧ key-valid → 0, else ``value``; BSARec/main.py:133-141,
    UniSRec/main.py:249-257). With the default -1e4, a fully-masked query
    row degrades to plain softmax over raw scores — NOT zeros — which is
    the reference behavior models like BSARec depend on. Data-dependent
    but layer-independent: build it once per encode and pass to every
    block."""
    B, L = key_padding_mask.shape
    allowed = jnp.tril(
        jnp.broadcast_to(~key_padding_mask[:, None, None, :], (B, 1, L, L))
    )
    return jnp.where(allowed, 0.0, value)


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int = 1,
    causal: bool = True,
    key_padding_mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """q/k/v: (B, L, D); key_padding_mask: (B, S) True = masked;
    bias: broadcastable to (B, H, L, S). Returns (B, L, D).

    ``dropout_rate``/``dropout_rng``: inverted dropout on the attention
    probabilities — torch ``nn.MultiheadAttention(dropout=p)`` semantics
    (applied after softmax, before the PV matmul). Active only when a
    rng is given."""
    B, L, D = q.shape
    S = k.shape[1]
    H = num_heads
    hd = D // H
    scale = scale if scale is not None else 1.0 / (hd**0.5)

    qh = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

    scores = jnp.einsum(
        "bhld,bhsd->bhls", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    add = _merge_masks(L, S, causal, key_padding_mask, None, B, scores.dtype)
    if add is not None:
        scores = scores + add[:, None, :, :]
    if bias is not None:
        scores = scores + bias
    # fully-masked rows (pad queries whose visible keys are all padded)
    # produce zeros — well-defined on both the jnp and Pallas paths;
    # models zero those positions anyway (SASRec/main.py:176)
    valid = scores > NEG_INF / 2
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(valid.any(axis=-1, keepdims=True), probs, 0.0)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhls,bhsd->bhld", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, L, D).astype(q.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mha_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, L, S):
    q = q_ref[0].astype(jnp.float32)  # (Lp, hd)
    k = k_ref[0].astype(jnp.float32)  # (Sp, hd)
    v = v_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Lp, Sp)
    scores = scores + mask_ref[0]
    valid = scores > NEG_INF / 2
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.where(valid, jnp.exp(scores - m), 0.0)
    z = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / jnp.maximum(z, 1e-30)  # fully-masked rows → zeros
    o_ref[0] = jnp.dot(
        probs, v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def mha_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int = 1,
    causal: bool = True,
    key_padding_mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention kernel; grid over (batch × heads), whole-sequence
    tiles in VMEM (short-sequence regime)."""
    B, L, D = q.shape
    S = k.shape[1]
    H = num_heads
    hd = D // H
    scale = scale if scale is not None else 1.0 / (hd**0.5)

    Lp = _round_up(L, 8)
    Sp = _round_up(S, 128)
    hdp = _round_up(hd, 128)

    qh = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3).reshape(B * H, L, hd)
    kh = k.reshape(B, S, H, hd).transpose(0, 2, 1, 3).reshape(B * H, S, hd)
    vh = v.reshape(B, S, H, hd).transpose(0, 2, 1, 3).reshape(B * H, S, hd)

    qh = jnp.pad(qh, ((0, 0), (0, Lp - L), (0, hdp - hd)))
    kh = jnp.pad(kh, ((0, 0), (0, Sp - S), (0, hdp - hd)))
    vh = jnp.pad(vh, ((0, 0), (0, Sp - S), (0, hdp - hd)))

    add = _merge_masks(L, S, causal, key_padding_mask, None, B, jnp.float32)
    if add is None:
        add = jnp.zeros((B, L, S), jnp.float32)
    if bias is not None:
        add = add[:, None, :, :] + bias.astype(jnp.float32)  # (B, H, L, S)
        add = jnp.broadcast_to(add, (B, H, L, S)).reshape(B * H, L, S)
    else:
        add = jnp.broadcast_to(add[:, None, :, :], (B, H, L, S)).reshape(B * H, L, S)
    # padded keys masked off; padded queries produce garbage rows we drop
    add = jnp.pad(add, ((0, 0), (0, Lp - L), (0, Sp - S)), constant_values=NEG_INF)

    grid = (B * H,)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale, L=Lp, S=Sp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Lp, hdp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, hdp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, hdp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, Sp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Lp, hdp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, hdp), q.dtype),
        interpret=interpret,
    )(qh, kh, vh, add)

    out = out[:, :L, :hd].reshape(B, H, L, hd).transpose(0, 2, 1, 3)
    return out.reshape(B, L, D)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int = 1,
    causal: bool = True,
    key_padding_mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dispatch: Pallas on TPU where the shape profits (head dim a lane
    multiple, or long sequences where fusing QK/softmax/PV in VMEM
    beats XLA's scheduling); jnp reference elsewhere — at rec-model
    shapes (L≈50, hd=64) XLA's fusion already runs at parity, and the
    kernel's lane padding would waste MXU work. Attention-prob dropout
    (training) always takes the reference path."""
    dropout_active = dropout_rate > 0.0 and dropout_rng is not None
    on_tpu = jax.default_backend() == "tpu"
    hd = q.shape[-1] // num_heads
    profitable = hd % 128 == 0 or q.shape[1] >= 256
    if on_tpu and profitable and q.shape[-1] % num_heads == 0 and not dropout_active:
        try:
            return mha_pallas(
                q, k, v, num_heads, causal, key_padding_mask, bias, scale
            )
        except Exception:  # pragma: no cover — fall back on compile issues
            pass
    return mha_reference(
        q, k, v, num_heads, causal, key_padding_mask, bias, scale,
        dropout_rate, dropout_rng,
    )
