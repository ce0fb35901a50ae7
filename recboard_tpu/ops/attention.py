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
    if (
        on_tpu
        and dropout_active
        and bias is None  # the fused bwd doesn't produce bias grads
        and num_heads >= 2  # H=1 prob tensors are small; jnp path wins
        and q.shape[-1] % num_heads == 0
    ):
        # training path: the fused kernel keeps the (B, H, L, S)
        # scores/probs/dropout mask in VMEM and regenerates the mask in
        # the backward — those tensors' HBM round-trips dominate
        # multi-head training attention at rec shapes (BERT4Rec
        # B=1024, H=4, L=50 on a v5e: 26.7 → 9.8 ms/step together with
        # the fused CE; the H=1 SASRec shape LOSES ~0.5 ms, hence the
        # num_heads gate)
        try:
            return mha_dropout_pallas(
                q, k, v, num_heads, causal, key_padding_mask, bias,
                scale, dropout_rate, dropout_rng,
            )
        except Exception:  # pragma: no cover — fall back on compile issues
            pass
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


# --------------------------------------------------------------------------
# Fused attention WITH in-kernel dropout (training path).
#
# The (B, H, L, S) probability tensor is the training-step bandwidth
# hog: at BERT4Rec's (B=1024, H=4, L=S=50) it is 41 MB per layer and the
# jnp path writes/reads scores, probs, the bernoulli mask and their
# grads through HBM — measured 2.7 ms fwd+bwd per layer on a v5e while
# the MXU work is ~0.1 ms. This kernel keeps scores/probs/mask in VMEM:
# the dropout mask comes from the per-core hardware PRNG
# (pltpu.prng_seed per grid cell), and the custom-VJP backward
# RE-GENERATES the identical mask from the same seed instead of storing
# it (flash-attention-style recompute; only q/k/v/out/do touch HBM).

_ODD_MIX = -1640531535  # 0x9E3779B1, decorrelates grid cells


def _softmax_probs(scores):
    valid = scores > NEG_INF / 2
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.where(valid, jnp.exp(scores - m), 0.0)
    z = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.maximum(z, 1e-30)  # fully-masked rows → zeros


def _keep_mask(shape, threshold, seed, pid, hw_prng):
    if hw_prng:
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    else:
        # interpret mode has no hardware PRNG: a splitmix-style integer
        # hash of (seed, cell, position) gives deterministic i.i.d.-ish
        # bits so the custom VJP is testable on CPU (fwd and bwd
        # regenerate the identical mask either way)
        pos = (
            jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 2)
            * jnp.uint32(shape[-1])
            + jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
        )
        x = pos + jnp.uint32(0x9E3779B9) * (
            seed.astype(jnp.uint32) + jnp.uint32(pid) * jnp.uint32(747796405)
        )
        x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
        x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
        bits = x ^ (x >> 16)
    return bits >= jnp.uint32(threshold)




def _causal_add(L, S):
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, S), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, S), 1)
    return jnp.where(cols <= rows + (S - L), 0.0, NEG_INF)


def _mha_drop_fwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, pad_ref, bias_ref, o_ref,
    *, scale, threshold, inv_keep, H, hd, causal, hw_prng,
):
    b = pl.program_id(0)
    L = q_ref.shape[1]
    S = k_ref.shape[1]
    # additive mask built IN KERNEL from iota + the (TB, 1, S) pad row —
    # materializing a (B, L, S) mask in HBM costs more than the whole
    # attention at these shapes. pad_rows rides as (B, 1, S) so its
    # block's last two dims equal the array's — that frees TB from the
    # 8-sublane divisibility rule (TB=2 at L=S≈300).
    base = pad_ref[...]  # (TB, 1, S)
    if causal:
        base = base + _causal_add(L, S)[None]
    for h in range(H):
        if hw_prng:
            pltpu.prng_seed(seed_ref[0] + (b * H + h) * jnp.int32(_ODD_MIX))
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[:, :, sl].astype(jnp.float32)  # (TB, L, hd)
        kh = k_ref[:, :, sl].astype(jnp.float32)
        vh = v_ref[:, :, sl].astype(jnp.float32)
        mask = base + bias_ref[h][None]  # learned (H, L, S) bias (T5)
        scores = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + mask  # (TB, L, S)
        probs = _softmax_probs(scores)
        keep = _keep_mask(
            probs.shape, threshold, seed_ref[0], b * H + h, hw_prng
        )
        probs = jnp.where(keep, probs * inv_keep, 0.0)
        o_ref[:, :, sl] = jax.lax.dot_general(
            probs, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _mha_drop_bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, pad_ref, bias_ref, do_ref,
    dq_ref, dk_ref, dv_ref, dbias_ref,
    *, scale, threshold, inv_keep, H, hd, causal, hw_prng,
):
    b = pl.program_id(0)
    L = q_ref.shape[1]
    S = k_ref.shape[1]
    base = pad_ref[...]  # (TB, 1, S)
    if causal:
        base = base + _causal_add(L, S)[None]

    @pl.when(b == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for h in range(H):
        if hw_prng:
            pltpu.prng_seed(seed_ref[0] + (b * H + h) * jnp.int32(_ODD_MIX))
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[:, :, sl].astype(jnp.float32)
        kh = k_ref[:, :, sl].astype(jnp.float32)
        vh = v_ref[:, :, sl].astype(jnp.float32)
        do = do_ref[:, :, sl].astype(jnp.float32)
        mask = base + bias_ref[h][None]
        scores = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + mask
        p_raw = _softmax_probs(scores)
        # SAME stream as the forward → identical dropout mask
        keep = _keep_mask(
            p_raw.shape, threshold, seed_ref[0], b * H + h, hw_prng
        )
        p_drop = jnp.where(keep, p_raw * inv_keep, 0.0)
        dv_ref[:, :, sl] = jax.lax.dot_general(
            p_drop, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dpd = jax.lax.dot_general(
            do, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dpr = jnp.where(keep, dpd * inv_keep, 0.0)
        ds = p_raw * (dpr - jnp.sum(dpr * p_raw, axis=-1, keepdims=True))
        dbias_ref[h] += jnp.sum(ds, axis=0)
        dq_ref[:, :, sl] = (jax.lax.dot_general(
            ds, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dq_ref.dtype)
        dk_ref[:, :, sl] = (jax.lax.dot_general(
            ds, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dk_ref.dtype)


# score areas above this head-split at the JAX level (see
# mha_dropout_pallas): at TB=8 the multi-head backward's ~7 (TB, L, S)
# f32 temporaries + the (H, L, S) bias/dbias pair exceed the 16 MB
# scoped-VMEM limit (measured: 19 MB at B=256, L=S=300, H=4, D=256 —
# the TIGER encoder shape)
_SPLIT_AREA = 1_600_000 // (8 * 4)  # L*S beyond which TB=8 overflows


def _drop_tb(L: int, S: int, hd: int, H: int) -> int:
    """Batch rows per grid cell, from an explicit scoped-VMEM model.

    Mosaic's kernel stack must fit 16 MB per cell. Three observed OOMs
    at TIGER shapes (encoder fwd H=4 L=S=300 TB=8; cross-attn fwd and
    bwd H=4 L=6 S=300 at TB=32/TB=8 — all ~19 MB) calibrate the terms:
    the double-buffered io blocks (worst pass = backward: q/do/dq of
    TB·L·D + k/v/dk/dv of TB·S·D), the per-head f32 q/k/v/do copies
    live across the unrolled head loop, and ~7 (TB, L, S) score/prob
    temporaries reused between heads. The 10 MB budget leaves slack for
    whatever the allocator double-counts. L=S=50, D=64 models keep the
    measured-fastest TB=32."""
    D = H * hd
    bias_io = 2 * H * L * S * 4
    tb = 32
    while tb > 1:
        io = 2 * (3 * tb * L * D + 4 * tb * S * D) * 4
        copies = H * tb * (2 * L + 2 * S) * hd * 4
        temps = 7 * tb * L * S * 4
        if io + copies + temps + bias_io <= 10_000_000:
            break
        tb //= 2
    return tb


def _mha_drop_call(kernel, seed, q, k, v, pad_rows, bias, extra,
                   H, hd, causal, interpret, rate, scale, with_grads):
    B, L, D = q.shape
    S = k.shape[1]
    TB = _drop_tb(L, S, hd, H)
    Bp = _round_up(B, TB)
    if Bp != B:
        padb = ((0, Bp - B), (0, 0), (0, 0))
        q = jnp.pad(q, padb)
        k = jnp.pad(k, padb)
        v = jnp.pad(v, padb)
        extra = [jnp.pad(x, padb) for x in extra]
        pad_rows = jnp.pad(pad_rows, ((0, Bp - B), (0, 0)))
    pad_rows = pad_rows[:, None, :]  # (Bp, 1, S): frees TB from sublane tiling
    thr = min(int(round(rate * 2**32)), 2**32 - 1)
    inv_keep = 1.0 / (1.0 - rate)
    q_spec = lambda n: pl.BlockSpec(
        (TB, n, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    bias_spec = pl.BlockSpec(
        (H, L, S), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    if with_grads:
        out_specs = [q_spec(L), q_spec(S), q_spec(S), bias_spec]
        out_shape = [
            jax.ShapeDtypeStruct((Bp, L, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, S, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, S, D), jnp.float32),
            jax.ShapeDtypeStruct((H, L, S), jnp.float32),
        ]
    else:
        out_specs = [q_spec(L)]
        out_shape = [jax.ShapeDtypeStruct((Bp, L, D), jnp.float32)]
    outs = pl.pallas_call(
        functools.partial(
            kernel, scale=scale, threshold=thr, inv_keep=inv_keep,
            H=H, hd=hd, causal=causal, hw_prng=not interpret,
        ),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            q_spec(L), q_spec(S), q_spec(S),
            pl.BlockSpec(
                (TB, 1, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            bias_spec,
        ] + [q_spec(L) for _ in extra],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(seed, q, k, v, pad_rows, bias, *extra)
    outs = list(outs)
    n_batched = 3 if with_grads else 1  # dq/dk/dv (or o); dbias is (H, L, S)
    return [o[:B] for o in outs[:n_batched]] + outs[n_batched:]


def _pad_rows(key_padding_mask, B, S):
    if key_padding_mask is None:
        return jnp.zeros((B, S), jnp.float32)
    return jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _mha_dropout_fused(
    q, k, v, seed, bias, num_heads, causal, rate, scale, interpret,
    key_padding_mask,
):
    out, _ = _mha_dropout_fused_fwd(
        q, k, v, seed, bias, num_heads, causal, rate, scale, interpret,
        key_padding_mask,
    )
    return out


def _mha_dropout_fused_fwd(
    q, k, v, seed, bias, num_heads, causal, rate, scale, interpret,
    key_padding_mask,
):
    B, L, D = q.shape
    S = k.shape[1]
    hd = D // num_heads
    sc = scale if scale is not None else 1.0 / (hd**0.5)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    out = _mha_drop_call(
        _mha_drop_fwd_kernel, seed_arr, q, k, v,
        _pad_rows(key_padding_mask, B, S), bias.astype(jnp.float32), [],
        num_heads, hd, causal, interpret, rate, sc, with_grads=False,
    )[0]
    return out.astype(q.dtype), (q, k, v, seed, bias, key_padding_mask)


def _mha_dropout_fused_bwd(
    num_heads, causal, rate, scale, interpret, res, g
):
    q, k, v, seed, bias, key_padding_mask = res
    B, L, D = q.shape
    S = k.shape[1]
    hd = D // num_heads
    sc = scale if scale is not None else 1.0 / (hd**0.5)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    dq, dk, dv, dbias = _mha_drop_call(
        _mha_drop_bwd_kernel, seed_arr, q, k, v,
        _pad_rows(key_padding_mask, B, S), bias.astype(jnp.float32),
        [g.astype(jnp.float32)],
        num_heads, hd, causal, interpret, rate, sc, with_grads=True,
    )
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
        None,  # seed
        dbias.astype(bias.dtype),
        None,  # key_padding_mask
    )


_mha_dropout_fused.defvjp(_mha_dropout_fused_fwd, _mha_dropout_fused_bwd)


def mha_dropout_pallas(
    q, k, v, num_heads, causal, key_padding_mask, bias, scale,
    dropout_rate, dropout_rng, interpret: bool = False,
):
    """Training attention with in-kernel hardware-PRNG dropout on the
    probabilities: a grid cell per batch tile, heads looped inside the
    kernel (packed in the lane dim), the additive mask built from iota +
    per-row pad vectors IN VMEM, and the backward REGENERATING the
    dropout mask from the same per-(cell, head) seed — scores, probs and
    the mask never touch HBM. Statistically equivalent to
    `mha_reference` with dropout (identical math, a different — still
    i.i.d. Bernoulli — mask stream); bit-identical when
    dropout_rate == 0 (up to fully-masked rows, which both paths zero).

    ``bias``: optional LEARNED (H, L, S) additive bias shared across the
    batch (T5 relative-position bias) — gradients flow (dbias is
    accumulated across grid cells in-kernel). Batch-dependent biases are
    unsupported — callers dispatch those to the jnp path.

    Large score areas (L·S > ~50k, e.g. the TIGER encoder's L=S≈300 SID
    protocol) dispatch one single-head kernel call per head: the
    multi-head kernel's per-cell temporaries + the whole (H, L, S) bias
    overflow the 16 MB scoped-VMEM limit there, while per-head calls
    carry only an (L, S) bias slice and shrink the batch tile to 2."""
    L, S = q.shape[1], k.shape[1]
    if bias is None:
        H = num_heads
        bias = jnp.zeros((H, L, S), jnp.float32)
    else:
        bias = jnp.squeeze(bias, axis=0) if bias.ndim == 4 else bias
        assert bias.ndim == 3, "bias must be (H, L, S) (batch-shared)"
    if num_heads > 1 and L * S > _SPLIT_AREA:
        hd = q.shape[2] // num_heads
        outs = []
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            seed_h = jax.random.randint(
                jax.random.fold_in(dropout_rng, h), (),
                -(2**31), 2**31 - 1, dtype=jnp.int32,
            )
            outs.append(_mha_dropout_fused(
                q[:, :, sl], k[:, :, sl], v[:, :, sl], seed_h,
                bias[h : h + 1], 1, causal, float(dropout_rate), scale,
                interpret, key_padding_mask,
            ))
        return jnp.concatenate(outs, axis=-1)
    seed = jax.random.randint(
        dropout_rng, (), -(2**31), 2**31 - 1, dtype=jnp.int32
    )
    return _mha_dropout_fused(
        q, k, v, seed, bias, num_heads, causal, float(dropout_rate), scale,
        interpret, key_padding_mask,
    )
