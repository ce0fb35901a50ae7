"""Shared neural blocks used across the zoo (the freerec `models.nn`
role): transformer encoder blocks, MLPs, init helpers."""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import attention as attn_ops

__all__ = ["xavier_normal", "normal_init", "PointWiseFFN", "SASRecBlock", "MLP", "TransformerBlock"]

xavier_normal = nn.initializers.xavier_normal()


def normal_init(std: float = 1e-4):
    return nn.initializers.normal(stddev=std)


class PointWiseFFN(nn.Module):
    """Conv1d(k=1) → ReLU → Conv1d(k=1) with dropouts and residual
    (SASRec/main.py:31-50); kernel-size-1 convs are plain Dense on TPU."""

    hidden_size: int
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.hidden_size, kernel_init=xavier_normal)(x)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_size, kernel_init=xavier_normal)(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return h + x


class SASRecBlock(nn.Module):
    """One SASRec block: LN(Q-only) + causal MHA residual, LN + FFN
    residual, pad re-zeroing (SASRec/main.py:163-176).

    Mask semantics replicated exactly: the reference passes ONLY the
    causal ``attnMask`` to ``nn.MultiheadAttention`` — pad *keys* are
    attendable (their k/v are the projection biases, since pad
    positions are re-zeroed before every block), so no key-padding
    mask here. Dropout sits on the attention probabilities
    (``nn.MultiheadAttention(dropout=...)``), not after the output
    projection. Pinned by tests/test_crosscheck_sasrec_fwd.py."""

    embedding_dim: int
    num_heads: int = 1
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(
        self,
        seqs: jnp.ndarray,
        padding_mask: jnp.ndarray,  # (B, L, 1) True at pads
        deterministic: bool = True,
    ) -> jnp.ndarray:
        # Q from the LayerNorm'd stream, K/V from the raw stream
        # (SASRec/main.py:165-171: attn(LN(seqs), seqs, seqs))
        q_in = nn.LayerNorm(epsilon=1e-8)(seqs)
        qp = nn.Dense(self.embedding_dim, kernel_init=xavier_normal, name="q_proj")(q_in)
        kp = nn.Dense(self.embedding_dim, kernel_init=xavier_normal, name="k_proj")(seqs)
        vp = nn.Dense(self.embedding_dim, kernel_init=xavier_normal, name="v_proj")(seqs)
        dropout_active = self.dropout_rate > 0.0 and not deterministic
        attended = attn_ops.mha(
            qp,
            kp,
            vp,
            num_heads=self.num_heads,
            causal=True,
            dropout_rate=self.dropout_rate,
            dropout_rng=self.make_rng("dropout") if dropout_active else None,
        )
        proj = nn.Dense(self.embedding_dim, kernel_init=xavier_normal, name="out_proj")
        seqs = proj(attended) + seqs
        seqs = nn.LayerNorm(epsilon=1e-8)(seqs)
        seqs = PointWiseFFN(self.embedding_dim, self.dropout_rate)(
            seqs, deterministic=deterministic
        )
        return jnp.where(padding_mask, 0.0, seqs)


class TransformerBlock(nn.Module):
    """Post-LN encoder block mirroring ``torch.nn.TransformerEncoderLayer``
    (batch_first, norm_first=False, activation="gelu") as used by the
    reference BERT4Rec (BERT4Rec/main.py:71-81): dropout on the attention
    probabilities AND after the attention output, a dropout after the FFN
    activation AND after its second linear, exact (erf) gelu, LN eps 1e-5
    (torch defaults)."""

    embedding_dim: int
    num_heads: int = 2
    intermediate_dim: Optional[int] = None
    dropout_rate: float = 0.1
    activation: Callable = functools.partial(nn.gelu, approximate=False)

    @nn.compact
    def __call__(
        self,
        seqs: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, L) True at pads
        deterministic: bool = True,
    ) -> jnp.ndarray:
        qkv = nn.DenseGeneral(
            (3, self.embedding_dim), axis=-1, kernel_init=xavier_normal, name="qkv"
        )(seqs)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        dropout_active = self.dropout_rate > 0.0 and not deterministic
        attended = attn_ops.mha(
            q, k, v, num_heads=self.num_heads, causal=False,
            key_padding_mask=key_padding_mask,
            dropout_rate=self.dropout_rate,
            dropout_rng=self.make_rng("dropout") if dropout_active else None,
        )
        attended = nn.Dense(
            self.embedding_dim, kernel_init=xavier_normal, name="out_proj"
        )(attended)
        attended = nn.Dropout(self.dropout_rate)(attended, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5)(seqs + attended)
        inter = self.intermediate_dim or 4 * self.embedding_dim
        h = nn.Dense(inter, kernel_init=xavier_normal)(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Dense(self.embedding_dim, kernel_init=xavier_normal)(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5)(x + h)


class TorchBatchNorm(nn.Module):
    """BatchNorm1d with EXACT torch semantics (DeepFM/DCN `batch_norm`,
    LESSR): normalization uses the biased batch variance; the running
    variance stores the UNBIASED one (torch multiplies by n/(n-1) before
    the EMA — flax's nn.BatchNorm stores the biased variance, a real if
    small numerics difference at eval). ``momentum`` follows the torch
    convention (new = (1-m)·old + m·batch, default 0.1).
    Pinned by tests/test_crosscheck_ctr.py."""

    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True):
        D = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (D,))
        bias = self.param("bias", nn.initializers.zeros, (D,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(D, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(D, jnp.float32)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = x.mean(axis=reduce_axes)
            var = jnp.square(x - mean).mean(axis=reduce_axes)
            if not self.is_initializing():
                n = x.size // D
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var * n / max(n - 1, 1)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class MLP(nn.Module):
    """Dense tower with configurable activation/dropout (DeepFM DNN)."""

    hidden_sizes: Sequence[int]
    dropout_rate: float = 0.0
    activation: Callable = nn.relu
    final_activation: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i, size in enumerate(self.hidden_sizes):
            x = nn.Dense(size, kernel_init=xavier_normal)(x)
            last = i == len(self.hidden_sizes) - 1
            if not last or self.final_activation:
                x = self.activation(x)
                x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x
