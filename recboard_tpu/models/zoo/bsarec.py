"""BSARec: attention + low-pass frequency-filter branch, blended by α.

Reference: BSARec/main.py:42-200 + BSARec/modules.py:147-205 —
FrequencyLayer keeps the first `c//2+1` rFFT bins (low-pass), adds
sqrt_beta²-scaled high-pass, dropout + LN residual; BSARecLayer blends
α·dsp + (1-α)·gsp where gsp is standard softmax MHA with a causal+pad
additive mask; FeedForward 4×GELU + LN residual; roll-source trainpipe
with last-item target. Baseline (Beauty, CE): HR@10 0.1002±0.0008,
NDCG@10 0.0610±0.0004 — the top sequential model.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ... import criterions
from ...ops import attention as attn_ops
from ..base import Batch, SeqRecArch
from ..modules import xavier_normal
from . import register


class FrequencyLayer(nn.Module):
    c: int  # number of low-pass filters (pre-halving)
    hidden_size: int
    dropout_rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        L = x.shape[1]
        keep = self.c // 2 + 1
        sqrt_beta = self.param(
            "sqrt_beta", nn.initializers.normal(1.0), (1, 1, self.hidden_size)
        )
        # XLA RFFT requires f32/f64 — under bf16 compute, round-trip
        freq = jnp.fft.rfft(x.astype(jnp.float32), axis=1, norm="ortho")
        bins = jnp.arange(freq.shape[1])[None, :, None]
        low = jnp.where(bins < keep, freq, 0.0)
        low_pass = jnp.fft.irfft(low, n=L, axis=1, norm="ortho").astype(x.dtype)
        high_pass = x - low_pass
        out = low_pass + (sqrt_beta**2) * high_pass
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-12)(out + x)


class BSAAttention(nn.Module):
    hidden_size: int
    num_heads: int
    attn_dropout_rate: float
    hidden_dropout_rate: float

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, attn_mask: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        q = nn.Dense(self.hidden_size, kernel_init=xavier_normal, name="query")(x)
        k = nn.Dense(self.hidden_size, kernel_init=xavier_normal, name="key")(x)
        v = nn.Dense(self.hidden_size, kernel_init=xavier_normal, name="value")(x)
        # attn_mask is the reference's additive -1e4 mask (see
        # ops/attention.additive_causal_mask: fully-padded query rows
        # degrade to plain softmax, NOT zeros — those rows leak into
        # valid positions through the next block's FFT branch) and
        # dropout sits on the attention probabilities
        # (BSARec/modules.py:96-100,131-134).
        dropout_active = self.attn_dropout_rate > 0.0 and not deterministic
        ctx = attn_ops.mha(
            q, k, v, num_heads=self.num_heads, causal=False, bias=attn_mask,
            dropout_rate=self.attn_dropout_rate,
            dropout_rng=self.make_rng("dropout") if dropout_active else None,
        )
        out = nn.Dense(self.hidden_size, kernel_init=xavier_normal, name="dense")(ctx)
        out = nn.Dropout(self.hidden_dropout_rate)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-12)(out + x)


class BSARecBlock(nn.Module):
    hidden_size: int
    num_heads: int
    c: int
    alpha: float
    attn_dropout_rate: float
    hidden_dropout_rate: float

    @nn.compact
    def __call__(self, x, attn_mask, deterministic: bool = True):
        dsp = FrequencyLayer(self.c, self.hidden_size, self.hidden_dropout_rate)(
            x, deterministic
        )
        gsp = BSAAttention(
            self.hidden_size, self.num_heads, self.attn_dropout_rate,
            self.hidden_dropout_rate,
        )(x, attn_mask, deterministic)
        h = self.alpha * dsp + (1 - self.alpha) * gsp
        # FeedForward: 4x GELU + LN residual (BSARec/modules.py:27-77)
        f = nn.Dense(4 * self.hidden_size, kernel_init=xavier_normal)(h)
        f = nn.gelu(f, approximate=False)
        f = nn.Dense(self.hidden_size, kernel_init=xavier_normal)(f)
        f = nn.Dropout(self.hidden_dropout_rate)(f, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-12)(f + h)


@register("BSARec")
class BSARec(SeqRecArch):
    maxlen: int = 50
    num_heads: int = 1
    num_blocks: int = 2
    embedding_dim: int = 64
    hidden_dropout_rate: float = 0.5
    attn_dropout_rate: float = 0.5
    c: int = 5
    alpha: float = 0.7
    loss: str = "CE"

    def setup(self):
        self.item_embeddings = nn.Embed(
            self.Item.count + self.NUM_PADS,
            self.embedding_dim,
            embedding_init=xavier_normal,
        )
        self.position_embeddings = nn.Embed(
            self.maxlen, self.embedding_dim, embedding_init=xavier_normal
        )
        self.in_ln = nn.LayerNorm(epsilon=1e-12)
        self.in_dropout = nn.Dropout(self.hidden_dropout_rate)
        self.blocks = [
            BSARecBlock(
                self.embedding_dim,
                self.num_heads,
                self.c,
                self.alpha,
                self.attn_dropout_rate,
                self.hidden_dropout_rate,
                name=f"block_{i}",
            )
            for i in range(self.num_blocks)
        ]

    def sure_trainpipe(self, maxlen: int, batch_size: int):
        return (
            self.dataset.train()
            .shuffled_roll_seqs_source(minlen=2, maxlen=maxlen, keep_at_least_itself=True)
            .seq_train_yielding_pos_(start_idx_for_target=-1, end_idx_for_input=-1)
            .seq_train_sampling_neg_(num_negatives=1)
            .add_(offset=self.NUM_PADS, modified_fields=(self.ISeq,))
            .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def encode(self, data: Batch, deterministic: bool = True):
        from ...ops.attention import additive_causal_mask

        seqs = data[self.ISeq]
        # built ONCE per encode (data-dependent, layer-independent)
        attn_mask = additive_causal_mask(seqs == self.PADDING_VALUE)
        x = self.item_embeddings(seqs)
        x = x + self.position_embeddings(jnp.arange(seqs.shape[1])[None, :])
        x = self.in_ln(x)
        x = self.in_dropout(x, deterministic=deterministic)
        for block in self.blocks:
            x = block(x, attn_mask, deterministic)
        q = x[:, -1, :]
        return q, self.item_embeddings.embedding[self.NUM_PADS :]

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        q, item_embds = self.encode(data, deterministic=False)
        if self.loss in ("BCE", "BPR"):
            pos_logits = jnp.einsum("bd,bkd->bk", q, item_embds[data[self.IPos]])
            neg_logits = jnp.einsum("bd,bkd->bk", q, item_embds[data[self.INeg]])
            if self.loss == "BCE":
                rec_loss = criterions.bce_with_logits(
                    pos_logits, jnp.ones_like(pos_logits)
                ) + criterions.bce_with_logits(
                    neg_logits, jnp.zeros_like(neg_logits)
                )
            else:
                rec_loss = criterions.bpr_with_logits(pos_logits, neg_logits)
        else:
            logits = jnp.einsum(
                "bd,nd->bn", q, item_embds, preferred_element_type=jnp.float32
            )
            rec_loss = criterions.cross_entropy_with_logits(
                logits, data[self.IPos][:, 0]
            )
        return rec_loss, {"rec_loss": rec_loss}

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        q, item_embds = self.encode(data)
        return jnp.einsum(
            "bd,nd->bn", q, item_embds, preferred_element_type=jnp.float32
        )

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        q, item_embds = self.encode(data)
        return jnp.einsum("bd,bkd->bk", q, item_embds[data[self.IUnseen]])
