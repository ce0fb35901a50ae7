"""FMLP-Rec: FFT → learnable complex frequency filter → iFFT blocks.

Reference: FMLP-Rec/main.py:38-190 + FMLP-Rec/modules.py — FilterLayer
(rfft over time, complex weight (1, L//2+1, D), irfft, dropout, LN
residual) + 4x GELU MLP with LN residual; last-position scoring;
roll-source trainpipe with last-item target, left padding.
Baseline (Beauty, BPR): HR@10 0.0722, NDCG@10 0.0407.

TPU note: jnp.fft.rfft/irfft lower to XLA's FFT; the complex weight is
stored as (real, imag) float pairs as in the reference.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ... import criterions
from ..base import Batch, SeqRecArch
from . import register

_init02 = nn.initializers.normal(stddev=0.02)


class FilterLayer(nn.Module):
    maxlen: int
    hidden_size: int
    dropout_rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        w = self.param(
            "complex_weight",
            _init02,
            (1, self.maxlen // 2 + 1, self.hidden_size, 2),
        )
        # XLA RFFT requires f32/f64 — under bf16 compute, round-trip
        freq = jnp.fft.rfft(x.astype(jnp.float32), axis=1, norm="ortho")
        freq = freq * (w[..., 0] + 1j * w[..., 1])
        out = jnp.fft.irfft(freq, n=self.maxlen, axis=1, norm="ortho").astype(x.dtype)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-12)(out + x)


class Intermediate(nn.Module):
    hidden_size: int
    dropout_rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.hidden_size * 4, kernel_init=_init02)(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_size, kernel_init=_init02)(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-12)(h + x)


@register("FMLP-Rec")
class FMLPRec(SeqRecArch):
    maxlen: int = 50
    embedding_dim: int = 64
    num_blocks: int = 2
    hidden_dropout_rate: float = 0.5
    loss: str = "BPR"

    def setup(self):
        self.item_embeddings = nn.Embed(
            self.Item.count + self.NUM_PADS, self.embedding_dim, embedding_init=_init02
        )
        self.position_embeddings = nn.Embed(
            self.maxlen, self.embedding_dim, embedding_init=_init02
        )
        self.in_ln = nn.LayerNorm(epsilon=1e-12)
        self.in_dropout = nn.Dropout(self.hidden_dropout_rate)
        self.filters = [
            FilterLayer(self.maxlen, self.embedding_dim, self.hidden_dropout_rate)
            for _ in range(self.num_blocks)
        ]
        self.intermediates = [
            Intermediate(self.embedding_dim, self.hidden_dropout_rate)
            for _ in range(self.num_blocks)
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
        seqs = data[self.ISeq]  # (B, L) left-padded
        x = self.item_embeddings(seqs)
        x = x + self.position_embeddings(jnp.arange(seqs.shape[1])[None, :])
        x = self.in_dropout(self.in_ln(x), deterministic=deterministic)
        for filt, inter in zip(self.filters, self.intermediates):
            x = filt(x, deterministic=deterministic)
            x = inter(x, deterministic=deterministic)
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
