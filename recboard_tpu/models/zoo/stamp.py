"""STAMP: trilinear attention over (mean, last) session state.

Reference: STAMP/main.py:29-160 — seq embds → mean pool + last click →
trilinear attention alphas = w0(sigmoid(w1 x + w2 last + w3 mean + ba))
→ ma = Σ alpha·x + last → hs = tanh(mlp_a(ma)), ht = tanh(mlp_b(last))
→ score = (hs ∘ ht)·item; rolling-window trainpipe, last-item target.
Baseline (Beauty, CE): HR@10 0.0688, NDCG@10 0.0391.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ... import criterions
from ..base import Batch, SeqRecArch
from . import register

_w_init = nn.initializers.normal(stddev=0.05)
_e_init = nn.initializers.normal(stddev=0.002)


@register("STAMP")
class STAMP(SeqRecArch):
    maxlen: int = 50
    embedding_dim: int = 64
    hidden_size: int = 64
    loss: str = "CE"

    def setup(self):
        D = self.embedding_dim
        self.item_embeddings = nn.Embed(
            self.Item.count + self.NUM_PADS, D, embedding_init=_e_init
        )
        self.w1 = nn.Dense(D, use_bias=False, kernel_init=_w_init)
        self.w2 = nn.Dense(D, use_bias=False, kernel_init=_w_init)
        self.w3 = nn.Dense(D, use_bias=False, kernel_init=_w_init)
        self.w0 = nn.Dense(1, use_bias=False, kernel_init=_w_init)
        self.ba = self.param("ba", nn.initializers.zeros, (1, 1, D))
        self.mlp_a = nn.Dense(self.hidden_size, kernel_init=_w_init)
        self.mlp_b = nn.Dense(self.hidden_size, kernel_init=_w_init)

    def sure_trainpipe(self, maxlen: int, batch_size: int):
        return (
            self.dataset.train()
            .shuffled_roll_seqs_source(maxlen=maxlen, keep_at_least_itself=True)
            .seq_train_yielding_pos_(start_idx_for_target=-1, end_idx_for_input=-1)
            .seq_train_sampling_neg_(num_negatives=1)
            .add_(offset=self.NUM_PADS, modified_fields=(self.ISeq,))
            .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def encode(self, data: Batch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        seqs = data[self.ISeq]  # (B, L) left-padded
        mask = (seqs != self.PADDING_VALUE)[..., None].astype(jnp.float32)
        lens = jnp.maximum(mask.sum(axis=1), 1.0)  # (B, 1)
        x = self.item_embeddings(seqs) * mask  # zero pad rows (padding_idx)
        last = x[:, -1, :]  # (B, D)
        ms = (x.sum(axis=1) / lens)[:, None, :]  # (B, 1, D)
        alphas = self.w0(
            nn.sigmoid(self.w1(x) + self.w2(last[:, None, :]) + self.w3(ms) + self.ba)
        )  # (B, L, 1)
        ma = (alphas * x).sum(axis=1) + last
        hs = nn.tanh(self.mlp_a(ma))
        ht = nn.tanh(self.mlp_b(last))
        q = hs * ht  # (B, D)
        item_embds = self.item_embeddings.embedding[self.NUM_PADS :]
        return q, item_embds

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        q, item_embds = self.encode(data)
        if self.loss == "CE":
            logits = jnp.einsum(
                "bd,nd->bn", q, item_embds, preferred_element_type=jnp.float32
            )
            rec_loss = criterions.cross_entropy_with_logits(
                logits, data[self.IPos][:, 0]
            )
        else:
            pos = item_embds[data[self.IPos][:, 0]]
            neg = item_embds[data[self.INeg][:, 0]]
            pos_logits = jnp.einsum("bd,bd->b", q, pos)
            neg_logits = jnp.einsum("bd,bd->b", q, neg)
            if self.loss == "BCE":
                rec_loss = criterions.bce_with_logits(
                    pos_logits, jnp.ones_like(pos_logits)
                ) + criterions.bce_with_logits(
                    neg_logits, jnp.zeros_like(neg_logits)
                )
            else:
                rec_loss = criterions.bpr_with_logits(pos_logits, neg_logits)
        return rec_loss, {"rec_loss": rec_loss}

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        q, item_embds = self.encode(data)
        return jnp.einsum(
            "bd,nd->bn", q, item_embds, preferred_element_type=jnp.float32
        )

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        q, item_embds = self.encode(data)
        return jnp.einsum("bd,bkd->bk", q, item_embds[data[self.IUnseen]])
