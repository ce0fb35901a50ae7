"""NARM: GRU encoder with global/local attention fusion.

Reference: NARM/main.py:30-185 — GRU over right-padded rolling windows;
c_global = last hidden; local attention alpha = v_t(mask ∘ sigmoid(
a_1(gru_out) + a_2(ht))) (sigmoid gate, no softmax); c_local =
Σ alpha·gru_out; concat → dropout → bilinear projection b → dot
product. BCE with 1 negative.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ... import criterions
from ..base import Batch, SeqRecArch
from ..modules import xavier_normal
from . import register


@register("NARM")
class NARM(SeqRecArch):
    maxlen: int = 50
    embedding_dim: int = 64
    hidden_size: int = 128
    emb_dropout_rate: float = 0.2
    hidden_dropout_rate: float = 0.0
    ct_dropout_rate: float = 0.5
    num_blocks: int = 1

    def setup(self):
        self.item_embeddings = nn.Embed(
            self.Item.count + self.NUM_PADS,
            self.embedding_dim,
            embedding_init=xavier_normal,
        )
        self.emb_dropout = nn.Dropout(self.emb_dropout_rate)
        self.grus = [
            nn.RNN(
                nn.GRUCell(
                    self.hidden_size,
                    kernel_init=nn.initializers.xavier_uniform(),
                    recurrent_kernel_init=nn.initializers.xavier_uniform(),
                ),
                name=f"gru_{i}",
            )
            for i in range(self.num_blocks)
        ]
        self.a_1 = nn.Dense(self.hidden_size, use_bias=False, kernel_init=xavier_normal)
        self.a_2 = nn.Dense(self.hidden_size, use_bias=False, kernel_init=xavier_normal)
        self.v_t = nn.Dense(1, use_bias=False, kernel_init=xavier_normal)
        self.ct_dropout = nn.Dropout(self.ct_dropout_rate)
        self.b = nn.Dense(
            self.embedding_dim, use_bias=False, kernel_init=xavier_normal
        )

    def sure_trainpipe(self, maxlen: int, batch_size: int):
        return (
            self.dataset.train()
            .shuffled_roll_seqs_source(minlen=2, maxlen=None)
            .seq_train_yielding_pos_(start_idx_for_target=-1)
            .seq_train_sampling_neg_(num_negatives=1)
            .lprune_(maxlen, modified_fields=(self.ISeq,))
            .add_(self.NUM_PADS, modified_fields=(self.ISeq,))
            .rpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def sure_validpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 512):
        return (
            self.dataset.valid()
            .ordered_user_ids_source()
            .valid_sampling_(ranking)
            .lprune_(maxlen, modified_fields=(self.ISeq,))
            .add_(self.NUM_PADS, modified_fields=(self.ISeq,))
            .rpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def sure_testpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 512):
        return (
            self.dataset.test()
            .ordered_user_ids_source()
            .test_sampling_(ranking)
            .lprune_(maxlen, modified_fields=(self.ISeq,))
            .add_(self.NUM_PADS, modified_fields=(self.ISeq,))
            .rpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def encode(self, data: Batch, deterministic: bool = True):
        seqs = data[self.ISeq]  # (B, L) right-padded
        mask = (seqs != self.PADDING_VALUE).astype(jnp.float32)  # (B, L)
        x = self.item_embeddings(seqs)
        x = self.emb_dropout(x, deterministic=deterministic)
        lengths = mask.sum(axis=-1).astype(jnp.int32)
        # no seq_lengths: outputs are bit-identical without it (the flag
        # only selects the final carry, unread here) — see gru4rec.py
        for gru in self.grus:
            x = gru(x)
        last = jnp.clip(lengths - 1, 0)
        ht = jnp.take_along_axis(
            x, last[:, None, None].repeat(x.shape[-1], -1), axis=1
        )  # (B, 1, H)
        q1 = self.a_1(x)
        q2 = self.a_2(ht)
        alpha = self.v_t(mask[..., None] * nn.sigmoid(q1 + q2))  # (B, L, 1)
        c_local = (alpha * x).sum(axis=1)  # (B, H)
        c_t = jnp.concatenate([c_local, ht[:, 0, :]], axis=1)
        c_t = self.ct_dropout(c_t, deterministic=deterministic)
        q = self.b(c_t)
        return q, self.item_embeddings.embedding[self.NUM_PADS :]

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        q, item_embds = self.encode(data, deterministic=False)
        pos_logits = jnp.einsum("bd,bkd->bk", q, item_embds[data[self.IPos]])
        neg_logits = jnp.einsum("bd,bkd->bk", q, item_embds[data[self.INeg]])
        rec_loss = criterions.bce_with_logits(
            pos_logits, jnp.ones_like(pos_logits)
        ) + criterions.bce_with_logits(neg_logits, jnp.zeros_like(neg_logits))
        return rec_loss, {"rec_loss": rec_loss}

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        q, item_embds = self.encode(data)
        return jnp.einsum(
            "bd,nd->bn", q, item_embds, preferred_element_type=jnp.float32
        )

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        q, item_embds = self.encode(data)
        return jnp.einsum("bd,bkd->bk", q, item_embds[data[self.IUnseen]])
