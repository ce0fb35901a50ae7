"""FPMC: factorized personalized Markov chain over the last item.

Reference: FPMC/main.py:28-180 — user embds + three item tables
(i2u/i2l/l2i); query = [user_emb ; l2i(last_item)], catalog =
[i2u ; i2l] concat; rolling trainpipe pruned to the last transition;
NUM_PADS=0 (no padding — ISeq is exactly one item).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ... import criterions
from ..base import Batch, SeqRecArch
from ..modules import xavier_normal
from . import register


@register("FPMC")
class FPMC(SeqRecArch):
    NUM_PADS: int = 0

    maxlen: int = 50
    embedding_dim: int = 64
    loss: str = "BPR"

    def setup(self):
        D = self.embedding_dim
        self.user_embeddings = nn.Embed(
            self.User.count, D, embedding_init=xavier_normal
        )
        self.i2u = nn.Embed(self.Item.count, D, embedding_init=xavier_normal)
        self.i2l = nn.Embed(self.Item.count, D, embedding_init=xavier_normal)
        self.l2i = nn.Embed(self.Item.count, D, embedding_init=xavier_normal)

    def sure_trainpipe(self, maxlen: int, batch_size: int):
        return (
            self.dataset.train()
            .shuffled_roll_seqs_source(minlen=2, maxlen=maxlen, keep_at_least_itself=True)
            .lprune_(2, modified_fields=(self.ISeq,))
            .seq_train_yielding_pos_(start_idx_for_target=-1, end_idx_for_input=-1)
            .seq_train_sampling_neg_(num_negatives=1)
            .batch_(batch_size)
            .tensor_()
        )

    def sure_validpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 512):
        return (
            self.dataset.valid()
            .ordered_user_ids_source()
            .valid_sampling_(ranking)
            .lprune_(1, modified_fields=(self.ISeq,))
            .batch_(batch_size)
            .tensor_()
        )

    def sure_testpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 512):
        return (
            self.dataset.test()
            .ordered_user_ids_source()
            .test_sampling_(ranking)
            .lprune_(1, modified_fields=(self.ISeq,))
            .batch_(batch_size)
            .tensor_()
        )

    def encode(self, data: Batch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        last = data[self.ISeq][:, -1]  # (B,)
        q = jnp.concatenate(
            [self.user_embeddings(data[self.User]), self.l2i(last)], axis=-1
        )  # (B, 2D)
        catalog = jnp.concatenate(
            [self.i2u.embedding, self.i2l.embedding], axis=-1
        )  # (N, 2D)
        return q, catalog

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        q, catalog = self.encode(data)
        if self.loss in ("BCE", "BPR"):
            pos_logits = jnp.einsum("bd,bkd->bk", q, catalog[data[self.IPos]])
            neg_logits = jnp.einsum("bd,bkd->bk", q, catalog[data[self.INeg]])
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
                "bd,nd->bn", q, catalog, preferred_element_type=jnp.float32
            )
            rec_loss = criterions.cross_entropy_with_logits(
                logits, data[self.IPos][:, 0]
            )
        return rec_loss, {"rec_loss": rec_loss}

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        q, catalog = self.encode(data)
        return jnp.einsum(
            "bd,nd->bn", q, catalog, preferred_element_type=jnp.float32
        )

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        q, catalog = self.encode(data)
        return jnp.einsum("bd,bkd->bk", q, catalog[data[self.IUnseen]])
