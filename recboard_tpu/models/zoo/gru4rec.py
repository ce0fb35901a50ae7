"""GRU4Rec: GRU encoder, last-position scoring.

Reference: GRU4Rec/main.py (class at :32): item embds → dropout →
multi-layer GRU → linear projection → last valid position → dot
product; rolling-window trainpipe with last-item targets
(`shuffled_roll_seqs_source(minlen=2)` + `seq_train_yielding_pos_(-1)`),
right padding. Baseline (Beauty, BCE): HR@10 0.0402, NDCG@10 0.0204.

TPU note: the recurrence runs as `nn.RNN`(GRUCell) → lax.scan; with
maxlen≈50 the scan is short and XLA pipelines the per-step matmuls.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ... import criterions
from ..base import Batch, SeqRecArch
from ..modules import xavier_normal
from . import register


@register("GRU4Rec")
class GRU4Rec(SeqRecArch):
    maxlen: int = 50
    embedding_dim: int = 64
    hidden_size: int = 128
    emb_dropout_rate: float = 0.2
    hidden_dropout_rate: float = 0.2
    num_blocks: int = 1
    loss: str = "BCE"

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
        self.hidden_dropout = nn.Dropout(self.hidden_dropout_rate)
        self.dense = nn.Dense(self.embedding_dim, kernel_init=xavier_normal)

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
        mask = seqs != self.PADDING_VALUE  # (B, L)
        x = self.item_embeddings(seqs)
        x = self.emb_dropout(x, deterministic=deterministic)
        lengths = mask.sum(axis=-1).astype(jnp.int32)
        # No seq_lengths: flax nn.RNN computes identical outputs at every
        # step either way — the flag only selects the final carry, which
        # we never read (we gather position lengths-1 from the outputs).
        # Step time is unchanged (A/B 3.03 vs 3.05 ms at the bench config:
        # XLA DCEs the stacked carry the flag adds), so this is semantic
        # de-noising, not a perf lever.
        for i, gru in enumerate(self.grus):
            x = gru(x)
            if i + 1 < len(self.grus):
                x = self.hidden_dropout(x, deterministic=deterministic)
        x = self.dense(x)  # (B, L, D)
        last = jnp.clip(lengths - 1, 0)
        q = jnp.take_along_axis(x, last[:, None, None].repeat(x.shape[-1], -1), axis=1)
        q = q[:, 0, :]  # (B, D) hidden at the last valid position
        item_embds = self.item_embeddings.embedding[self.NUM_PADS :]
        return q, item_embds

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        q, item_embds = self.encode(data, deterministic=False)
        pos = item_embds[data[self.IPos][:, 0]]  # (B, D)
        neg = item_embds[data[self.INeg][:, 0]]
        pos_logits = jnp.einsum("bd,bd->b", q, pos)
        neg_logits = jnp.einsum("bd,bd->b", q, neg)
        if self.loss == "BCE":
            rec_loss = criterions.bce_with_logits(
                pos_logits, jnp.ones_like(pos_logits)
            ) + criterions.bce_with_logits(neg_logits, jnp.zeros_like(neg_logits))
        elif self.loss == "BPR":
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
        cands = item_embds[data[self.IUnseen]]
        return jnp.einsum("bd,bkd->bk", q, cands)
