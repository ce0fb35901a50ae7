"""SASRec: causal transformer over item sequences.

Reference: SASRec/main.py:53-236 — item embds * sqrt(D) + position
embds → dropout → [LN + causal MHA (residual) → LN + pointwise FFN
(residual)] × K → LN → dot-product scoring; BCE/BPR/CE losses over
per-position targets with padding positions masked by *weighting*
(static shapes) instead of boolean gathers (SASRec/main.py:199-200).
Baseline (Amazon2014Beauty_550_LOU, BCE): HR@10 0.0668±0.0012,
NDCG@10 0.0354±0.0009.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ... import criterions
from ..base import Batch, SeqRecArch
from ..modules import SASRecBlock, xavier_normal
from . import register


@register("SASRec")
class SASRec(SeqRecArch):
    maxlen: int = 50
    num_heads: int = 1
    num_blocks: int = 2
    embedding_dim: int = 64
    dropout_rate: float = 0.2
    loss: str = "BCE"  # BCE | BPR | CE
    # rematerialize blocks in backward (recompute instead of reloading
    # saved intermediates) — A/B'd in tools/step_ablate.py
    remat: bool = False

    def setup(self):
        self.item_embeddings = nn.Embed(
            self.Item.count + self.NUM_PADS,
            self.embedding_dim,
            embedding_init=xavier_normal,
        )
        self.position_embeddings = nn.Embed(
            self.maxlen, self.embedding_dim, embedding_init=xavier_normal
        )
        self.embd_dropout = nn.Dropout(self.dropout_rate)
        # deterministic (arg 3 counting the module) must stay static
        Block = (
            nn.remat(SASRecBlock, static_argnums=(3,)) if self.remat else SASRecBlock
        )
        self.blocks = [
            Block(self.embedding_dim, self.num_heads, self.dropout_rate)
            for _ in range(self.num_blocks)
        ]
        self.last_ln = nn.LayerNorm(epsilon=1e-8)

    def sure_trainpipe(self, maxlen: int, batch_size: int):
        return (
            self.dataset.train()
            .shuffled_seqs_source(maxlen=maxlen)
            .seq_train_yielding_pos_(start_idx_for_target=1, end_idx_for_input=-1)
            .seq_train_sampling_neg_(num_negatives=1)
            .add_(offset=self.NUM_PADS, modified_fields=(self.ISeq,))
            .lpad_(
                maxlen,
                modified_fields=(self.ISeq, self.IPos, self.INeg),
                padding_value=self.PADDING_VALUE,
            )
            .batch_(batch_size)
            .tensor_()
        )

    def _forward(
        self, x: jnp.ndarray, seqs: jnp.ndarray, deterministic: bool
    ) -> jnp.ndarray:
        """Transformer tower over already-gathered item embeddings."""
        padding_mask = (seqs == self.PADDING_VALUE)[..., None]  # (B, L, 1)
        x = x * (self.embedding_dim**0.5)
        positions = jnp.arange(self.maxlen)[None, :]
        x = x + self.position_embeddings(positions)
        x = self.embd_dropout(x, deterministic=deterministic)
        x = jnp.where(padding_mask, 0.0, x)
        for block in self.blocks:
            # positional deterministic: under nn.remat it is static arg 3
            x = block(x, padding_mask, deterministic)
        return self.last_ln(x)  # (B, L, D)

    def encode(
        self, data: Batch, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        seqs = data[self.ISeq]  # (B, L) offset ids, 0 = pad
        user_embds = self._forward(
            self.item_embeddings(seqs), seqs, deterministic
        )
        item_embds = self.item_embeddings.embedding[self.NUM_PADS :]
        return user_embds, item_embds

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        seqs = data[self.ISeq]
        weights = (seqs != self.PADDING_VALUE).astype(jnp.float32)  # (B, L)

        if self.loss in ("BCE", "BPR"):
            # Targets are the inputs shifted by one (the pipe's
            # seq_train_yielding_pos_(1, -1) contract, SASRec/main.py:147),
            # so gather the table ONCE over the (B, L+1)-id extended
            # sequence instead of twice over (B, L): pos embeddings are a
            # shifted view of the same rows. Cuts backward scatter rows by
            # a third — the step is scatter-bound on TPU (tools/
            # scatter_probe.py). Exact at every weight>0 position because
            # lpad_ keeps valid positions a contiguous suffix; at weight=0
            # positions the gathered row differs but never reaches the
            # loss. The last column appends IPos[:, -1] (the one target
            # not present in the inputs).
            last = jnp.where(
                seqs[:, -1:] != self.PADDING_VALUE,
                data[self.IPos][:, -1:] + self.NUM_PADS,
                self.PADDING_VALUE,
            )
            ext = jnp.concatenate([seqs, last], axis=1)  # (B, L+1)
            full = self.item_embeddings(ext)  # (B, L+1, D)
            user_embds = self._forward(full[:, :-1], seqs, deterministic=False)
            item_embds = self.item_embeddings.embedding[self.NUM_PADS :]
            pos = full[:, 1:]  # (B, L, D) == item_embds[IPos] where weight>0
            neg = item_embds[data[self.INeg]]
            pos_logits = jnp.einsum("bld,bld->bl", user_embds, pos)
            neg_logits = jnp.einsum("bld,bld->bl", user_embds, neg)
            if self.loss == "BCE":
                rec_loss = criterions.bce_with_logits(
                    pos_logits, jnp.ones_like(pos_logits), weights=weights
                ) + criterions.bce_with_logits(
                    neg_logits, jnp.zeros_like(neg_logits), weights=weights
                )
            else:
                rec_loss = criterions.bpr_with_logits(
                    pos_logits, neg_logits, weights=weights
                )
        else:  # CE over the full catalog
            user_embds, item_embds = self.encode(data, deterministic=False)
            logits = jnp.einsum(
                "bld,nd->bln", user_embds, item_embds,
                preferred_element_type=jnp.float32,
            )
            rec_loss = criterions.cross_entropy_with_logits(
                logits, data[self.IPos], weights=weights
            )
        return rec_loss, {"rec_loss": rec_loss}

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        user_embds, item_embds = self.encode(data)
        q = user_embds[:, -1, :]
        return jnp.einsum(
            "bd,nd->bn", q, item_embds, preferred_element_type=jnp.float32
        )

    def encode_queries(self, data: Batch) -> jnp.ndarray:
        user_embds, _ = self.encode(data)
        return user_embds[:, -1, :]

    def item_table(self) -> jnp.ndarray:
        return self.item_embeddings.embedding[self.NUM_PADS :]

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        user_embds, item_embds = self.encode(data)
        q = user_embds[:, -1, :]
        cands = item_embds[data[self.IUnseen]]  # (B, K, D)
        return jnp.einsum("bd,bkd->bk", q, cands)
