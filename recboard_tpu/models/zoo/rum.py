"""RUM: memory-network read of item memories (pool ranking only).

Reference: RUM/main.py:29-140 — candidate-conditioned softmax read over
the sequence memory (masked over pads), user += alpha * read; score =
sum(dropout(user ∘ item)); BPR over 1 positive vs negatives;
`recommend_from_full` is explicitly unsupported in the reference.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import criterions
from ..base import Batch, SeqRecArch
from ..modules import xavier_normal
from . import register


@register("RUM")
class RUM(SeqRecArch):
    SUPPORTED_RANKINGS = ("pool",)
    maxlen: int = 50
    embedding_dim: int = 64
    alpha: float = 0.2
    dropout_rate: float = 0.2

    def setup(self):
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=xavier_normal
        )
        self.item_embeddings = nn.Embed(
            self.Item.count + self.NUM_PADS,
            self.embedding_dim,
            embedding_init=xavier_normal,
        )
        self.dropout = nn.Dropout(self.dropout_rate)

    def sure_trainpipe(self, maxlen: int, batch_size: int):
        return (
            self.dataset.train()
            .shuffled_seqs_source(maxlen)
            .gen_train_sampling_pos_()
            .gen_train_sampling_neg_(num_negatives=1)
            .add_(self.NUM_PADS, modified_fields=(self.ISeq,))
            .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def read_memory(self, seq_embds, cand_embds, padding_mask):
        sim = jnp.einsum("bsd,bkd->bsk", seq_embds, cand_embds)
        sim = jnp.where(padding_mask[:, :, None], -1e23, sim)
        sim = jax.nn.softmax(sim, axis=1)  # over the sequence (memory) axis
        return jnp.einsum("bsk,bsd->bkd", sim, seq_embds)

    def _score(self, data: Batch, candidates: jnp.ndarray, deterministic: bool):
        seqs = data[self.ISeq]
        seq_embds = self.item_embeddings(seqs)
        item_embds = self.item_embeddings.embedding[self.NUM_PADS :]
        cand_embds = item_embds[candidates]  # (B, K, D)
        u = self.user_embeddings(data[self.User])[:, None, :]  # (B, 1, D)
        u = u + self.alpha * self.read_memory(
            seq_embds, cand_embds, seqs == self.PADDING_VALUE
        )
        return self.dropout(u * cand_embds, deterministic=deterministic).sum(-1)

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        candidates = jnp.concatenate([data[self.IPos], data[self.INeg]], axis=1)
        scores = self._score(data, candidates, deterministic=False)
        rec_loss = criterions.bpr_with_logits(scores[:, :1], scores[:, 1:])
        return rec_loss, {"rec_loss": rec_loss}

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        raise NotImplementedError("RUM does not support full ranking (RUM/main.py:113)")

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        return self._score(data, data[self.IUnseen], deterministic=True)
