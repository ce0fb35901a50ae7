"""MF-BPR: user/item embeddings → dot product → BPR loss.

Reference: MF-BPR/main.py:25-109 (model), :60-68 (trainpipe),
:101-109 (full/pool scoring). Baseline (Amazon2014Beauty_550_LOU):
HR@10 0.0447±0.0004, NDCG@10 0.0227±0.0002.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ... import criterions
from ..base import Batch, GenRecArch
from . import register


@register("MF-BPR")
class MFBPR(GenRecArch):
    embedding_dim: int = 64
    num_negatives: int = 1

    def setup(self):
        init = nn.initializers.normal(stddev=1e-4)  # MF-BPR/main.py:55
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=init
        )
        self.item_embeddings = nn.Embed(
            self.Item.count, self.embedding_dim, embedding_init=init
        )

    def sure_trainpipe(self, batch_size: int):
        return (
            self.dataset.train()
            .choiced_user_ids_source()
            .gen_train_sampling_pos_()
            .gen_train_sampling_neg_(num_negatives=self.num_negatives)
            .batch_(batch_size)
            .tensor_()
        )

    def encode(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.user_embeddings.embedding, self.item_embeddings.embedding

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        users = data[self.User]  # (B,)
        positives = data[self.IPos]  # (B, 1)
        negatives = data[self.INeg]  # (B, K)
        u = self.user_embeddings(users)[:, None, :]  # (B, 1, D)
        p = self.item_embeddings(positives)  # (B, 1, D)
        n = self.item_embeddings(negatives)  # (B, K, D)
        pos_logits = jnp.einsum("bkd,bkd->bk", u, p)
        neg_logits = jnp.einsum("bkd,bkd->bk", jnp.broadcast_to(u, n.shape), n)
        rec_loss = criterions.bpr_with_logits(pos_logits, neg_logits)
        return rec_loss, {"rec_loss": rec_loss}

    def reset_ranking_buffers(self) -> Any:
        return self.encode()

    def encode_queries(self, data: Batch) -> jnp.ndarray:
        return self.user_embeddings(data[self.User])

    def item_table(self) -> jnp.ndarray:
        return self.item_embeddings.embedding

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        user_embds, item_embds = buffers if buffers else self.encode()
        q = user_embds[data[self.User]]
        return jnp.einsum(
            "bd,nd->bn", q, item_embds, preferred_element_type=jnp.float32
        )

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        user_embds, item_embds = buffers if buffers else self.encode()
        q = user_embds[data[self.User]]  # (B, D)
        cands = item_embds[data[self.IUnseen]]  # (B, K, D)
        return jnp.einsum("bd,bkd->bk", q, cands)
