"""LightGCN: K-hop normalized-adjacency propagation, layer-mean, BPR.

Reference: LightGCN/main.py:27-125 — `Adj` buffer from
`dataset.train().to_normalized_adj("sym")` (:47-49), hot loop
`Adj @ allEmbds` (:82-84), loss = rec_loss + weight_decay * emb_loss
with the optimizer's own decay disabled (CoachForLightGCN.set_optimizer
comments out weight_decay). Baseline (Beauty): HR@10 0.0480±0.0008,
NDCG@10 0.0242±0.0004.

TPU note: the propagation is a gather + sorted segment-sum SpMM
(graph.SparseAdj.__matmul__); the adjacency is closed over as an XLA
constant, so the K-hop loop compiles to K fused gather/segment-sum
pairs living entirely on device.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ... import criterions
from ...graph import SparseAdj
from ..base import Batch, GenRecArch
from . import register


@register("LightGCN")
class LightGCN(GenRecArch):
    embedding_dim: int = 64
    num_layers: int = 3
    weight_decay: float = 1e-4  # folded into the loss, not the optimizer
    adj: Optional[SparseAdj] = None
    # custom-VJP SpMM whose backward runs the pre-sorted transpose
    # segment-sum (graph.py spmm_const). Measured -8% on the v5e at
    # the 196k-nnz bench graph (12.9 vs 11.9 ms/step — TPU scatter
    # variants tie, CLAUDE.md scatter_probe), so OFF by default;
    # kept as an opt-in for graphs where the unsorted backward
    # scatter dominates (very high-degree skew).
    spmm_const: bool = False

    def setup(self):
        init = nn.initializers.normal(stddev=1e-4)
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=init
        )
        self.item_embeddings = nn.Embed(
            self.Item.count, self.embedding_dim, embedding_init=init
        )

    def _adj(self) -> SparseAdj:
        if self.adj is not None:
            return self.adj
        raise ValueError("LightGCN requires adj=dataset.train().to_normalized_adj()")

    def sure_trainpipe(self, batch_size: int):
        return (
            self.dataset.train()
            .choiced_user_ids_source()
            .gen_train_sampling_pos_()
            .gen_train_sampling_neg_(num_negatives=1)
            .batch_(batch_size)
            .tensor_()
        )

    def encode(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        adj = self._adj()
        all_embds = jnp.concatenate(
            (self.user_embeddings.embedding, self.item_embeddings.embedding), axis=0
        )
        avg = all_embds / (self.num_layers + 1)
        x = all_embds
        for _ in range(self.num_layers):
            x = adj.spmm_const(x) if self.spmm_const else adj @ x
            avg = avg + x / (self.num_layers + 1)
        return avg[: self.User.count], avg[self.User.count :]

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        user_embds, item_embds = self.encode()
        users = data[self.User]
        positives = data[self.IPos]
        negatives = data[self.INeg]
        u = user_embds[users][:, None, :]
        p = item_embds[positives]
        n = item_embds[negatives]
        rec_loss = criterions.bpr_with_logits(
            jnp.einsum("bkd,bkd->bk", u, p),
            jnp.einsum("bkd,bkd->bk", jnp.broadcast_to(u, n.shape), n),
        )
        emb_loss = criterions.BaseCriterion.regularize(
            [
                self.user_embeddings(users),
                self.item_embeddings(positives),
                self.item_embeddings(negatives),
            ],
            rtype="l2",
        ) / users.shape[0]
        loss = rec_loss + self.weight_decay * emb_loss
        return loss, {"rec_loss": rec_loss, "emb_loss": emb_loss}

    def reset_ranking_buffers(self) -> Any:
        return self.encode()

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        user_embds, item_embds = buffers if buffers else self.encode()
        q = user_embds[data[self.User]]
        return jnp.einsum(
            "bd,nd->bn", q, item_embds, preferred_element_type=jnp.float32
        )

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        user_embds, item_embds = buffers if buffers else self.encode()
        q = user_embds[data[self.User]]
        cands = item_embds[data[self.IUnseen]]
        return jnp.einsum("bd,bkd->bk", q, cands)
