"""NeuMF: MLP branch + MF branch fused by a final FC, BCE loss.

Reference: NeuMF/main.py:28-150 — separate user/item embeddings per
branch; MLP branch concat(u,i) → ReLU stack; MF branch u*i; concat →
fc → logit; trainpipe draws `num_negs` negatives per positive.
Baseline (Beauty): HR@10 0.0195, NDCG@10 0.0096.

Full-catalog scoring runs in item chunks (lax.map) to bound the
(B, N, D) intermediate — the single-GPU reference materializes it.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import criterions
from ..base import Batch, GenRecArch
from ..modules import xavier_normal
from . import register


@register("NeuMF")
class NeuMF(GenRecArch):
    embedding_dim: int = 64
    hidden_dims: Tuple[int, ...] = (64, 32, 16)
    num_negs: int = 4
    item_chunk: int = 2048

    def setup(self):
        init = nn.initializers.normal(stddev=1e-4)
        U, I, D = self.User.count, self.Item.count, self.embedding_dim
        self.user_mlp_embeddings = nn.Embed(U, D, embedding_init=init)
        self.user_mf_embeddings = nn.Embed(U, D, embedding_init=init)
        self.item_mlp_embeddings = nn.Embed(I, D, embedding_init=init)
        self.item_mf_embeddings = nn.Embed(I, D, embedding_init=init)
        self.linears = [
            nn.Dense(h, kernel_init=xavier_normal) for h in self.hidden_dims
        ]
        self.fc = nn.Dense(1, kernel_init=xavier_normal)

    def sure_trainpipe(self, batch_size: int):
        return (
            self.dataset.train()
            .choiced_user_ids_source()
            .gen_train_sampling_pos_()
            .gen_train_sampling_neg_(num_negatives=self.num_negs)
            .batch_(batch_size)
            .tensor_()
        )

    def _score(self, users: jnp.ndarray, items: jnp.ndarray) -> jnp.ndarray:
        """users: (B,), items: (B, K) → logits (B, K)."""
        u_mlp = self.user_mlp_embeddings(users)[:, None, :]
        i_mlp = self.item_mlp_embeddings(items)
        x = jnp.concatenate(
            [jnp.broadcast_to(u_mlp, i_mlp.shape), i_mlp], axis=-1
        )
        for linear in self.linears:
            x = nn.relu(linear(x))
        u_mf = self.user_mf_embeddings(users)[:, None, :]
        i_mf = self.item_mf_embeddings(items)
        mf = u_mf * i_mf
        return self.fc(jnp.concatenate([x, mf], axis=-1))[..., 0]

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        users = data[self.User]
        items = jnp.concatenate([data[self.IPos], data[self.INeg]], axis=1)
        logits = self._score(users, items)  # (B, 1+K)
        labels = jnp.concatenate(
            [
                jnp.ones_like(data[self.IPos], dtype=jnp.float32),
                jnp.zeros_like(data[self.INeg], dtype=jnp.float32),
            ],
            axis=1,
        )
        rec_loss = criterions.bce_with_logits(logits, labels)
        return rec_loss, {"rec_loss": rec_loss}

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        users = data[self.User]
        N = self.Item.count
        chunk = min(self.item_chunk, N)
        pad_n = (-N) % chunk
        all_items = jnp.arange(N + pad_n, dtype=jnp.int32) % N
        chunks = all_items.reshape(-1, chunk)

        def score_chunk(items):
            return self._score(users, jnp.broadcast_to(items[None], (users.shape[0], chunk)))

        scores = jax.lax.map(score_chunk, chunks)  # (C, B, chunk)
        scores = jnp.moveaxis(scores, 0, 1).reshape(users.shape[0], -1)
        return scores[:, :N]

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        return self._score(data[self.User], data[self.IUnseen])
