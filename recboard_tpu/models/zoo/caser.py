"""Caser: horizontal + vertical convolutions over the sequence "image".

Reference: Caser/main.py:35-180 — vertical Conv2d(kernel=(maxlen,1)) +
horizontal Conv2d(kernel=(k,D)) for k=1..maxlen with ReLU + max-pool →
concat → dropout → fc → concat with user embedding → scores against a
separate W2/b2 item table; multi-pos/multi-neg targets, BCE.
Baseline (Beauty): HR@10 0.0427, NDCG@10 0.0227.

TPU note: the vertical conv is an einsum over the time axis; horizontal
convs compile to k-tap dot-generals — all MXU work, no im2col copies.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ... import criterions
from ..base import Batch, SeqRecArch
from ..modules import xavier_normal
from . import register


@register("Caser")
class Caser(SeqRecArch):
    maxlen: int = 5
    embedding_dim: int = 64
    num_vert: int = 4
    num_horiz: int = 16
    dropout_rate: float = 0.5
    num_poss: int = 3
    num_negs: int = 3

    def setup(self):
        D = self.embedding_dim
        emb_init = nn.initializers.normal(stddev=1.0 / D)
        self.user_embeddings = nn.Embed(self.User.count, D, embedding_init=emb_init)
        self.item_embeddings = nn.Embed(
            self.Item.count + self.NUM_PADS, D, embedding_init=emb_init
        )
        # vertical: (num_vert, maxlen) weights + bias
        self.vert_kernel = self.param(
            "vert_kernel", xavier_normal, (self.num_vert, self.maxlen)
        )
        self.vert_bias = self.param(
            "vert_bias", nn.initializers.zeros, (self.num_vert,)
        )
        # horizontal: per window size k, (num_horiz, k, D) weights
        self.horiz_kernels = [
            self.param(f"horiz_kernel_{k}", xavier_normal, (self.num_horiz, k * D))
            for k in range(1, self.maxlen + 1)
        ]
        self.horiz_biases = [
            self.param(f"horiz_bias_{k}", nn.initializers.zeros, (self.num_horiz,))
            for k in range(1, self.maxlen + 1)
        ]
        self.fc1 = nn.Dense(D, kernel_init=xavier_normal)
        self.dropout = nn.Dropout(self.dropout_rate)
        self.W2 = nn.Embed(self.Item.count, 2 * D, embedding_init=emb_init)
        self.b2 = nn.Embed(
            self.Item.count, 1, embedding_init=nn.initializers.zeros
        )

    def sure_trainpipe(self, maxlen: int, batch_size: int):
        return (
            self.dataset.train()
            .shuffled_roll_seqs_source(
                minlen=self.num_poss + 1,
                maxlen=maxlen + self.num_poss,
                keep_at_least_itself=False,
            )
            .seq_train_yielding_pos_(
                start_idx_for_target=-self.num_poss,
                end_idx_for_input=-self.num_poss,
            )
            .gen_train_sampling_neg_(num_negatives=self.num_negs)
            .add_(offset=self.NUM_PADS, modified_fields=(self.ISeq,))
            .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def encode(self, data: Batch, deterministic: bool = True) -> jnp.ndarray:
        users, seqs = data[self.User], data[self.ISeq]
        mask = (seqs != self.PADDING_VALUE)[..., None].astype(jnp.float32)
        x = self.item_embeddings(seqs) * mask  # (B, L, D) padding_idx→0
        u = self.user_embeddings(users)  # (B, D)

        vert = jnp.einsum("bld,cl->bcd", x, self.vert_kernel)
        vert = vert + self.vert_bias[None, :, None]
        vert = vert.reshape(x.shape[0], -1)  # (B, num_vert*D)

        horiz_feats = []
        L, D = x.shape[1], x.shape[2]
        for k in range(1, self.maxlen + 1):
            # (B, L-k+1, k*D) sliding windows via static strided slices
            windows = jnp.concatenate(
                [x[:, i : L - k + 1 + i, :] for i in range(k)], axis=-1
            )
            y = windows @ self.horiz_kernels[k - 1].T + self.horiz_biases[k - 1]
            y = nn.relu(y)  # (B, L-k+1, C)
            horiz_feats.append(y.max(axis=1))  # (B, C)
        horiz = jnp.concatenate(horiz_feats, axis=1)  # (B, C*maxlen)

        feats = self.dropout(
            jnp.concatenate([vert, horiz], axis=1), deterministic=deterministic
        )
        feats = nn.relu(self.fc1(feats))
        return jnp.concatenate([feats, u], axis=1)  # (B, 2D)

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        q = self.encode(data, deterministic=False)
        items = jnp.concatenate([data[self.IPos], data[self.INeg]], axis=1)
        w = self.W2(items)  # (B, K, 2D)
        b = self.b2(items)[..., 0]  # (B, K)
        logits = jnp.einsum("bkd,bd->bk", w, q) + b
        pos_logits = logits[:, : self.num_poss]
        neg_logits = logits[:, self.num_poss :]
        rec_loss = criterions.bce_with_logits(
            pos_logits, jnp.ones_like(pos_logits)
        ) + criterions.bce_with_logits(neg_logits, jnp.zeros_like(neg_logits))
        return rec_loss, {"rec_loss": rec_loss}

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        q = self.encode(data)
        return (
            jnp.einsum(
                "bd,nd->bn", q, self.W2.embedding,
                preferred_element_type=jnp.float32,
            )
            + self.b2.embedding[:, 0][None]
        )

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        q = self.encode(data)
        w = self.W2(data[self.IUnseen])
        b = self.b2(data[self.IUnseen])[..., 0]
        return jnp.einsum("bkd,bd->bk", w, q) + b
