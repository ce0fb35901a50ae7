"""GLINT-RU: GRU + linear-attention dual path with MoE-style fusion.

Reference: GLINT-RU/main.py:37-245 + GLINT-RU/modules.py:5-73 —
branch 1: Conv1d(k=3) → GRU → SiLU selective gate ∘ projection →
Conv1d; branch 2: ELU-normalized linear attention
(q,k ELU'd then L2-normalized over the head dim, context =
q̂ (k̂ᵀ v)/√hd — O(L·d²), no softmax); softmax([w0,w1]) expert mix ∘
GELU branch → dense + LN residual; SwiGLU-ish FFN; last-position
scoring. Right-padded rolling windows, last-item target.
Baseline (Beauty, BCE): HR@10 0.0678, NDCG@10 0.0377.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import criterions
from ..base import Batch, SeqRecArch
from . import register

_xu = nn.initializers.xavier_uniform()


class LinearAttention(nn.Module):
    hidden_size: int
    num_heads: int
    hidden_dropout_rate: float
    attn_dropout_rate: float
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, x, deterministic=True):
        B, L, D = x.shape
        H = self.num_heads
        hd = D // H
        q = nn.Dense(D, kernel_init=_xu, name="query")(x).reshape(B, L, H, hd)
        k = nn.Dense(D, kernel_init=_xu, name="key")(x).reshape(B, L, H, hd)
        v = nn.Dense(D, kernel_init=_xu, name="value")(x).reshape(B, L, H, hd)
        q = nn.elu(q).transpose(0, 2, 1, 3)  # (B, H, L, hd)
        k = nn.elu(k).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        qn = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
        kn = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-24)
        kv = jnp.einsum("bhld,bhle->bhde", kn, v)  # (B, H, hd, hd)
        ctx = jnp.einsum("bhld,bhde->bhle", qn, kv) / (hd**0.5)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, D)
        out = nn.Dense(D, kernel_init=_xu, name="dense")(ctx)
        out = nn.Dropout(self.hidden_dropout_rate)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=self.layer_norm_eps)(out + x)


@register("GLINT-RU")
class GLINTRU(SeqRecArch):
    maxlen: int = 50
    embedding_dim: int = 128
    hidden_size: int = 128
    num_heads: int = 8
    num_layers: int = 1
    emb_dropout_rate: float = 0.0
    hidden_dropout_rate: float = 0.2
    attn_dropout_rate: float = 0.2
    layer_norm_eps: float = 1e-12
    loss: str = "BCE"

    def setup(self):
        H = self.hidden_size
        self.item_embeddings = nn.Embed(
            self.Item.count + self.NUM_PADS,
            self.embedding_dim,
            embedding_init=nn.initializers.xavier_normal(),
        )
        self.emb_dropout = nn.Dropout(self.emb_dropout_rate)
        self.dense1 = nn.Dense(H, kernel_init=_xu)
        self.dense2 = nn.Dense(H, kernel_init=_xu)
        self.conv1d = nn.Conv(H, kernel_size=(3,), padding="SAME")
        self.gru_layers = [
            nn.RNN(
                nn.GRUCell(H, kernel_init=_xu, recurrent_kernel_init=_xu),
                name=f"gru_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.conv1dforgru = nn.Conv(H, kernel_size=(3,), padding="SAME")
        self.linearattention = LinearAttention(
            H, self.num_heads, self.hidden_dropout_rate, self.attn_dropout_rate,
            self.layer_norm_eps,
        )
        self.expert_weights = self.param(
            "weights", lambda k, s: jnp.full(s, 0.5), (2,)
        )
        self.dense_mix = nn.Dense(H, kernel_init=_xu)
        self.dense3 = nn.Dense(H, kernel_init=_xu)
        self.dense4 = nn.Dense(H, kernel_init=_xu)
        self.denseout = nn.Dense(self.embedding_dim, kernel_init=_xu)
        self.dropdense = nn.Dropout(0.3)
        self.dropmix = nn.Dropout(0.3)
        self.ln = nn.LayerNorm(epsilon=self.layer_norm_eps)
        self.proj = nn.Dense(H, kernel_init=_xu)
        self.gate_down = nn.Dense(H // 2, kernel_init=_xu)
        self.gate_up = nn.Dense(H, kernel_init=_xu)
        self.gate_dropout = nn.Dropout(0.3)

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
        seqs = data[self.ISeq]
        mask = seqs != self.PADDING_VALUE
        lengths = mask.sum(axis=-1).astype(jnp.int32)
        x = self.item_embeddings(seqs)
        x = self.emb_dropout(x, deterministic=deterministic)

        attention_output = self.linearattention(x, deterministic=deterministic)
        h1 = self.conv1d(self.dense1(x))
        h2 = nn.gelu(self.dense2(x))

        g = h1
        # no seq_lengths: bit-identical outputs (the flag only selects the
        # final carry, unread here) — see gru4rec.py
        for gru in self.gru_layers:
            g = gru(g)
        gate = self.gate_dropout(
            self.gate_up(nn.silu(self.gate_down(h1))), deterministic=deterministic
        )
        g = gate * self.proj(g)
        g = self.conv1dforgru(g)

        w = nn.softmax(self.expert_weights)
        expert = w[0] * g + w[1] * attention_output
        h = expert * h2
        h = self.dropmix(self.dense_mix(h), deterministic=deterministic)
        h = self.ln(h + x)

        f = self.dense3(h) * nn.gelu(self.dense4(h))
        f = self.dropdense(self.denseout(f), deterministic=deterministic)
        f = self.ln(f + h)

        last = jnp.clip(lengths - 1, 0)
        q = jnp.take_along_axis(
            f, last[:, None, None].repeat(f.shape[-1], -1), axis=1
        )[:, 0, :]
        return q, self.item_embeddings.embedding[self.NUM_PADS :]

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        q, item_embds = self.encode(data, deterministic=False)
        if self.loss in ("BCE", "BPR"):
            pos_logits = jnp.einsum("bd,bkd->bk", q, item_embds[data[self.IPos]])
            neg_logits = jnp.einsum("bd,bkd->bk", q, item_embds[data[self.INeg]])
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
        return jnp.einsum("bd,bkd->bk", q, item_embds[data[self.IUnseen]])
