"""STOSA: stochastic (mean, cov) embeddings with Wasserstein attention.

Reference: STOSA/main.py:43-240 + STOSA/modules.py:26-262 — mean/cov
item+position embeddings (shared LN, ELU; cov gets +1 for PSD),
distributional self-attention scoring -W2(q,k)/sqrt(hd), probs² for the
cov context, per-stream 4× ELU intermediates; BPR on negative
Wasserstein distances + PVN hinge regularizer.

Faithfulness note: the reference encoder has a typo
(`maen_hidden_states`, STOSA/modules.py:257) so the MEAN stream is
never propagated across layers — the committed baseline numbers
(Beauty HR@10 0.0725) were produced by that behavior. We replicate it
by default; set `propagate_mean=True` for the paper's architecture.

TPU note: full-catalog scoring uses the matmul decomposition of the
Wasserstein distance (||m1-m2||² expanded, STOSA/modules.py:34-48) so
eval is two MXU matmuls instead of a (B, N, D) broadcast.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ... import criterions
from ..base import Batch, SeqRecArch
from . import register

_init = nn.initializers.normal(stddev=0.02)
# reference inits Linear/Embedding weights to normal(mean=0.01, std=0.02)
def _init_mean001(key, shape, dtype=jnp.float32):
    return _init(key, shape, dtype) + 0.01


def wasserstein_distance(m1, c1, m2, c2):
    ret = jnp.sum((m1 - m2) ** 2, -1)
    s1 = jnp.sqrt(jnp.clip(c1, 1e-24))
    s2 = jnp.sqrt(jnp.clip(c2, 1e-24))
    return ret + jnp.sum((s1 - s2) ** 2, -1)


def wasserstein_distance_matmul(m1, c1, m2, c2):
    """Pairwise W2² between rows of (…, L1, D) and (…, L2, D)."""
    m1_2 = jnp.sum(m1**2, -1, keepdims=True)
    m2_2 = jnp.sum(m2**2, -1, keepdims=True)
    ret = -2 * jnp.einsum("...id,...jd->...ij", m1, m2) + m1_2 + jnp.swapaxes(
        m2_2, -1, -2
    )
    c1_2 = jnp.sum(c1, -1, keepdims=True)
    c2_2 = jnp.sum(c2, -1, keepdims=True)
    s1 = jnp.sqrt(jnp.clip(c1, 1e-24))
    s2 = jnp.sqrt(jnp.clip(c2, 1e-24))
    cov = -2 * jnp.einsum("...id,...jd->...ij", s1, s2) + c1_2 + jnp.swapaxes(
        c2_2, -1, -2
    )
    return ret + cov


class DistSelfAttention(nn.Module):
    hidden_size: int
    num_heads: int
    hidden_dropout_rate: float = 0.0
    attn_dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, mean_x, cov_x, attn_bias, deterministic=True):
        B, L, D = mean_x.shape
        H = self.num_heads
        hd = D // H

        def heads(x):
            return x.reshape(B, L, H, hd).transpose(0, 2, 1, 3)

        mq = heads(nn.Dense(D, kernel_init=_init_mean001, name="mean_query")(mean_x))
        mk = heads(nn.Dense(D, kernel_init=_init_mean001, name="mean_key")(mean_x))
        mv = heads(nn.Dense(D, kernel_init=_init_mean001, name="mean_value")(mean_x))
        cq = heads(nn.elu(nn.Dense(D, kernel_init=_init_mean001, name="cov_query")(cov_x)) + 1)
        ck = heads(nn.elu(nn.Dense(D, kernel_init=_init_mean001, name="cov_key")(cov_x)) + 1)
        cv = heads(nn.elu(nn.Dense(D, kernel_init=_init_mean001, name="cov_value")(cov_x)) + 1)

        scores = -wasserstein_distance_matmul(mq, cq, mk, ck) / (hd**0.5)
        scores = scores + attn_bias  # (B, H, L, L)
        probs = nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.attn_dropout_rate)(probs, deterministic=deterministic)

        mean_ctx = jnp.einsum("bhls,bhsd->bhld", probs, mv)
        cov_ctx = jnp.einsum("bhls,bhsd->bhld", probs**2, cv)
        mean_ctx = mean_ctx.transpose(0, 2, 1, 3).reshape(B, L, D)
        cov_ctx = cov_ctx.transpose(0, 2, 1, 3).reshape(B, L, D)

        # the reference uses ONE LayerNorm module for BOTH residual
        # streams (STOSA/modules.py:141,181-187 — self.LayerNorm applied
        # to mean and cov alike), so the scale/bias are shared params
        ln = nn.LayerNorm(epsilon=1e-12, name="ln")
        mh = nn.Dense(D, kernel_init=_init_mean001, name="mean_dense")(mean_ctx)
        mh = nn.Dropout(self.hidden_dropout_rate)(mh, deterministic=deterministic)
        mh = ln(mh + mean_x)
        ch = nn.Dense(D, kernel_init=_init_mean001, name="cov_dense")(cov_ctx)
        ch = nn.Dropout(self.hidden_dropout_rate)(ch, deterministic=deterministic)
        ch = ln(ch + cov_x)
        return mh, ch


class DistIntermediate(nn.Module):
    hidden_size: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.hidden_size * 4, kernel_init=_init_mean001)(x)
        h = nn.elu(h)
        h = nn.Dense(self.hidden_size, kernel_init=_init_mean001)(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-12)(h + x)


class DistLayer(nn.Module):
    hidden_size: int
    num_heads: int
    hidden_dropout_rate: float = 0.0
    attn_dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, mean_x, cov_x, attn_bias, deterministic=True):
        ma, ca = DistSelfAttention(
            self.hidden_size, self.num_heads,
            self.hidden_dropout_rate, self.attn_dropout_rate,
        )(mean_x, cov_x, attn_bias, deterministic)
        mean_out = DistIntermediate(self.hidden_size, self.hidden_dropout_rate)(
            ma, deterministic
        )
        cov_out = (
            nn.elu(
                DistIntermediate(self.hidden_size, self.hidden_dropout_rate)(
                    ca, deterministic
                )
            )
            + 1
        )
        return mean_out, cov_out


@register("STOSA")
class STOSA(SeqRecArch):
    maxlen: int = 50
    num_heads: int = 4
    num_blocks: int = 1
    embedding_dim: int = 64
    hidden_dropout_rate: float = 0.3
    attn_dropout_rate: float = 0.0
    pvn_weight: float = 0.005
    distance_metric: str = "wasserstein"
    propagate_mean: bool = False  # False = replicate the reference typo

    def setup(self):
        N = self.Item.count + self.NUM_PADS
        D = self.embedding_dim
        self.item_mean_embds = nn.Embed(N, D, embedding_init=_init_mean001)
        self.item_cov_embds = nn.Embed(N, D, embedding_init=_init_mean001)
        self.pos_mean_embds = nn.Embed(self.maxlen, D, embedding_init=_init_mean001)
        self.pos_cov_embds = nn.Embed(self.maxlen, D, embedding_init=_init_mean001)
        self.embd_ln = nn.LayerNorm(epsilon=1e-12)
        self.embd_dropout = nn.Dropout(self.hidden_dropout_rate)
        self.layers = [
            DistLayer(
                D, self.num_heads, self.hidden_dropout_rate, self.attn_dropout_rate,
                name=f"layer_{i}",
            )
            for i in range(self.num_blocks)
        ]

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

    def encode(self, data: Batch, deterministic: bool = True):
        seqs = data[self.ISeq]
        L = seqs.shape[1]
        positions = jnp.arange(L)[None, :]
        mean_x = self.item_mean_embds(seqs) + self.pos_mean_embds(positions)
        mean_x = nn.elu(
            self.embd_dropout(self.embd_ln(mean_x), deterministic=deterministic)
        )
        cov_x = self.item_cov_embds(seqs) + self.pos_cov_embds(positions)
        cov_x = (
            nn.elu(
                self.embd_dropout(self.embd_ln(cov_x), deterministic=deterministic)
            )
            + 1
        )
        causal = jnp.tril(jnp.ones((L, L), dtype=bool))
        valid = (seqs != self.PADDING_VALUE)[:, None, None, :] & causal[None, None]
        attn_bias = jnp.where(valid, 0.0, -(2.0**32) + 1)
        mean_h, cov_h = mean_x, cov_x
        for layer in self.layers:
            mean_out, cov_out = layer(mean_h, cov_h, attn_bias, deterministic)
            cov_h = cov_out
            if self.propagate_mean:
                mean_h = mean_out
        # last-layer output: (mean_out, cov_out) per the `-1` indexing —
        # under the reference typo the recorded mean is the layer INPUT
        final_mean = mean_h if not self.propagate_mean else mean_out
        return (
            final_mean,
            cov_h,
            self.item_mean_embds.embedding[self.NUM_PADS :],
            self.item_cov_embds.embedding[self.NUM_PADS :],
        )

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        mean_u, cov_u, mean_i, cov_i = self.encode(data, deterministic=False)
        seqs = data[self.ISeq]
        weights = (seqs != self.PADDING_VALUE).astype(jnp.float32)
        mp = mean_i[data[self.IPos]]
        cp = nn.elu(cov_i[data[self.IPos]]) + 1
        mn = mean_i[data[self.INeg]]
        cn = nn.elu(cov_i[data[self.INeg]]) + 1
        pos_logits = -wasserstein_distance(mean_u, cov_u, mp, cp)  # (B, L)
        neg_logits = -wasserstein_distance(mean_u, cov_u, mn, cn)
        pvn_logits = -wasserstein_distance(mp, cp, mn, cn)
        rec_loss = criterions.bpr_with_logits(pos_logits, neg_logits, weights=weights)
        pvn_loss = (
            jnp.clip(pvn_logits - pos_logits, 0.0) * weights
        ).sum() / jnp.maximum(weights.sum(), 1.0)
        loss = rec_loss + self.pvn_weight * pvn_loss
        return loss, {"rec_loss": rec_loss, "pvn_loss": pvn_loss}

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        mean_u, cov_u, mean_i, cov_i = self.encode(data)
        mean_q = mean_u[:, -1, :]
        cov_q = cov_u[:, -1, :]
        cov_i = nn.elu(cov_i) + 1
        return -wasserstein_distance_matmul(
            mean_q[:, None, :], cov_q[:, None, :], mean_i[None], cov_i[None]
        )[:, 0, :]

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        mean_u, cov_u, mean_i, cov_i = self.encode(data)
        mean_q = mean_u[:, -1:, :]
        cov_q = cov_u[:, -1:, :]
        mi = mean_i[data[self.IUnseen]]
        ci = nn.elu(cov_i[data[self.IUnseen]]) + 1
        return -wasserstein_distance(mean_q, cov_q, mi, ci)
