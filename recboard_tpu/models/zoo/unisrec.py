"""UniSRec: transferable recommendation from text-embedding items.

Reference: UniSRec/main.py:45-345 + UniSRec/modules.py:31-75 — frozen
text item embeddings (per-dataset tables fused with offsets,
main.py:64-97), noisy-gated MoE adaptor (modules.py:31-63), BERT-style
causal transformer (post-LN, gelu), L2-normalized last position; losses:
in-batch contrastive seq→item CE + seq→masked-seq CE, both /T;
multi-dataset train/eval via SampleMultiplexer with `mark_` dataset
tags; per-dataset metric namespaces ("name$METRIC",
main.py:428-447).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import criterions
from ...data.datasets import RecDataSet
from ...data.pipes import SampleMultiplexer
from ...ops import attention as attn_ops
from ..base import Batch, SeqRecArch
from . import register

_init02 = nn.initializers.normal(stddev=0.02)


class PWLayer(nn.Module):
    output_size: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic) - bias
        return nn.Dense(self.output_size, use_bias=False, kernel_init=_init02)(x)


class MoEAdaptorLayer(nn.Module):
    """Noisy-gated mixture of PW experts (UniSRec/modules.py:31-63)."""

    n_exps: int
    output_size: int
    dropout_rate: float = 0.0
    noise: bool = True

    @nn.compact
    def __call__(self, x, deterministic=True):
        F_in = x.shape[-1]
        w_gate = self.param("w_gate", nn.initializers.zeros, (F_in, self.n_exps))
        w_noise = self.param("w_noise", nn.initializers.zeros, (F_in, self.n_exps))
        clean = x @ w_gate
        if self.noise and not deterministic:
            stddev = nn.softplus(x @ w_noise) + 1e-2
            noise = jax.random.normal(self.make_rng("sampling"), clean.shape)
            logits = clean + noise * stddev
        else:
            logits = clean
        gates = nn.softmax(logits, axis=-1)  # (..., E)
        experts = jnp.stack(
            [
                PWLayer(self.output_size, self.dropout_rate, name=f"expert_{i}")(
                    x, deterministic
                )
                for i in range(self.n_exps)
            ],
            axis=-2,
        )  # (..., E, D)
        return (gates[..., None] * experts).sum(axis=-2)


class _PostLNBlock(nn.Module):
    dim: int
    num_heads: int
    hidden_dropout_rate: float
    attn_dropout_rate: float

    @nn.compact
    def __call__(self, x, attn_mask, deterministic=True):
        q = nn.Dense(self.dim, kernel_init=_init02, name="query")(x)
        k = nn.Dense(self.dim, kernel_init=_init02, name="key")(x)
        v = nn.Dense(self.dim, kernel_init=_init02, name="value")(x)
        # attn_mask: ops/attention.additive_causal_mask — the reference's
        # additive -1e4 semantics (UniSRec/main.py:249-257; a fully-masked
        # query row, e.g. a short sequence whose every item got
        # random-masked, degrades to plain softmax, not zeros); dropout
        # sits on the attention probabilities (modules.py:118-144).
        attn_dropout_active = self.attn_dropout_rate > 0.0 and not deterministic
        ctx = attn_ops.mha(
            q, k, v, num_heads=self.num_heads, causal=False, bias=attn_mask,
            dropout_rate=self.attn_dropout_rate,
            dropout_rng=self.make_rng("dropout") if attn_dropout_active else None,
        )
        h = nn.Dense(self.dim, kernel_init=_init02, name="dense")(ctx)
        h = nn.Dropout(self.hidden_dropout_rate)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-12)(h + x)
        f = nn.Dense(self.dim * 4, kernel_init=_init02)(x)
        f = nn.gelu(f, approximate=False)
        f = nn.Dense(self.dim, kernel_init=_init02)(f)
        f = nn.Dropout(self.hidden_dropout_rate)(f, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-12)(f + x)


@register("UniSRec")
class UniSRec(SeqRecArch):
    datasets: Optional[Dict[str, RecDataSet]] = None
    tfeats: Optional[Dict[str, np.ndarray]] = None  # per-dataset text feats
    maxlen: int = 50
    embedding_dim: int = 64
    num_heads: int = 1
    num_blocks: int = 2
    num_moe_experts: int = 8
    hidden_dropout_rate: float = 0.2
    attn_dropout_rate: float = 0.2
    adaptor_dropout_rate: float = 0.2
    mask_ratio: float = 0.2
    T: float = 0.07

    @property
    def names(self):
        return tuple(self.datasets)

    def _ranges(self):
        out = {}
        start = self.NUM_PADS
        for name in self.names:
            cnt = self.datasets[name].fields["ITEM", "ID"].count
            out[name] = (start, start + cnt)
            start += cnt
        return out

    def setup(self):
        feats = [np.asarray(self.tfeats[name], np.float32) for name in self.names]
        table = np.concatenate(feats, axis=0)
        table = np.concatenate(
            [np.zeros((self.NUM_PADS, table.shape[1]), np.float32), table], axis=0
        )
        self._table = jnp.asarray(table)  # frozen text features
        self.position_embeddings = nn.Embed(
            self.maxlen, self.embedding_dim, embedding_init=_init02
        )
        self.input_ln = nn.LayerNorm(epsilon=1e-12)
        self.input_dropout = nn.Dropout(self.hidden_dropout_rate)
        self.moe_adaptor = MoEAdaptorLayer(
            self.num_moe_experts, self.embedding_dim, self.adaptor_dropout_rate
        )
        self.blocks = [
            _PostLNBlock(
                self.embedding_dim, self.num_heads,
                self.hidden_dropout_rate, self.attn_dropout_rate,
            )
            for _ in range(self.num_blocks)
        ]

    def sure_trainpipe(self, maxlen: int, batch_size: int):
        ranges = self._ranges()
        pipes = []
        for name in self.names:
            pipes.append(
                self.datasets[name]
                .train()
                .shuffled_roll_seqs_source(minlen=2, maxlen=maxlen, keep_at_least_itself=True)
                .seq_train_yielding_pos_(start_idx_for_target=-1, end_idx_for_input=-1)
                .add_(offset=ranges[name][0], modified_fields=(self.ISeq, self.IPos))
                .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            )
        return (
            SampleMultiplexer({p: 1.0 for p in pipes}).batch_(batch_size).tensor_()
        )

    def _eval_pipe(self, split: str, maxlen: int, ranking: str, batch_size: int):
        ranges = self._ranges()
        pipes = []
        for name in self.names:
            view = getattr(self.datasets[name], split)()
            src = view.ordered_user_ids_source()
            src = (
                src.valid_sampling_(ranking)
                if split == "valid"
                else src.test_sampling_(ranking)
            )
            pipes.append(
                src.lprune_(maxlen, modified_fields=(self.ISeq,))
                .add_(offset=ranges[name][0], modified_fields=(self.ISeq,))
                .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
                .batch_(batch_size)
                .tensor_()
                .mark_(dataset=name)
            )
        return SampleMultiplexer({p: 1.0 for p in pipes})

    def sure_validpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 512):
        return self._eval_pipe("valid", maxlen, ranking, batch_size)

    def sure_testpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 512):
        return self._eval_pipe("test", maxlen, ranking, batch_size)

    def encode(self, seqs: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # built ONCE per encode (data-dependent, layer-independent)
        attn_mask = attn_ops.additive_causal_mask(seqs == self.PADDING_VALUE)
        x = self.moe_adaptor(self._table[seqs], deterministic=deterministic)
        x = x + self.position_embeddings(jnp.arange(seqs.shape[1])[None, :])
        x = self.input_ln(x)
        x = self.input_dropout(x, deterministic=deterministic)
        for block in self.blocks:
            x = block(x, attn_mask, deterministic)
        q = x[:, -1, :]
        return q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        seqs = data[self.ISeq]
        user_embds = self.encode(seqs, deterministic=False)
        pos = self.moe_adaptor(
            self._table[data[self.IPos][:, 0]], deterministic=False
        )
        pos = pos * jax.lax.rsqrt(jnp.sum(pos * pos, axis=-1, keepdims=True) + 1e-12)
        logits = jnp.einsum("bd,kd->bk", user_embds, pos) / self.T
        labels = jnp.arange(logits.shape[0], dtype=jnp.int32)
        rec_loss = criterions.cross_entropy_with_logits(logits, labels)

        rnds = jax.random.uniform(self.make_rng("sampling"), seqs.shape)
        masked = jnp.where(rnds < self.mask_ratio, self.PADDING_VALUE, seqs)
        masked_embds = self.encode(masked, deterministic=False)
        logits2 = jnp.einsum("bd,kd->bk", user_embds, masked_embds) / self.T
        s2s_loss = criterions.cross_entropy_with_logits(logits2, labels)
        loss = rec_loss + s2s_loss
        return loss, {"rec_loss": rec_loss, "s2s_loss": s2s_loss}

    def _dataset_items(self, name: str, deterministic=True) -> jnp.ndarray:
        start, end = self._ranges()[name]
        items = self.moe_adaptor(self._table[start:end], deterministic=deterministic)
        return items * jax.lax.rsqrt(
            jnp.sum(items * items, axis=-1, keepdims=True) + 1e-12
        )

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        name = data.get("dataset", self.names[0])
        q = self.encode(data[self.ISeq])
        items = self._dataset_items(name)
        return jnp.einsum(
            "bd,nd->bn", q, items, preferred_element_type=jnp.float32
        )

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        name = data.get("dataset", self.names[0])
        q = self.encode(data[self.ISeq])
        items = self._dataset_items(name)
        return jnp.einsum("bd,bkd->bk", q, items[data[self.IUnseen]])
