"""BERT4Rec: bidirectional encoder with in-batch random masking.

Reference: BERT4Rec/main.py:31-170 — NUM_PADS=2 (pad=0, mask=1,
:39-41); trainpipe feeds raw sequences, `random_mask` replaces items
with MASK at rate `mask_ratio` in-batch (:154-163); eval prunes to
maxlen-1 and right-appends one MASK (validpipe :112-127); CE over an fc
projection to Item.count+NUM_PADS logits at masked positions only —
implemented here as weighted CE (static shapes). Baseline (Beauty, CE):
HR@10 0.0730±0.0006, NDCG@10 0.0406±0.0005.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import criterions
from ..base import Batch, SeqRecArch
from ..modules import TransformerBlock, xavier_normal
from . import register


def _clamped_xavier(key, shape, dtype=jnp.float32):
    return jnp.clip(xavier_normal(key, shape, dtype), -0.02, 0.02)


@register("BERT4Rec")
class BERT4Rec(SeqRecArch):
    NUM_PADS: int = 2
    PADDING_VALUE: int = 0
    MASKING_VALUE: int = 1

    maxlen: int = 50
    num_heads: int = 4
    num_blocks: int = 2
    embedding_dim: int = 64
    dropout_rate: float = 0.2
    mask_ratio: float = 0.3
    # static masked-position budget: the reference computes CE only at
    # masked positions (BERT4Rec/main.py:154-163); for static shapes we
    # top-k gather at most `masked_budget` masked positions per row
    # before the full-vocab fc. None → ceil(maxlen*mask_ratio*2), which
    # a Binomial(maxlen, ratio) exceeds with ~1e-5 probability — the
    # loss is bit-comparable to the all-position weighted CE while the
    # dominant (B, L, V) matmul shrinks by L/budget. Set >= maxlen to
    # force the all-position path.
    masked_budget: Optional[int] = None

    def setup(self):
        self.item_embeddings = nn.Embed(
            self.Item.count + self.NUM_PADS,
            self.embedding_dim,
            embedding_init=_clamped_xavier,
        )
        self.position_embeddings = nn.Embed(
            self.maxlen, self.embedding_dim, embedding_init=_clamped_xavier
        )
        self.layernorm = nn.LayerNorm(epsilon=1e-5)  # torch nn.LayerNorm default
        self.in_dropout = nn.Dropout(self.dropout_rate)
        self.encoder = [
            TransformerBlock(
                self.embedding_dim,
                self.num_heads,
                self.embedding_dim * 4,
                self.dropout_rate,
            )
            for _ in range(self.num_blocks)
        ]
        self.fc = nn.Dense(
            self.Item.count + self.NUM_PADS, kernel_init=_clamped_xavier
        )

    def sure_trainpipe(self, maxlen: int, batch_size: int):
        return (
            self.dataset.train()
            .shuffled_seqs_source(maxlen)
            .add_(self.NUM_PADS, modified_fields=(self.ISeq,))
            .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def sure_validpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 512):
        return (
            self.dataset.valid()
            .ordered_user_ids_source()
            .valid_sampling_(ranking)
            .lprune_(maxlen - 1, modified_fields=(self.ISeq,))
            .add_(self.NUM_PADS, modified_fields=(self.ISeq,))
            .lpad_(maxlen - 1, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .rpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.MASKING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def sure_testpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 512):
        return (
            self.dataset.test()
            .ordered_user_ids_source()
            .test_sampling_(ranking)
            .lprune_(maxlen - 1, modified_fields=(self.ISeq,))
            .add_(self.NUM_PADS, modified_fields=(self.ISeq,))
            .lpad_(maxlen - 1, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .rpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.MASKING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def encode(self, data_or_seqs, deterministic: bool = True) -> jnp.ndarray:
        seqs = (
            data_or_seqs[self.ISeq]
            if isinstance(data_or_seqs, dict)
            else data_or_seqs
        )
        padding = seqs == self.PADDING_VALUE  # (B, L)
        x = self.item_embeddings(seqs)
        x = x + self.position_embeddings(jnp.arange(seqs.shape[1])[None, :])
        x = self.in_dropout(self.layernorm(x), deterministic=deterministic)
        for block in self.encoder:
            x = block(x, key_padding_mask=padding, deterministic=deterministic)
        return x  # (B, L, D)

    def random_mask(self, seqs: jnp.ndarray, rng) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(masked_seqs, mask) — items → MASK at rate p, pads untouched
        (BERT4Rec/main.py:154-163)."""
        rnds = jax.random.uniform(rng, seqs.shape)
        masked = jnp.where(rnds < self.mask_ratio, self.MASKING_VALUE, seqs)
        masked = jnp.where(seqs == self.PADDING_VALUE, self.PADDING_VALUE, masked)
        return masked, masked == self.MASKING_VALUE

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        seqs = data[self.ISeq]
        masked_seqs, masks = self.random_mask(seqs, self.make_rng("sampling"))
        hidden = self.encode(masked_seqs, deterministic=False)
        L = seqs.shape[1]
        budget = self.masked_budget
        if budget is None:
            budget = int(np.ceil(self.maxlen * self.mask_ratio * 2))
        if budget < L:
            # gather (at most) the masked rows, then project only those
            # through the (D, V) head — the matmul that dominates the
            # step shrinks by L/budget; rows beyond the true masked
            # count carry weight 0, so the value matches the
            # all-position weighted CE exactly (up to ~never-truncation)
            m_int = masks.astype(jnp.int32)
            sel_w, idx = jax.lax.top_k(m_int, budget)  # ties → low index
            sel_hidden = jnp.take_along_axis(hidden, idx[..., None], axis=1)
            sel_labels = jnp.take_along_axis(seqs, idx, axis=1)
            # touch fc once so its params exist at init even though the
            # fused CE consumes them directly (see ops/vocab_ce.py —
            # the (M, V) logits stay in VMEM instead of HBM)
            _ = self.fc(sel_hidden[:1, :1])
            fc_params = self.variables["params"]["fc"]
            from ...ops.vocab_ce import fullvocab_ce_rows

            B = seqs.shape[0]
            loss_rows = fullvocab_ce_rows(
                sel_hidden.reshape(B * budget, -1),
                fc_params["kernel"],
                fc_params["bias"],
                sel_labels.reshape(-1),
            )
            w = sel_w.astype(jnp.float32).reshape(-1)
            rec_loss = jnp.sum(loss_rows * w) / jnp.maximum(jnp.sum(w), 1.0)
        else:
            logits = self.fc(hidden)  # (B, L, N + NUM_PADS)
            rec_loss = criterions.cross_entropy_with_logits(
                logits, seqs, weights=masks.astype(jnp.float32)
            )
        return rec_loss, {"rec_loss": rec_loss}

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        hidden = self.encode(data)  # MASK is the rightmost position
        logits = self.fc(hidden[:, -1, :])
        return logits[:, self.NUM_PADS :]

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        scores = self.recommend_from_full(data)
        return jnp.take_along_axis(scores, data[self.IUnseen], axis=1)
