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

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

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
