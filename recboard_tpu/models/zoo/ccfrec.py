"""CCFRec: semantic-ID multi-codebook embeddings + QFormer fusion.

Reference: CCFRec/main.py:62-460 + CCFRec/modules.py:139-220 —
SemIDEmbedding flattens per-level codes into one token space with
PAD=0/MASK=1 offsets (main.py:62-88); QFormer blocks = self-attn over
the K sem-id query tokens + cross-attn to PCA-reduced text-feature
tokens + FFN (post-LN, gelu); item embedding = mean(qformer_out +
query); user encoder = causal transformer over pooled item embds;
losses: sampled CE (rec) + masked-SID prediction over the codeword
vocabulary + clean↔masked user InfoNCE, combined with weight4mlm /
weight4cl (main.py:330-455).

Offline prep (CCFRec/generate_semantic_ids.py uses faiss+PCA): here
sem/kmeans.py's residual k-means + a numpy PCA produce codes/features.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import criterions
from ..base import Batch, SeqRecArch
from . import register

_init02 = nn.initializers.normal(stddev=0.02)


def pca_reduce(x: np.ndarray, dim: int, whiten: bool = True) -> np.ndarray:
    """Plain numpy PCA (stand-in for sklearn PCA at prep time)."""
    x = np.asarray(x, np.float64)
    mean = x.mean(axis=0)
    xc = x - mean
    cov = xc.T @ xc / max(len(x) - 1, 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:dim]
    comps = v[:, order]
    out = xc @ comps
    if whiten:
        out = out / np.sqrt(np.maximum(w[order], 1e-12))
    return out.astype(np.float32)


class _PostLNAttn(nn.Module):
    dim: int
    num_heads: int
    hidden_dropout: float
    attn_dropout: float

    @nn.compact
    def __call__(self, q_in, kv_in, mask=None, deterministic=True):
        H, hd = self.num_heads, self.dim // self.num_heads
        q = nn.Dense(self.dim, kernel_init=_init02, name="query")(q_in)
        k = nn.Dense(self.dim, kernel_init=_init02, name="key")(kv_in)
        v = nn.Dense(self.dim, kernel_init=_init02, name="value")(kv_in)
        B, Lq, _ = q.shape
        Lk = k.shape[1]
        qh = q.reshape(B, Lq, H, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(B, Lk, H, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, Lk, H, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / (hd**0.5)
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.attn_dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Lq, self.dim)
        out = nn.Dense(self.dim, kernel_init=_init02, name="dense")(ctx)
        out = nn.Dropout(self.hidden_dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-12)(out + q_in)


class _FFN(nn.Module):
    dim: int
    inner: int
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.inner, kernel_init=_init02)(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, kernel_init=_init02)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-12)(h + x)


class QFormerBlock(nn.Module):
    dim: int
    num_heads: int
    inner: int
    dropout: float

    @nn.compact
    def __call__(self, query, context, deterministic=True):
        query = _PostLNAttn(self.dim, self.num_heads, self.dropout, self.dropout,
                            name="self_attn")(query, query, None, deterministic)
        query = _PostLNAttn(self.dim, self.num_heads, self.dropout, self.dropout,
                            name="cross_attn")(query, context, None, deterministic)
        return _FFN(self.dim, self.inner, self.dropout)(query, deterministic)


class EncoderBlock(nn.Module):
    dim: int
    num_heads: int
    inner: int
    dropout: float

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        x = _PostLNAttn(self.dim, self.num_heads, self.dropout, self.dropout)(
            x, x, mask, deterministic
        )
        return _FFN(self.dim, self.inner, self.dropout)(x, deterministic)


@register("CCFRec")
class CCFRec(SeqRecArch):
    NUM_PADS: int = 2
    PADDING_VALUE: int = 0
    MASKING_VALUE: int = 1

    sem_codes: Optional[np.ndarray] = None  # (N_items, K) raw level codes
    text_features: Optional[np.ndarray] = None  # (N_items, C, D) PCA'd per field
    maxlen: int = 50
    embedding_dim: int = 64
    hidden_size: int = 256
    num_heads: int = 1
    num_qformer_blocks: int = 2
    num_encoder_blocks: int = 2
    qformer_dropout_rate: float = 0.3
    encoder_dropout_rate: float = 0.5
    num_negs: int = 49
    tau: float = 0.07
    mask_ratio: float = 0.5
    weight4mlm: float = 0.1
    weight4cl: float = 0.1

    def setup(self):
        codes = np.asarray(self.sem_codes, np.int64)
        offsets = codes.max(axis=0) + 1
        shifted = codes.copy()
        shifted[:, 1:] += np.cumsum(offsets)[:-1]
        shifted = shifted + 2  # PAD=0, MASK=1
        vocab = int(offsets.sum()) + 2
        sem_ids = np.concatenate(
            [np.zeros((1, codes.shape[1]), np.int64),  # PAD item
             np.ones((1, codes.shape[1]), np.int64),  # MASK item
             shifted],
            axis=0,
        )
        self._sem_ids = jnp.asarray(sem_ids)  # (N+2, K)
        self._sem_vocab = vocab
        self.sem_embeddings = nn.Embed(vocab, self.embedding_dim, embedding_init=_init02)

        feats = np.asarray(self.text_features, np.float32)  # (N, C, D)
        feats = np.concatenate(
            [np.zeros((2, *feats.shape[1:]), np.float32), feats], axis=0
        )
        self._features = jnp.asarray(feats)

        self.qformer = [
            QFormerBlock(self.embedding_dim, self.num_heads, self.hidden_size,
                         self.qformer_dropout_rate, name=f"qformer_{i}")
            for i in range(self.num_qformer_blocks)
        ]
        self.encoder = [
            EncoderBlock(self.embedding_dim, self.num_heads, self.hidden_size,
                         self.encoder_dropout_rate, name=f"encoder_{i}")
            for i in range(self.num_encoder_blocks)
        ]
        self.position_embeddings = nn.Embed(
            self.maxlen, self.embedding_dim, embedding_init=_init02
        )
        self.input_ln = nn.LayerNorm(epsilon=1e-12)
        self.input_dropout = nn.Dropout(self.encoder_dropout_rate)

    def sure_trainpipe(self, maxlen: int, batch_size: int):
        return (
            self.dataset.train()
            .shuffled_roll_seqs_source(maxlen=maxlen, keep_at_least_itself=True)
            .seq_train_yielding_pos_(start_idx_for_target=-1, end_idx_for_input=-1)
            .seq_train_sampling_neg_(num_negatives=self.num_negs)
            .add_(offset=self.NUM_PADS, modified_fields=(self.ISeq, self.IPos, self.INeg))
            .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def encode_item(self, items: jnp.ndarray, sem_ids=None, deterministic=True):
        """items: any shape of (offset) item tokens → pooled (.., D) and
        unpooled (.., K, D)."""
        shape = items.shape
        flat = items.reshape(-1)
        if sem_ids is None:
            sids = self._sem_ids[flat]  # (M, K)
        else:
            sids = sem_ids.reshape(-1, self._sem_ids.shape[1])
        query = self.sem_embeddings(sids)  # (M, K, D)
        context = self._features[flat]  # (M, C, D)
        x = query
        for block in self.qformer:
            x = block(x, context, deterministic)
        pooled = (x + query).mean(axis=1)
        return (
            x.reshape(*shape, *x.shape[1:]),
            pooled.reshape(*shape, -1),
        )

    def encode_user(self, seqs, seq_embds, deterministic=True):
        L = seqs.shape[1]
        valid = (seqs != self.PADDING_VALUE)[:, None, None, :]
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        mask = jnp.where(valid & causal, 0.0, -1e4)
        x = seq_embds + self.position_embeddings(jnp.arange(L)[None])
        x = self.input_ln(x)
        x = self.input_dropout(x, deterministic=deterministic)
        for block in self.encoder:
            x = block(x, mask, deterministic)
        q = x[:, -1, :]
        return q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        seqs = data[self.ISeq]
        _, pooled = self.encode_item(seqs, deterministic=False)
        user = self.encode_user(seqs, pooled, deterministic=False)

        negatives = data[self.INeg]
        if negatives.ndim == 3:  # (B, 1, K) per-position negs → (B, K)
            negatives = negatives[:, 0, :]
        cands = jnp.concatenate([data[self.IPos], negatives], axis=-1)
        _, cand_pooled = self.encode_item(cands, deterministic=False)
        cand_pooled = cand_pooled * jax.lax.rsqrt(
            jnp.sum(cand_pooled * cand_pooled, axis=-1, keepdims=True) + 1e-12
        )
        logits = jnp.einsum("bd,bkd->bk", user, cand_pooled) / self.tau
        rec_loss = criterions.cross_entropy_with_logits(
            logits, jnp.zeros(logits.shape[0], jnp.int32)
        )

        # masked-SID prediction
        rng = self.make_rng("sampling")
        sids = self._sem_ids[seqs]  # (B, S, K)
        pad = sids == self.PADDING_VALUE
        rnds = jax.random.uniform(jax.random.fold_in(rng, 0), sids.shape)
        replace = jax.random.randint(
            jax.random.fold_in(rng, 1), sids.shape, 0, self._sem_vocab
        )
        masked = jnp.where(rnds < self.mask_ratio * 0.9, replace, sids)
        masked = jnp.where(rnds < self.mask_ratio * 0.8, self.MASKING_VALUE, masked)
        masked = jnp.where(pad, self.PADDING_VALUE, masked)
        mask_flags = (masked != sids).astype(jnp.float32)

        m_unpooled, m_pooled = self.encode_item(
            seqs, sem_ids=masked, deterministic=False
        )
        m_user = self.encode_user(seqs, m_pooled, deterministic=False)

        un = m_unpooled * jax.lax.rsqrt(
            jnp.sum(m_unpooled * m_unpooled, axis=-1, keepdims=True) + 1e-12
        )
        sem_table = self.sem_embeddings.embedding
        sem_table = sem_table * jax.lax.rsqrt(
            jnp.sum(sem_table * sem_table, axis=-1, keepdims=True) + 1e-12
        )
        mlm_logits = jnp.einsum("bskd,vd->bskv", un, sem_table) / self.tau
        mlm_loss = criterions.cross_entropy_with_logits(
            mlm_logits, sids, weights=mask_flags
        )

        cl_logits = jnp.einsum("md,nd->mn", user, m_user) / self.tau
        labels = jnp.arange(cl_logits.shape[0], dtype=jnp.int32)
        cl_loss = (
            criterions.cross_entropy_with_logits(cl_logits, labels)
            + criterions.cross_entropy_with_logits(cl_logits.T, labels)
        ) / 2

        loss = rec_loss + self.weight4mlm * mlm_loss + self.weight4cl * cl_loss
        return loss, {
            "rec_loss": rec_loss,
            "mlm_loss": mlm_loss,
            "cl_loss": cl_loss,
        }

    def reset_ranking_buffers(self) -> Any:
        items = jnp.arange(self.Item.count + self.NUM_PADS)
        _, pooled = self.encode_item(items)
        return pooled  # (N+2, D)

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        pooled = buffers if buffers is not None else self.reset_ranking_buffers()
        seqs = data[self.ISeq]
        user = self.encode_user(seqs, pooled[seqs])
        items = pooled[self.NUM_PADS :]
        return jnp.einsum(
            "bd,nd->bn", user, items, preferred_element_type=jnp.float32
        )

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        pooled = buffers if buffers is not None else self.reset_ranking_buffers()
        seqs = data[self.ISeq]
        user = self.encode_user(seqs, pooled[seqs])
        items = pooled[self.NUM_PADS :]
        return jnp.einsum("bd,bkd->bk", user, items[data[self.IUnseen]])
