"""HSTU: pointwise SiLU attention with relative bucketed time+position
bias, sampled-softmax CE with on-device uniform negatives.

Reference: HSTU/main.py:45-236 + HSTU/modules.py:19-206 +
HSTU/sampler.py (time-aware pipes). Key semantics replicated exactly:

* input: item embds * sqrt(D) + learnable positions, pads zeroed once
  (the reference's per-block re-zeroing at HSTU/main.py:178 is a no-op
  `masked_fill` without underscore — we match the executed behavior);
* block: LN → fused uvqk linear (no bias) → SiLU → pointwise attention
  silu(qk + bias)/L gated by the causal mask (no softmax) → LN(·)·u →
  out linear + residual (HSTU/modules.py:166-206);
* bias[m,n] = pos_w[n-m+L-1] + ts_w[bucket(ext[m+1]-ext[n])] with
  bucket(x) = floor(ln(max(|x|,1))/0.301), ext = ts ++ ts[-1]
  (HSTU/modules.py:59-129);
* loss: L2-normalized user/item embds; per valid position CE over
  [positive; num_negs uniform negatives]/temperature; negatives drawn
  uniformly from the catalog *on device* (HSTU/main.py:157-201).

Baseline (Beauty, InfoNCE): HR@10 0.0945±0.0012, NDCG@10 0.0543±0.0006.

TPU notes: negatives come from jax.random inside the jitted step —
zero host involvement; the (B,H,L,L)·(B,L,H,Dv) contraction maps to
the MXU and XLA fuses the silu/bias/causal elementwise chain into it.
The time-bucket bias uses a one-hot contraction instead of a gather
(15× faster fwd+bwd at B=1024 — see RelativeBucketedTimeAndPositionBias).
``negs_mode`` picks the negative-sampling granularity: per_position
(reference parity, gather-bound — 381 ms/step at the Beauty config),
per_row (one set per sequence: 11.3 ms/step, 34× faster at measured
quality PARITY — the recommended TPU mode), shared (one set per step:
5.0 ms/step at a measured −3.4% NDCG pool-dilution cost). Numbers and
the 5-seed A/B: docs/PERF.md.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import criterions
from ...data.tags import SEQUENCE, TIMESTAMP
from ..base import Batch, SeqRecArch
from . import register


def _trunc_normal(std: float):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


def _l2norm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize with an everywhere-differentiable rsqrt (a plain
    norm has a NaN gradient at 0)."""
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def max_reachable_bucket(max_abs_timestamp: float) -> int:
    """Largest time-bucket id any |diff| ≤ max_abs_timestamp can map to.

    bucket(d) = floor(ln(max(|d|, 1)) / 0.301) is monotone in |d|, and
    every |diff| in a batch is bounded by the dataset's max |timestamp|
    (pads are 0), so buckets above this are *unreachable*: the one-hot
    bias contraction — VPU-compare bound, ~2 ms of HSTU's 6.6 ms step —
    only needs this many lanes. The reference (torch gather,
    HSTU/modules.py:93-100) is insensitive to table width so this is
    free parity: unreachable buckets get zero gradient either way.

    Mirrors the on-device f32 arithmetic and keeps one guard bucket for
    ulp-level log differences between host numpy and the XLA TPU log
    approximation (a whole bucket spans a 1.35× range of |diff| — vastly
    more than any log ulp)."""
    x = np.float32(max(max_abs_timestamp, 1.0))
    return int(np.floor(np.log(x) / np.float32(0.301))) + 1


class RelativeBucketedTimeAndPositionBias(nn.Module):
    """(B, L) timestamps → (B, L, L) additive bias
    (HSTU/modules.py:59-129).

    ``active_buckets`` (≤ num_buckets + 1) — number of bucket ids that
    can occur given the dataset's timestamp range (see
    max_reachable_bucket); the one-hot select-sum runs that wide while
    the parameter keeps its full reference shape."""

    maxlen: int
    num_buckets: int
    active_buckets: int = 0  # 0 → num_buckets + 1 (no shrink)

    @nn.compact
    def __call__(self, timestamps: jnp.ndarray) -> jnp.ndarray:
        L = self.maxlen
        K = self.active_buckets or (self.num_buckets + 1)
        ts_w = self.param(
            "timestamp_weights", _trunc_normal(0.02), (self.num_buckets + 1,)
        )
        pos_w = self.param("position_weights", _trunc_normal(0.02), (2 * L - 1,))

        # positional toeplitz: bias[m, n] = pos_w[n - m + L - 1]
        m = jnp.arange(L)[:, None]
        n = jnp.arange(L)[None, :]
        rel_pos_bias = pos_w[n - m + L - 1][None]  # (1, L, L)

        ext = jnp.concatenate([timestamps, timestamps[:, L - 1 : L]], axis=1)
        diff = ext[:, 1:, None] - ext[:, None, :-1]  # (B, L, L)
        bucket = jnp.floor(
            jnp.log(jnp.maximum(jnp.abs(diff).astype(jnp.float32), 1.0)) / 0.301
        ).astype(jnp.int32)
        bucket = jnp.clip(bucket, 0, K - 1)
        # one-hot contraction instead of ts_w[bucket]: a (B·L·L)-element
        # random gather (and its scatter-add backward) is ~15× slower on
        # TPU than the 101-wide VPU select-sum; measured 45→3 ms/block
        # fwd+bwd at B=1024, L=50 on v5e.
        one_hot = jax.nn.one_hot(bucket, K, dtype=ts_w.dtype)
        rel_ts_bias = one_hot @ ts_w[:K]
        return rel_pos_bias + rel_ts_bias


class StackedRelBias(nn.Module):
    """All num_blocks relative time+position biases from ONE one-hot
    contraction → (num_blocks, B, L, L).

    Identical math and init to per-block
    RelativeBucketedTimeAndPositionBias (HSTU/modules.py:59-129), but
    the (B·L·L, num_buckets+1) one-hot — ~1 GB of VPU traffic at
    B=1024, L=50 — is materialized once and contracted against the
    stacked (num_buckets+1, num_blocks) weights, instead of once per
    block. Measured on a v5e: the 16-block default config's step went
    77.7 → 16 ms/step after hoisting (bias traffic was 16 GB/step).
    The contraction lives in ops/rel_bias.py (XLA fwd+bwd; a Pallas
    backward was measured and lost — see that module's docstring)."""

    maxlen: int
    num_buckets: int
    num_blocks: int
    active_buckets: int = 0  # 0 → num_buckets + 1 (no shrink)

    @nn.compact
    def __call__(self, timestamps: jnp.ndarray) -> jnp.ndarray:
        from ...ops.rel_bias import stacked_rel_bias

        K = self.active_buckets or (self.num_buckets + 1)
        ts_w = self.param(
            "timestamp_weights",
            _trunc_normal(0.02),
            (self.num_blocks, self.num_buckets + 1),
        )
        pos_w = self.param(
            "position_weights", _trunc_normal(0.02), (self.num_blocks, 2 * self.maxlen - 1)
        )
        return stacked_rel_bias(timestamps, ts_w, pos_w, K)


class HSTUBlock(nn.Module):
    embedding_dim: int
    linear_hidden_dim: int
    attention_dim: int
    num_heads: int
    maxlen: int
    num_buckets: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, L, D)
        bias: jnp.ndarray,  # (B, L, L) — this block's slice of StackedRelBias
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, L, _ = x.shape
        H, Da, Dv = self.num_heads, self.attention_dim, self.linear_hidden_dim
        z = nn.LayerNorm(epsilon=1e-6)(x)
        z = nn.silu(
            nn.Dense(
                2 * Dv * H + 2 * Da * H,
                use_bias=False,
                kernel_init=nn.initializers.xavier_uniform(),
                name="uvqk_linear",
            )(z)
        )
        u, v, q, k = jnp.split(z, [Dv * H, 2 * Dv * H, 2 * Dv * H + Da * H], axis=-1)
        q = q.reshape(B, L, H, Da)
        k = k.reshape(B, L, H, Da)
        v = v.reshape(B, L, H, Dv)

        qk = jnp.einsum("bmhd,bnhd->bhmn", q, k, preferred_element_type=jnp.float32)
        attn = nn.silu(qk + bias[:, None]) / L
        causal = jnp.tril(jnp.ones((L, L), dtype=attn.dtype))  # allowed entries
        attn = attn * causal[None, None]

        z = jnp.einsum("bhmn,bnhd->bmhd", attn, v).reshape(B, L, H * Dv)
        z = nn.LayerNorm(epsilon=1e-6, name="attn_ln")(z) * u
        z = nn.Dropout(self.dropout_rate)(z, deterministic=deterministic)
        out = nn.Dense(
            self.embedding_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            name="output_linear",
        )(z)
        return out + x


@register("HSTU")
class HSTU(SeqRecArch):
    maxlen: int = 50
    num_heads: int = 8
    num_blocks: int = 16
    embedding_dim: int = 64
    linear_hidden_dim: int = 8
    attention_dim: int = 8
    emb_dropout_rate: float = 0.0
    hidden_dropout_rate: float = 0.0
    num_negs: int = 512
    num_buckets: int = 100
    temperature: float = 0.05
    shared_negs: bool = False
    # negative-sampling mode: "" derives from shared_negs (back-compat);
    # "per_position" = reference parity (HSTU/main.py:157-162, B·L·K-row
    # gather), "per_row" = one set per sequence ((B, K)-row gather +
    # batched MXU scoring — near-per-position quality at near-shared
    # speed, see docs/PERF.md), "shared" = one set per step.
    negs_mode: str = ""
    # rematerialize blocks in backward: recompute each block's (B, H, L, L)
    # qk/attn intermediates instead of saving+reloading them from HBM.
    # Numerically identical (pinned by tests/test_models_smoke3.py) and
    # measured 16% faster on the v5e Beauty config (6.09 → 5.12 ms/step,
    # tools/hstu_ablate.py), so it defaults ON.
    remat: bool = True

    @property
    def Time(self):
        return self.fields[TIMESTAMP].fork(SEQUENCE)

    def setup(self):
        self.item_embeddings = nn.Embed(
            self.Item.count + self.NUM_PADS,
            self.embedding_dim,
            embedding_init=_trunc_normal(0.02),
        )
        self.pos_embeddings = nn.Embed(
            self.maxlen,
            self.embedding_dim,
            embedding_init=_trunc_normal((1.0 / self.embedding_dim) ** 0.5),
        )
        self.emb_dropout = nn.Dropout(self.emb_dropout_rate)
        # deterministic (arg 3 counting the module) must stay static
        Block = (
            nn.remat(HSTUBlock, static_argnums=(3,)) if self.remat else HSTUBlock
        )
        self.blocks = [
            Block(
                self.embedding_dim,
                self.linear_hidden_dim,
                self.attention_dim,
                self.num_heads,
                self.maxlen,
                self.num_buckets,
                self.hidden_dropout_rate,
                name=f"hstu_{i}",
            )
            for i in range(self.num_blocks)
        ]
        # static dataset statistic → reachable-bucket count: shrinks the
        # one-hot bias contraction (the VPU-compare-bound ~2 ms of the
        # step) to the lanes that can ever select; exact parity since
        # unreachable buckets contribute nothing fwd and get zero grads.
        ts_field = self.fields[TIMESTAMP]
        max_abs_ts = (
            self.dataset.column_abs_max(ts_field) if ts_field is not None else 0.0
        )
        active = (
            min(self.num_buckets, max_reachable_bucket(max_abs_ts)) + 1
            if max_abs_ts > 0
            else 0
        )
        self.rel_bias = StackedRelBias(
            self.maxlen, self.num_buckets, self.num_blocks, active_buckets=active
        )

    def sure_trainpipe(self, maxlen: int, batch_size: int):
        return (
            self.dataset.train()
            .shuffled_time_seqs_source(maxlen=maxlen)
            .time_seq_train_yielding_pos_(start_idx_for_target=1, end_idx_for_input=-1)
            .add_(offset=self.NUM_PADS, modified_fields=(self.ISeq,))
            .lpad_(
                maxlen,
                modified_fields=(self.ISeq, self.Time, self.IPos),
                padding_value=self.PADDING_VALUE,
            )
            .batch_(batch_size)
            .tensor_()
        )

    def sure_validpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 512):
        return (
            self.dataset.valid()
            .ordered_user_ids_source()
            .time_valid_sampling_(ranking)
            .lprune_(maxlen, modified_fields=(self.ISeq, self.Time))
            .add_(offset=self.NUM_PADS, modified_fields=(self.ISeq,))
            .lpad_(
                maxlen,
                modified_fields=(self.ISeq, self.Time),
                padding_value=self.PADDING_VALUE,
            )
            .batch_(batch_size)
            .tensor_()
        )

    def sure_testpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 512):
        return (
            self.dataset.test()
            .ordered_user_ids_source()
            .time_test_sampling_(ranking)
            .lprune_(maxlen, modified_fields=(self.ISeq, self.Time))
            .add_(offset=self.NUM_PADS, modified_fields=(self.ISeq,))
            .lpad_(
                maxlen,
                modified_fields=(self.ISeq, self.Time),
                padding_value=self.PADDING_VALUE,
            )
            .batch_(batch_size)
            .tensor_()
        )

    def _forward(self, x, seqs, timestamps, deterministic: bool):
        """HSTU tower over already-gathered item embeddings."""
        padding_mask = (seqs == self.PADDING_VALUE)[..., None]
        x = x * (self.embedding_dim**0.5)
        x = x + self.pos_embeddings(jnp.arange(seqs.shape[1])[None, :])
        x = self.emb_dropout(x, deterministic=deterministic)
        x = jnp.where(padding_mask, 0.0, x)
        biases = self.rel_bias(timestamps)  # (num_blocks, B, L, L), ONCE
        for i, block in enumerate(self.blocks):
            # deterministic positional: under nn.remat it is static arg 3
            # (keyword passing shifts flax's argnum bookkeeping)
            x = block(x, biases[i], deterministic)
        return _l2norm(x)

    def encode(self, data: Batch, deterministic: bool = True):
        seqs = data[self.ISeq]
        user_embds = self._forward(
            self.item_embeddings(seqs), seqs, data[self.Time], deterministic
        )
        item_embds = _l2norm(self.item_embeddings.embedding[self.NUM_PADS :])
        return user_embds, item_embds

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        from ...ops import losses as loss_ops

        seqs = data[self.ISeq]
        B, L = seqs.shape
        weights = (seqs != self.PADDING_VALUE).astype(jnp.float32)
        mode = self.negs_mode or ("shared" if self.shared_negs else "per_position")
        if mode == "per_row":
            # one negative set per SEQUENCE: a (B, K)-row gather +
            # batched (L, D) @ (D, K) MXU scoring — K-fold fewer gathered
            # rows than per-position while each sequence keeps its own
            # pool (ops/losses.sampled_softmax_loss_per_row).
            user_embds, item_embds = self.encode(data, deterministic=False)
            neg_ids = jax.random.randint(
                self.make_rng("sampling"), (B, self.num_negs), 0, self.Item.count
            )
            rec_loss = loss_ops.sampled_softmax_loss_per_row(
                user_embds,
                data[self.IPos],
                neg_ids,
                item_embds,
                weights,
                temperature=self.temperature,
            )
            return rec_loss, {"rec_loss": rec_loss}
        if mode == "shared":
            # TPU-first path: one shared negative set per step → a single
            # K-row gather + an MXU matmul instead of a (B·L·K)-row
            # random gather (ops/losses.py sampled_softmax_loss_shared).
            # NOTE: folding the positive gather into the sequence gather
            # (zoo/sasrec.py fit) was tried and is ~8% SLOWER here
            # (5.9 → 6.36 ms on the v5e Beauty config): positives must be
            # l2-normalized, and re-normalizing (B·L, D) gathered rows
            # fwd+bwd costs more than the one 12k-row-table normalization
            # plus the gather/scatter it saves.
            user_embds, item_embds = self.encode(data, deterministic=False)
            neg_ids = jax.random.randint(
                self.make_rng("sampling"), (self.num_negs,), 0, self.Item.count
            )
            rec_loss = loss_ops.sampled_softmax_loss_shared(
                user_embds.reshape(B * L, -1),
                data[self.IPos].reshape(-1),
                neg_ids,
                item_embds,
                weights.reshape(-1),
                temperature=self.temperature,
            )
            return rec_loss, {"rec_loss": rec_loss}
        user_embds, item_embds = self.encode(data, deterministic=False)
        # on-device uniform negatives per position (HSTU/main.py:157-162)
        negatives = jax.random.randint(
            self.make_rng("sampling"), (B, L, self.num_negs), 0, self.Item.count
        )
        candidates = jnp.concatenate(
            [data[self.IPos][..., None], negatives], axis=-1
        )  # (B, L, 1+K)
        # chunk-fused sampled softmax: never materializes the
        # (B, L, 1+K, D) candidate gather (ops/losses.py)
        rec_loss = loss_ops.sampled_softmax_loss(
            user_embds.reshape(B * L, -1),
            candidates.reshape(B * L, -1),
            item_embds,
            weights.reshape(-1),
            temperature=self.temperature,
        )
        return rec_loss, {"rec_loss": rec_loss}

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        user_embds, item_embds = self.encode(data)
        q = user_embds[:, -1, :]
        return jnp.einsum(
            "bd,nd->bn", q, item_embds, preferred_element_type=jnp.float32
        )

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        user_embds, item_embds = self.encode(data)
        q = user_embds[:, -1, :]
        return jnp.einsum("bd,bkd->bk", q, item_embds[data[self.IUnseen]])
