"""HBM-scale embedding tables: sparse-gradient training + streaming
full-catalog ranking.

The reference trains ``nn.Embedding`` catalogs with dense Adam
(MF-BPR/main.py:36-42 and every other model): moments for EVERY row
live in memory and the optimizer touches all V rows each step. At its
12k-item catalogs that is free; at production recommender scales
(10^7-10^9 rows — the BASELINE.json north star: "tables exceeding
single-chip HBM") dense Adam costs 3x the table in HBM plus an O(V·D)
dense gradient materialization per step when the batch only touches
O(B·(L+K)) rows.

TPU-native design (this module):

* **Autodiff boundary at the gather.** The lookup happens OUTSIDE the
  differentiated function: gather the batch's rows, differentiate the
  loss w.r.t. those (M, D) rows only, and never ask JAX for a (V, D)
  gradient. The transpose-of-gather scatter that dense autodiff would
  emit is replaced by an explicit O(M) scatter-add update.
* **Row-wise AdaGrad state** (the DLRM/production-recsys optimizer):
  one scalar accumulator per row — state is 1 + 1/D times the table,
  vs Adam's 3x. Sparse Adam would need two (V, D) moments and decays
  on untouched rows; row-wise AdaGrad is exactly as sparse as the
  batch.
* **Streaming top-k serving** (``blocked_top_k``): a (B, V) score
  matrix at V = 20M is 82 GB — it can never exist. Score the catalog
  in (B, C) blocks under ``lax.scan`` against a running (B, k) best,
  so serving memory is O(B·(C + k)) regardless of V while the MXU
  still sees large matmuls.
* **Sharding**: the table/accumulator shard over the ``model`` axis
  with plain PartitionSpec annotations; gather, scatter-add and the
  blocked scorer are GSPMD-partitionable as written (XLA keeps the
  scatter local to the owning shard). tests/test_big_table.py asserts
  the (V, D) table is never all-gathered.

Duplicate-id semantics of ``apply_row_grads``: gradients for the same
row are summed (segment-sum before the scatter), the accumulator sees
the summed row's squared gradient once, and the update uses the
post-accumulation scale — deterministic, batch-order independent.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "RowwiseAdagradTable",
    "init_rowwise_adagrad",
    "apply_row_grads",
    "blocked_top_k",
]


class RowwiseAdagradTable(NamedTuple):
    """Embedding table + per-row AdaGrad accumulator."""

    table: jnp.ndarray  # (V, D)
    acc: jnp.ndarray  # (V,)


def init_rowwise_adagrad(
    key: jax.Array,
    vocab: int,
    dim: int,
    scale: float = 0.1,
    dtype=jnp.float32,
    acc_init: float = 0.0,
) -> RowwiseAdagradTable:
    table = jax.random.normal(key, (vocab, dim), dtype) * jnp.asarray(
        scale, dtype
    )
    return RowwiseAdagradTable(
        table=table, acc=jnp.full((vocab,), acc_init, jnp.float32)
    )


def apply_row_grads(
    state: RowwiseAdagradTable,
    ids: jnp.ndarray,  # (M,) int — rows touched this step (dups allowed)
    grads: jnp.ndarray,  # (M, D) — d loss / d gathered rows
    lr: float,
    eps: float = 1e-10,
) -> RowwiseAdagradTable:
    """Row-wise AdaGrad scatter update; O(M·D), never O(V·D).

    acc[i]   += mean_d( (sum_dups g)[i, d]^2 )
    row[i]   -= lr * (sum_dups g)[i] / sqrt(acc_new[i] + eps)
    """
    ids = ids.reshape(-1)
    grads = grads.reshape(ids.shape[0], -1)
    # sum duplicate ids first: scatter-add into a zero (M, D) workspace
    # keyed by the first occurrence would need a unique pass; instead
    # scatter into the table-shaped space ONCE via the accumulator
    # trick below. Summing through .at[].add on the small (M, D) side:
    # sort-free segment sum over the batch's own index space.
    #
    # g_sum[i] for each distinct id i = sum of grads rows with that id.
    # We apply it with two O(M) scatters + two O(M) gathers:
    #   1. acc_new = acc.at[ids].add(rowsq of per-occurrence grads)
    #      — WRONG for dups (squares sum instead of sum squaring), so:
    #   1. g_sum scatter: tmp (V, D) would be O(V·D). Avoid: gather the
    #      post-scatter sums back. Two passes:
    #        s1: sums = zeros(M, D) after segment-sum over sorted ids.
    # Sorting M ~ 10^5 ids is cheap and keeps everything O(M).
    order = jnp.argsort(ids)
    sids = ids[order]
    sg = grads[order]
    # segment boundaries: position where a new id starts
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sids[1:] != sids[:-1]]
    )
    seg = jnp.cumsum(first) - 1  # (M,) segment index per occurrence
    num_seg = ids.shape[0]  # upper bound; tail segments stay zero
    g_sum = jax.ops.segment_sum(sg, seg, num_segments=num_seg)  # (M, D)
    seg_ids = jax.ops.segment_max(sids, seg, num_segments=num_seg)
    valid = jnp.arange(num_seg) < seg[-1] + 1
    seg_ids = jnp.where(valid, seg_ids, state.table.shape[0] - 1)
    g_sum = jnp.where(valid[:, None], g_sum, 0.0)

    rowsq = jnp.mean(g_sum.astype(jnp.float32) ** 2, axis=-1)  # (M,)
    acc = state.acc.at[seg_ids].add(rowsq)
    scale = jax.lax.rsqrt(acc[seg_ids] + eps)  # post-accumulation read
    upd = (-lr * g_sum * scale[:, None]).astype(state.table.dtype)
    table = state.table.at[seg_ids].add(upd)
    return RowwiseAdagradTable(table=table, acc=acc)


def blocked_top_k(
    queries: jnp.ndarray,  # (B, D)
    table: jnp.ndarray,  # (V, D)
    k: int,
    block_size: int = 1_048_576,
    approx: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-catalog top-k without materializing (B, V) scores.

    Scans the catalog in (block_size, D) slabs; each step scores one
    slab ((B, C) matmul on the MXU) and merges into the running (B, k)
    best. Tie-breaking matches single-shot ``lax.top_k`` (lowest global
    index wins): the running buffer is ordered before the candidate
    block and ``top_k`` prefers earlier positions among equals.

    ``approx=True`` reduces each slab with ``jax.lax.approx_max_k``
    (the TPU's hardware-friendly MIPS primitive, default recall target
    0.95 per slab) before the exact candidate merge — measured 20x
    serving speedup at V=20M where the exact per-slab ``top_k`` merge,
    not the scoring matmul, dominates (tools/big_table_bench.py).

    Returns (values (B, k), indices (B, k)) — indices global over V.
    """
    V, D = table.shape
    B = queries.shape[0]
    C = min(block_size, V)
    num_blocks = -(-V // C)
    pad = num_blocks * C - V
    if pad:
        # pad with -inf rows so they never win
        table = jnp.concatenate(
            [table, jnp.zeros((pad, D), table.dtype)], axis=0
        )
    blocks = table.reshape(num_blocks, C, D)

    init_vals = jnp.full((B, k), -jnp.inf, jnp.float32)
    init_idx = jnp.zeros((B, k), jnp.int32)

    def body(carry, inp):
        vals, idx = carry
        blk, b = inp
        s = jnp.einsum(
            "bd,cd->bc", queries, blk, preferred_element_type=jnp.float32
        )
        gidx = b * C + jnp.arange(C, dtype=jnp.int32)[None, :]
        if pad:
            s = jnp.where(gidx < V, s, -jnp.inf)
        if approx:
            # slab-level candidate reduction on the TPU sort unit;
            # the k-candidate merge below stays exact
            s, local = jax.lax.approx_max_k(s, k)
            gcand = jnp.take_along_axis(
                jnp.broadcast_to(gidx, (B, C)), local, axis=1
            )
            cat_v = jnp.concatenate([vals, s], axis=1)
            cat_i = jnp.concatenate([idx, gcand], axis=1)
        else:
            cat_v = jnp.concatenate([vals, s], axis=1)
            cat_i = jnp.concatenate(
                [idx, jnp.broadcast_to(gidx, (B, C))], axis=1
            )
        v, pos = jax.lax.top_k(cat_v, k)
        i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (v, i), None

    (vals, idx), _ = jax.lax.scan(
        body,
        (init_vals, init_idx),
        (blocks, jnp.arange(num_blocks, dtype=jnp.int32)),
    )
    return vals, idx
