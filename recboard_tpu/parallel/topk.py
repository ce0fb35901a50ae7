"""Distributed full-catalog top-k.

SURVEY.md §7 hard part #3: the reference ranks with a single-GPU
``einsum("BD,ND->BN")`` + ``topk`` (SASRec/main.py:228,
MF-BPR/main.py:104). With the item axis sharded over the `model` mesh
axis (parallel/tables.py), each shard holds a (B, V/P) score block;
all-gathering full rows to one chip would move B·V floats over ICI.
Instead: local top-k per shard, all-gather only the (B, P·k)
candidates, merge with a second top-k — communication drops from B·V
to B·P·k.

Tie-breaking matches single-chip ``lax.top_k`` (lowest index wins):
shards are concatenated in global index order, and ``top_k`` on the
merged candidates prefers earlier positions among equals.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec

from .tables import MODEL_AXIS, row_sharded_spec

__all__ = ["sharded_top_k", "rank_top_k_row_sharded"]


def sharded_top_k(
    mesh: Mesh,
    scores: jnp.ndarray,
    k: int,
    axis: str = MODEL_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over the sharded item axis of ``scores`` (B, V).

    ``scores`` is sharded PartitionSpec(None, axis) — e.g. the output of
    ``dot_all_items_row_sharded``. Returns replicated (values, indices),
    indices global over the full catalog.
    """
    axis_size = mesh.shape[axis]

    def local(s: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # a shard narrower than k contributes all its columns
        vals, idx = jax.lax.top_k(s, min(k, s.shape[1]))
        shard = jax.lax.axis_index(axis)
        idx = idx + shard * s.shape[1]
        # (B, P·k) candidates, concatenated in shard (= global index) order
        vals_all = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        idx_all = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
        v, pos = jax.lax.top_k(vals_all, k)
        i = jnp.take_along_axis(idx_all, pos, axis=1)
        return v, i

    return shard_map(
        local,
        mesh=mesh,
        in_specs=PartitionSpec(None, axis),
        out_specs=(PartitionSpec(), PartitionSpec()),
        # all_gather makes every shard's merge identical, but the
        # varying-manual-axes analysis can't prove replication
        check_vma=False,
    )(scores)


def rank_top_k_row_sharded(
    mesh: Mesh,
    queries: jnp.ndarray,
    table: jnp.ndarray,
    k: int,
    axis: str = MODEL_AXIS,
    valid_count: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused sharded scoring + distributed top-k: each shard computes
    its (B, V/P) block of ``q @ table.T`` and only (B, P·k) candidates
    cross ICI. The full (B, V) score matrix never exists on any chip.
    ``valid_count`` masks vocab-pad rows (tables padded so V divides the
    axis, pad_vocab) to -inf so they never surface as candidates."""
    per_shard = table.shape[0] // mesh.shape[axis]

    def local(q: jnp.ndarray, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        s = jnp.einsum("bd,vd->bv", q, t, preferred_element_type=jnp.float32)
        if valid_count is not None and valid_count < table.shape[0]:
            shard = jax.lax.axis_index(axis)
            cols = shard * per_shard + jnp.arange(per_shard)[None, :]
            s = jnp.where(cols < valid_count, s, -jnp.inf)
        vals, idx = jax.lax.top_k(s, min(k, per_shard))
        shard = jax.lax.axis_index(axis)
        idx = idx + shard * per_shard
        vals_all = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        idx_all = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
        v, pos = jax.lax.top_k(vals_all, k)
        i = jnp.take_along_axis(idx_all, pos, axis=1)
        return v, i

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(PartitionSpec(), row_sharded_spec(axis)),
        out_specs=(PartitionSpec(), PartitionSpec()),
        check_vma=False,
    )(queries, table)
