"""Sharded embedding tables.

The reference never shards a table (single-GPU `nn.Embedding`,
MF-BPR/main.py:36-42); this is the new-design component called out in
SURVEY.md §2.1: vocabulary rows sharded over the `model` mesh axis so
tables can exceed single-chip HBM, with the ID exchange riding ICI.

Two lookup paths:

* GSPMD path (default): annotate the table with PartitionSpec
  ("model", None) and write plain ``table[ids]`` — XLA partitions the
  gather and inserts the collectives. Zero model-code changes.
* Explicit shard_map path (`lookup_row_sharded`): each shard holds rows
  [lo, hi), resolves local hits and psums partial rows. Deterministic
  communication (one psum of (B, D) bf16), useful when XLA's choice is
  suboptimal; also the hook point for a future Pallas all-to-all kernel.

Gradient correctness under duplicate ids in a batch comes from the
transpose of gather (scatter-add) / psum, which JAX derives — covered by
tests/test_tables.py.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec
from jax import shard_map

__all__ = [
    "row_sharded_spec",
    "pad_vocab",
    "lookup",
    "lookup_row_sharded",
    "dot_all_items_row_sharded",
]

MODEL_AXIS = "model"


def row_sharded_spec(axis: str = MODEL_AXIS) -> PartitionSpec:
    return PartitionSpec(axis, None)


def pad_vocab(count: int, num_shards: int, multiple: int = 8) -> int:
    """Round the vocab up so it divides evenly across shards and tiles
    onto (8,128) float32 VMEM tiles."""
    per = math.ceil(count / num_shards)
    per = ((per + multiple - 1) // multiple) * multiple
    return per * num_shards


def lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """GSPMD lookup: works replicated or sharded; XLA partitions it."""
    return jnp.take(table, ids, axis=0)


def lookup_row_sharded(
    mesh: Mesh,
    table: jnp.ndarray,
    ids: jnp.ndarray,
    axis: str = MODEL_AXIS,
    data_axis: Optional[str] = "data",
) -> jnp.ndarray:
    """Explicit row-sharded lookup.

    table: (V, D) sharded (axis, None); V divisible by mesh axis size.
    ids: any int shape, replicated along `axis` (may be sharded along
    `data`). Returns embeddings with ids' sharding.
    """
    axis_size = mesh.shape[axis]
    rows_per_shard = table.shape[0] // axis_size

    id_spec = (
        PartitionSpec(data_axis, *([None] * (ids.ndim - 1)))
        if data_axis and data_axis in mesh.axis_names and mesh.shape[data_axis] > 1
        else PartitionSpec(*([None] * ids.ndim))
    )

    def local(table_shard: jnp.ndarray, local_ids: jnp.ndarray) -> jnp.ndarray:
        shard = jax.lax.axis_index(axis)
        lo = shard * rows_per_shard
        offset = local_ids - lo
        in_shard = (offset >= 0) & (offset < rows_per_shard)
        safe = jnp.clip(offset, 0, rows_per_shard - 1)
        vals = jnp.take(table_shard, safe, axis=0)
        vals = jnp.where(in_shard[..., None], vals, 0.0)
        return jax.lax.psum(vals, axis)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(row_sharded_spec(axis), id_spec),
        out_specs=id_spec,
    )(table, ids)


def dot_all_items_row_sharded(
    mesh: Mesh,
    queries: jnp.ndarray,
    table: jnp.ndarray,
    axis: str = MODEL_AXIS,
) -> jnp.ndarray:
    """Full-catalog scoring q @ table.T with the catalog axis sharded:
    each shard computes its (B, V/P) score block; the result stays
    sharded over the item axis for the distributed top-k merge
    (parallel/topk.sharded_top_k). Replaces the reference's single-GPU
    einsum("BD,ND->BN") (SASRec/main.py:228)."""

    def local(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum(
            "bd,vd->bv", q, t, preferred_element_type=jnp.float32
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(PartitionSpec(), row_sharded_spec(axis)),
        out_specs=PartitionSpec(None, axis),
    )(queries, table)
