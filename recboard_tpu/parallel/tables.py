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
    "col_sharded_spec",
    "pad_vocab",
    "lookup",
    "lookup_row_sharded",
    "lookup_row_sharded_rs",
    "lookup_col_sharded",
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


def col_sharded_spec(axis: str = MODEL_AXIS) -> PartitionSpec:
    return PartitionSpec(None, axis)


def lookup_col_sharded(
    mesh: Mesh,
    table: jnp.ndarray,
    ids: jnp.ndarray,
    axis: str = MODEL_AXIS,
    combine: bool = True,
) -> jnp.ndarray:
    """Column-sharded lookup (the TP analogue): every shard holds ALL
    vocab rows but D/P feature columns, so the gather itself is fully
    local — no collective on the forward lookup at all. With
    ``combine=True`` the feature axis is all-gathered back to a full
    (ids..., D) tensor; with ``combine=False`` the output STAYS
    feature-sharded (PartitionSpec(..., axis)) for a downstream
    column-parallel matmul to consume without any exchange.

    Row vs column trade-off: row sharding scales VOCAB beyond one chip
    (communication = one psum/reduce_scatter of the looked-up rows);
    column sharding scales the EMBEDDING DIM and makes lookups
    collective-free but replicates the id space per shard."""

    def local(table_shard: jnp.ndarray, local_ids: jnp.ndarray) -> jnp.ndarray:
        vals = jnp.take(table_shard, local_ids, axis=0)  # (..., D/P)
        if combine:
            vals = jax.lax.all_gather(vals, axis, axis=vals.ndim - 1, tiled=True)
        return vals

    out_spec = (
        PartitionSpec(*([None] * ids.ndim), None)
        if combine
        else PartitionSpec(*([None] * ids.ndim), axis)
    )
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(col_sharded_spec(axis), PartitionSpec(*([None] * ids.ndim))),
        out_specs=out_spec,
        check_vma=False,  # replication over the data axis is by construction
    )(table, ids)


def lookup_row_sharded_rs(
    mesh: Mesh,
    table: jnp.ndarray,
    ids: jnp.ndarray,
    axis: str = MODEL_AXIS,
) -> jnp.ndarray:
    """Row-sharded lookup with the classic ID/row EXCHANGE over ICI
    (the all-to-all embedding pattern, SURVEY.md §2.1): ids arrive
    PARTITIONED over the model axis by position — each shard holds
    B/P ids — then

      1. all_gather the (cheap, int) ids so every shard sees all B;
      2. each shard gathers complete rows for the ids it OWNS
         (zeros elsewhere) — local HBM gather, no communication;
      3. reduce_scatter the (B, D) partial-row tensor back over the
         position axis, so each shard ends with full rows for ITS B/P
         positions.

    Communication: B ints all-gathered + (P-1)/P · B · D floats in the
    reduce_scatter — same volume as the psum path but the OUTPUT stays
    position-sharded (no replication), which is what a position-sharded
    downstream (sequence-parallel tower, per-shard loss) wants.

    ids: (B,) int, B divisible by the axis size; sharded
    PartitionSpec(axis). Returns (B, D) sharded PartitionSpec(axis, None).
    """
    axis_size = mesh.shape[axis]
    rows_per_shard = table.shape[0] // axis_size

    def local(table_shard: jnp.ndarray, my_ids: jnp.ndarray) -> jnp.ndarray:
        all_ids = jax.lax.all_gather(my_ids, axis, axis=0, tiled=True)  # (B,)
        shard = jax.lax.axis_index(axis)
        lo = shard * rows_per_shard
        offset = all_ids - lo
        in_shard = (offset >= 0) & (offset < rows_per_shard)
        safe = jnp.clip(offset, 0, rows_per_shard - 1)
        vals = jnp.take(table_shard, safe, axis=0)  # (B, D)
        vals = jnp.where(in_shard[:, None], vals, 0.0)
        # sum over shards + scatter positions back to their owners
        return jax.lax.psum_scatter(vals, axis, scatter_dimension=0, tiled=True)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(row_sharded_spec(axis), PartitionSpec(axis)),
        out_specs=PartitionSpec(axis, None),
        check_vma=False,  # replication over the data axis is by construction
    )(table, ids)
