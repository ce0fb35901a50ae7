"""Device mesh construction and sharding rules.

Replaces the reference's torch-DDP/NCCL layer (SURVEY.md §2.1 item 2):
the only parallelism in RecBoard is data-parallel DDP; here parallelism
is expressed as a 2-D ``jax.sharding.Mesh`` with axes ``("data",
"model")`` — batches shard over `data`, embedding tables (the
recommender analogue of TP/EP) shard over `model`; XLA inserts the
collectives (psum for DP grads riding ICI, all-gather / all-to-all for
table exchange). Param placement is regex-matched PartitionSpec rules,
the standard pjit pattern.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "match_partition_rules",
    "shard_params",
    "local_batch_slice",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_model_shards: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """(data, model) mesh over all devices; `num_model_shards` divides
    the device count; the rest go to data parallelism."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % num_model_shards != 0:
        raise ValueError(
            f"{n} devices not divisible by num_model_shards={num_model_shards}"
        )
    grid = np.asarray(devices).reshape(n // num_model_shards, num_model_shards)
    return Mesh(grid, axis_names)


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Batch sharding: leading axis over `data`, rest replicated."""
    spec = PartitionSpec(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def match_partition_rules(
    rules: Sequence[Tuple[str, PartitionSpec]], params: Any
) -> Any:
    """Pytree of PartitionSpec chosen by first regex match on the
    '/'-joined param path; scalars are always replicated. Models expose
    `partition_rules()`; default shards big embedding tables by rows."""

    def assign(path, leaf):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        if np.ndim(leaf) == 0 or np.size(leaf) <= 1:
            return PartitionSpec()
        for pattern, spec in rules:
            if re.search(pattern, name):
                return spec
        return PartitionSpec()

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(mesh: Mesh, params: Any, specs: Any,
                 auto_pad: bool = True) -> Any:
    """Place a host pytree onto the mesh according to its specs.

    GSPMD requires even sharding. A row-sharded nn.Embed table (leaf
    param name ``embedding``) whose vocab does not divide the mesh axis
    is AUTO-PADDED with zero rows to ``tables.pad_vocab`` and sharded —
    gathers never touch the pad rows (ids < the logical count), their
    grads/adam moments stay identically zero, and the full-catalog
    scoring paths mask or slice phantom columns (parallel/topk
    ``valid_count``; Coach eval slices scores to Item.count). A padded
    checkpoint round-trips within a run; loading it into an UNSHARDED
    fresh init needs the pad rows sliced off (documented in
    docs/PARITY.md).

    Any OTHER leaf that does not divide (a Dense kernel someone
    row-sharded by rule, a col-sharded odd feature dim) falls back to
    replication for that dimension — LOUDLY, since silently replicating
    a table defeats the point of model sharding."""
    from .. import utils

    def place(path, leaf, spec):
        names = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        spec_t = tuple(spec)
        shape = np.shape(leaf)
        if (
            auto_pad
            and spec_t
            and spec_t[0] is not None
            and names
            and names[-1] == "embedding"
            and len(shape) >= 1
            and shape[0] % mesh.shape[spec_t[0]] != 0
        ):
            from .tables import pad_vocab

            import jax.numpy as jnp

            Vp = pad_vocab(shape[0], mesh.shape[spec_t[0]])
            widths = [(0, Vp - shape[0])] + [(0, 0)] * (len(shape) - 1)
            leaf = jnp.pad(jnp.asarray(leaf), widths)
            utils.infoLogger(
                f"[mesh] >>> {'/'.join(names)} vocab {shape[0]} -> {Vp} "
                f"(auto-padded to shard rows over '{spec_t[0]}')"
            )
            shape = np.shape(leaf)
        fixed = tuple(
            None
            if axis is not None and shape[i] % mesh.shape[axis] != 0
            else axis
            for i, axis in enumerate(spec_t)
        )
        if fixed != spec_t:
            utils.warnLogger(
                f"[mesh] >>> {'/'.join(names)} {shape} does not divide mesh "
                f"{dict(mesh.shape)} — REPLICATING instead of sharding "
                f"(pad the vocab to a multiple, see tables.pad_vocab)"
            )
        return jax.device_put(leaf, NamedSharding(mesh, PartitionSpec(*fixed)))

    return jax.tree_util.tree_map_with_path(place, params, specs)


def local_batch_slice(global_batch: int, mesh: Mesh) -> int:
    """Per-host batch size under multi-host data parallelism."""
    return max(1, global_batch // jax.process_count())
