"""Sparse-graph utilities.

freerec parity (SURVEY.md §1 "graph"): `to_adjacency`, `to_normalized`,
`to_undirected`, `add_self_loops`, `get_knn_graph(sim, k, symmetric)`,
`scatter` — call sites NGCF/main.py:77-88, FREEDOM/main.py:126,223-229,
MGCN/main.py:173-181; the LightGCN hot loop is `Adj @ allEmbds`
(LightGCN/main.py:82-84).

TPU-first design: adjacency is a COO pytree (`SparseAdj`) whose matvec
compiles to gather + `jax.ops.segment_sum` — static shapes, fuses well
under XLA, and the segment ids are sorted (`indices_are_sorted=True`)
because we sort edges by destination row at build time. A Pallas
blocked-SpMM for very large graphs lives in ops/spmm.py; `SparseAdj.@`
routes through the same interface.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SparseAdj",
    "to_adjacency",
    "to_undirected",
    "add_self_loops",
    "to_normalized",
    "bipartite_normalized_adj",
    "get_knn_graph",
    "scatter_sum",
    "scatter",
]


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spmm_fixed(M, N, x, rows, cols, vals, trows, tcols, tvals):
    """adj @ x with the VJP rewritten as the pre-sorted transpose's
    segment-sum (see SparseAdj.spmm_const). Index/value arrays get
    zero cotangents by construction — the adjacency is a constant."""
    g = x[cols] * vals[:, None].astype(x.dtype)
    return jax.ops.segment_sum(g, rows, num_segments=M, indices_are_sorted=True)


def _spmm_fixed_fwd(M, N, x, rows, cols, vals, trows, tcols, tvals):
    out = _spmm_fixed(M, N, x, rows, cols, vals, trows, tcols, tvals)
    return out, (rows, cols, vals, trows, tcols, tvals)


def _spmm_fixed_bwd(M, N, res, ct):
    rows, cols, vals, trows, tcols, tvals = res
    gg = ct[tcols] * tvals[:, None].astype(ct.dtype)
    gx = jax.ops.segment_sum(gg, trows, num_segments=N, indices_are_sorted=True)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # int cotangents
    return (gx, f0(rows), f0(cols), jnp.zeros_like(vals),
            f0(trows), f0(tcols), jnp.zeros_like(tvals))


_spmm_fixed.defvjp(_spmm_fixed_fwd, _spmm_fixed_bwd)


@jax.tree_util.register_pytree_node_class
class SparseAdj:
    """COO sparse matrix with edges sorted by destination row."""

    def __init__(self, rows, cols, vals, shape: Tuple[int, int], *, _sorted=False):
        if not _sorted:
            order = np.argsort(np.asarray(rows), kind="stable")
            rows = np.asarray(rows)[order]
            cols = np.asarray(cols)[order]
            vals = np.asarray(vals)[order]
        self.rows = jnp.asarray(rows, dtype=jnp.int32)
        self.cols = jnp.asarray(cols, dtype=jnp.int32)
        self.vals = jnp.asarray(vals, dtype=jnp.float32)
        self.shape = tuple(shape)

    @property
    def nnz(self) -> int:
        return int(self.rows.shape[0])

    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(M, N) @ (N, D) → (M, D) via gather + sorted segment-sum."""
        gathered = x[self.cols] * self.vals[:, None].astype(x.dtype)
        return jax.ops.segment_sum(
            gathered,
            self.rows,
            num_segments=self.shape[0],
            indices_are_sorted=True,
        )

    def transpose(self) -> "SparseAdj":
        return SparseAdj(
            self.cols, self.rows, self.vals, (self.shape[1], self.shape[0])
        )

    def spmm_const(self, x: jnp.ndarray) -> jnp.ndarray:
        """``adj @ x`` for a FIXED adjacency (no gradient to vals).

        Autodiff of ``adj @ x`` turns the forward gather's transpose
        into a scatter-add at the UNSORTED col indices — the single
        most expensive op in a K-hop propagation step (the backward
        scatter measured ~2x the sorted forward segment-sum on the
        v5e). For a constant graph d/dx (A @ x) = A^T @ g, and A^T
        re-sorted by ITS destination rows is another sorted
        segment-sum. This wrapper precomputes the sorted transpose at
        build time (numpy, cached) and installs it as the custom VJP,
        so both directions run the fast path. Graph models' adjacency
        buffers are constants (LightGCN/main.py:47-49 builds Adj once
        from the train split), so this is semantics-preserving; pinned
        against autodiff by tests/test_graph.py.
        """
        trows, tcols, tvals = self._sorted_transpose()
        return _spmm_fixed(
            self.shape[0], self.shape[1], x,
            self.rows, self.cols, self.vals, trows, tcols, tvals,
        )

    def _sorted_transpose(self):
        """Transpose edge lists re-sorted by destination, cached as
        PURE NUMPY: jnp arrays built inside a jit trace are tracers and
        caching them on self leaks them across traces (observed via the
        Coach's jitted step). numpy constants re-embed per trace.
        Requires a concrete (constant) adjacency — np.asarray raises on
        tracers, which is the correct loud failure for spmm_const."""
        if getattr(self, "_t_cache", None) is None:
            rows = np.asarray(self.cols)
            cols = np.asarray(self.rows)
            vals = np.asarray(self.vals)
            order = np.argsort(rows, kind="stable")
            self._t_cache = (rows[order], cols[order], vals[order])
        return self._t_cache

    @property
    def T(self) -> "SparseAdj":
        return self.transpose()

    def to_dense(self) -> jnp.ndarray:
        dense = jnp.zeros(self.shape, dtype=self.vals.dtype)
        return dense.at[self.rows, self.cols].add(self.vals)

    # pytree protocol — rows/cols/vals are leaves, shape is static
    def tree_flatten(self):
        return (self.rows, self.cols, self.vals), self.shape

    @classmethod
    def tree_unflatten(cls, shape, leaves):
        obj = cls.__new__(cls)
        obj.rows, obj.cols, obj.vals = leaves
        obj.shape = tuple(shape)
        return obj


def to_adjacency(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: Optional[np.ndarray] = None,
    num_nodes: Optional[int] = None,
) -> SparseAdj:
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    if num_nodes is None:
        num_nodes = int(max(rows.max(initial=-1), cols.max(initial=-1))) + 1
    if vals is None:
        vals = np.ones(len(rows), dtype=np.float32)
    return SparseAdj(rows, cols, vals, (num_nodes, num_nodes))


def _coalesce(rows, cols, vals, shape):
    """Merge duplicate edges by summing values."""
    key = rows.astype(np.int64) * shape[1] + cols
    uniq, inverse = np.unique(key, return_inverse=True)
    merged = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(merged, inverse, vals)
    return (
        (uniq // shape[1]).astype(np.int64),
        (uniq % shape[1]).astype(np.int64),
        merged.astype(np.float32),
    )


def to_undirected(adj: SparseAdj) -> SparseAdj:
    rows = np.concatenate([np.asarray(adj.rows), np.asarray(adj.cols)])
    cols = np.concatenate([np.asarray(adj.cols), np.asarray(adj.rows)])
    vals = np.concatenate([np.asarray(adj.vals), np.asarray(adj.vals)])
    rows, cols, vals = _coalesce(rows, cols, np.minimum(vals, vals), adj.shape)
    vals = np.minimum(vals, 1.0)
    return SparseAdj(rows, cols, vals, adj.shape)


def add_self_loops(adj: SparseAdj, fill_value: float = 1.0) -> SparseAdj:
    n = adj.shape[0]
    rows = np.concatenate([np.asarray(adj.rows), np.arange(n)])
    cols = np.concatenate([np.asarray(adj.cols), np.arange(n)])
    vals = np.concatenate(
        [np.asarray(adj.vals), np.full(n, fill_value, dtype=np.float32)]
    )
    return SparseAdj(rows, cols, vals, adj.shape)


def to_normalized(adj: SparseAdj, normalization: str = "sym") -> SparseAdj:
    """Degree-normalize: 'sym' → D^-1/2 A D^-1/2, 'left' → D^-1 A,
    'right' → A D^-1 (NGCF/main.py:77-88 usage)."""
    rows = np.asarray(adj.rows)
    cols = np.asarray(adj.cols)
    vals = np.asarray(adj.vals)
    deg_out = np.zeros(adj.shape[0], dtype=np.float64)
    np.add.at(deg_out, rows, vals)
    deg_in = np.zeros(adj.shape[1], dtype=np.float64)
    np.add.at(deg_in, cols, vals)
    with np.errstate(divide="ignore"):
        inv_out = np.where(deg_out > 0, 1.0 / deg_out, 0.0)
        inv_in = np.where(deg_in > 0, 1.0 / deg_in, 0.0)
        inv_sqrt_out = np.sqrt(inv_out)
        inv_sqrt_in = np.sqrt(inv_in)
    if normalization == "sym":
        new_vals = inv_sqrt_out[rows] * vals * inv_sqrt_in[cols]
    elif normalization == "left":
        new_vals = inv_out[rows] * vals
    elif normalization == "right":
        new_vals = vals * inv_in[cols]
    else:
        raise ValueError(f"unknown normalization {normalization!r}")
    return SparseAdj(rows, cols, new_vals.astype(np.float32), adj.shape)


def bipartite_normalized_adj(
    users: np.ndarray,
    items: np.ndarray,
    num_users: int,
    num_items: int,
    normalization: str = "sym",
) -> SparseAdj:
    """The (U+I)x(U+I) block adjacency [[0, R], [R^T, 0]], normalized —
    the LightGCN propagation operator (LightGCN/main.py:47-49)."""
    users = np.asarray(users, dtype=np.int64)
    items = np.asarray(items, dtype=np.int64) + num_users
    n = num_users + num_items
    rows = np.concatenate([users, items])
    cols = np.concatenate([items, users])
    rows, cols, vals = _coalesce(
        rows, cols, np.ones(len(rows), dtype=np.float32), (n, n)
    )
    vals = np.minimum(vals, 1.0)  # duplicates count once
    return to_normalized(SparseAdj(rows, cols, vals, (n, n)), normalization)


def get_knn_graph(
    sim: jnp.ndarray, k: int, symmetric: bool = True, normalize: bool = True
) -> SparseAdj:
    """Top-k similarity graph over items (LATTICE/main.py:118,
    FREEDOM/main.py:118-135): keep each row's k largest entries."""
    sim = np.asarray(sim)
    n = sim.shape[0]
    idx = np.argpartition(-sim, kth=min(k, n - 1), axis=1)[:, :k]
    rows = np.repeat(np.arange(n), k)
    cols = idx.reshape(-1)
    vals = sim[rows, cols].astype(np.float32)
    adj = SparseAdj(rows, cols, np.ones_like(vals), (n, n))
    if symmetric:
        adj = to_undirected(adj)
    if normalize:
        adj = to_normalized(adj, "sym")
    return adj


def scatter_sum(src: jnp.ndarray, index: jnp.ndarray, dim_size: int) -> jnp.ndarray:
    """torch_geometric-style scatter-add along axis 0 (LESSR message
    passing); segment ids need not be sorted."""
    return jax.ops.segment_sum(src, index, num_segments=dim_size)


def scatter(
    src: jnp.ndarray, index: jnp.ndarray, dim_size: int, reduce: str = "sum"
) -> jnp.ndarray:
    if reduce == "sum":
        return scatter_sum(src, index, dim_size)
    if reduce == "mean":
        total = scatter_sum(src, index, dim_size)
        cnt = jax.ops.segment_sum(
            jnp.ones(src.shape[0], dtype=src.dtype), index, num_segments=dim_size
        )
        return total / jnp.maximum(cnt, 1.0)[(...,) + (None,) * (src.ndim - 1)]
    if reduce == "max":
        return jax.ops.segment_max(src, index, num_segments=dim_size)
    if reduce == "min":
        return jax.ops.segment_min(src, index, num_segments=dim_size)
    raise ValueError(f"unknown reduce {reduce!r}")
