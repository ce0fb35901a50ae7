"""SpMM for K-hop graph propagation — kernel strategy notes.

The LightGCN-family hot loop is `Adj @ X` over an unstructured bipartite
graph (LightGCN/main.py:82-84; Beauty ≈ 0.4 M edges / 34 k nodes,
Yelp ≈ 4.2 M edges / 123 k nodes). On TPU there are three candidate
implementations:

1. **gather + sorted segment-sum (the production path)** — edges sorted
   by destination at build time (graph.SparseAdj), `x[cols] * w` then
   `segment_sum(..., indices_are_sorted=True)`. XLA lowers this to a
   dense-gather + in-order accumulation that is HBM-bandwidth-bound —
   the roofline for unstructured SpMM.
2. **Pallas row-blocked kernel** — blocked on a current Mosaic gap:
   vectorized integer gather/scatter from VMEM refs does not lower
   ("Cannot do int indexing on TPU"), and per-edge DMA loops are orders
   of magnitude slower than (1). Revisit when the gather primitive
   lands (the fused sampled-softmax kernel in ops/losses.py hits the
   same wall).
3. **block-sparse (128×128 tile) matmul with scalar-prefetched tile
   indices** — implementable today, but unprofitable for rec graphs:
   at ~1e-4 density the edges scatter across nearly-distinct tiles, so
   tile-dense work exceeds the *fully dense* matmul (e.g. Beauty train
   graph: ~0.4 M occupied tiles × 128² MACs ≫ 34 k² dense). Only wins
   for community-clustered adjacencies, which `make` does not produce.

Hence `spmm` is (1); the function exists so models/kernels depend on a
single entry point that can swap implementations later.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..graph import SparseAdj

__all__ = ["spmm"]


def spmm(adj: SparseAdj, x: jnp.ndarray) -> jnp.ndarray:
    """(M, N) sparse @ (N, D) dense via gather + sorted segment-sum."""
    return adj @ x
