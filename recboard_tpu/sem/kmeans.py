"""Host-side k-means for codebook init and k-means SID generation.

Reference: TIGER uses `k_means_constrained` (C-backed) for balanced
codebook init (TIGER/quantizer.py:45-59) and has residual/product
k-means SID scripts; CCFRec uses faiss k-means
(CCFRec/generate_semantic_ids.py:5). Neither native dep exists here, so
this is a NumPy k-means++ with optional minimum-cluster-size balancing
(greedy capacity-constrained assignment) — offline prep, not a hot path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["kmeans", "residual_kmeans_sids", "product_kmeans_sids"]


def _kmeans_pp_init(x: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    n = len(x)
    centers = np.empty((k, x.shape[1]), dtype=x.dtype)
    centers[0] = x[rng.integers(n)]
    d2 = np.sum((x - centers[0]) ** 2, axis=1)
    for i in range(1, k):
        probs = d2 / max(d2.sum(), 1e-12)
        centers[i] = x[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, np.sum((x - centers[i]) ** 2, axis=1))
    return centers


def _assign(x: np.ndarray, centers: np.ndarray) -> np.ndarray:
    d2 = (
        np.sum(x**2, axis=1, keepdims=True)
        - 2 * x @ centers.T
        + np.sum(centers**2, axis=1)[None]
    )
    return d2.argmin(axis=1)


def _balanced_assign(
    x: np.ndarray, centers: np.ndarray, size_min: int
) -> np.ndarray:
    """Greedy capacity-floor assignment: start from the unconstrained
    argmin, then move the cheapest points into under-filled clusters."""
    k = len(centers)
    d2 = (
        np.sum(x**2, axis=1, keepdims=True)
        - 2 * x @ centers.T
        + np.sum(centers**2, axis=1)[None]
    )
    labels = d2.argmin(axis=1)
    counts = np.bincount(labels, minlength=k)
    for c in range(k):
        deficit = size_min - counts[c]
        if deficit <= 0:
            continue
        # candidates: points not in c, from clusters above the floor
        cost = d2[:, c] - d2[np.arange(len(x)), labels]
        order = np.argsort(cost)
        moved = 0
        for i in order:
            if moved >= deficit:
                break
            src = labels[i]
            if src == c or counts[src] <= size_min:
                continue
            labels[i] = c
            counts[src] -= 1
            counts[c] += 1
            moved += 1
    return labels


def kmeans(
    x: np.ndarray,
    k: int,
    iters: int = 20,
    seed: int = 0,
    size_min: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(centers (k, D), labels (N,)); k-means++ init, optional balanced
    assignment with a minimum cluster size."""
    x = np.asarray(x, dtype=np.float64)
    rng = np.random.default_rng(seed)
    centers = _kmeans_pp_init(x, k, rng)
    labels = np.zeros(len(x), dtype=np.int64)
    for _ in range(iters):
        if size_min:
            labels = _balanced_assign(x, centers, size_min)
        else:
            labels = _assign(x, centers)
        for c in range(k):
            mask = labels == c
            if mask.any():
                centers[c] = x[mask].mean(axis=0)
            else:  # re-seed empty cluster at the farthest point
                d2 = np.sum((x - centers[labels]) ** 2, axis=1)
                centers[c] = x[d2.argmax()]
    if size_min:
        labels = _balanced_assign(x, centers, size_min)
    else:
        labels = _assign(x, centers)
    return centers.astype(np.float32), labels


def residual_kmeans_sids(
    features: np.ndarray,
    num_codebooks: int = 3,
    num_codewords: int = 256,
    iters: int = 20,
    seed: int = 0,
) -> np.ndarray:
    """R-KMeans semantic IDs (TIGER's train_rkmeans variant): k-means on
    the residual at every level. Returns (N, L) code indices."""
    x = np.asarray(features, dtype=np.float64)
    ids = []
    for l in range(num_codebooks):
        k = min(num_codewords, len(x))
        centers, labels = kmeans(x, k, iters=iters, seed=seed + l)
        ids.append(labels)
        x = x - centers[labels]
    return np.stack(ids, axis=-1)


def product_kmeans_sids(
    features: np.ndarray,
    num_codebooks: int = 3,
    num_codewords: int = 256,
    iters: int = 20,
    seed: int = 0,
) -> np.ndarray:
    """PQ-KMeans semantic IDs: split the feature dim into L blocks and
    k-means each block independently. Returns (N, L)."""
    x = np.asarray(features, dtype=np.float64)
    splits = np.array_split(x, num_codebooks, axis=1)
    ids = []
    for l, block in enumerate(splits):
        k = min(num_codewords, len(x))
        _, labels = kmeans(block, k, iters=iters, seed=seed + l)
        ids.append(labels)
    return np.stack(ids, axis=-1)
