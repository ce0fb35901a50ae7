"""Custom optimizers — SEvo's graph-smoothed embedding updates.

Reference: SEvo/optims/utils.py:10-52 (Smoother: Neumann-series or
iterative approximation of (1-β)(I-βA)^-1), SEvo/optims/Adam.py:60-222
(the adam delta of the item-embedding param group is smoothed over the
item-item graph before being applied), SEvo/optims/utils.py:55-105
(item graph: co-occurrence within `hops`, 1/h weights, sym-normalized).

TPU-native design: instead of a forked torch.optim.Adam, SEvo is an
optax transform — `optax.multi_transform` routes the embedding param
through `chain(scale_by_adam, smooth_updates(adj), scale(-lr))`, so the
smoothing (K gather+segment-sum SpMMs) fuses into the jitted train
step.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Optional

import jax
import numpy as np
import optax

from .graph import SparseAdj, to_normalized

__all__ = ["make_smoother", "smooth_updates", "sevo_adam", "sevo_optimizer", "build_item_graph"]


def make_smoother(
    adj: SparseAdj, beta: float = 0.99, L: int = 3, aggr: str = "neumann"
) -> Callable:
    """features → smoothed features (SEvo/optims/utils.py:36-50)."""
    scale_correction = 1 - beta ** (L + 1)

    def smoother(features):
        smoothed = features
        x = features
        if aggr == "neumann":
            for _ in range(L):
                x = (adj @ x) * beta
                smoothed = smoothed + x
            return smoothed * (1 - beta) / scale_correction
        if aggr == "iterative":
            for _ in range(L):
                smoothed = (adj @ x) * beta + x * (1 - beta)
            return smoothed
        raise ValueError(f"aggr should be neumann|iterative, got {aggr!r}")

    return smoother


def smooth_updates(smoother: Callable) -> optax.GradientTransformation:
    """Apply the smoother to every (V, D) update leaf."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        smoothed = jax.tree.map(
            lambda u: smoother(u) if u.ndim == 2 else u, updates
        )
        return smoothed, state

    return optax.GradientTransformation(init_fn, update_fn)


def sevo_optimizer(
    lr: float,
    adj: SparseAdj,
    label_fn: Callable,
    kind: str = "adam",
    beta: float = 0.99,
    L: int = 3,
    aggr: str = "neumann",
    b1: float = 0.9,
    b2: float = 0.999,
    weight_decay: float = 0.0,
    momentum: float = 0.0,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """SEvo smoothing injected into adam / adamw / sgd (the reference
    ships all three variants, SEvo/optims/{Adam,AdamW,SGD}.py): the
    delta of params labeled 'smooth' by `label_fn(params) -> pytree of
    'smooth'|'plain'` is graph-smoothed right before the lr scale —
    the same injection point as the reference's per-param-group
    Smoother (SEvo/optims/Adam.py:95-110).

    Weight-decay placement mirrors torch: adam/sgd couple it into the
    gradient BEFORE the moments; adamw decays decoupled AFTER them."""
    smoother = make_smoother(adj, beta, L, aggr)

    def branch(smooth: bool):
        chain = []
        if kind in ("adam", "sgd") and weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        if kind in ("adam", "adamw"):
            chain.append(optax.scale_by_adam(b1=b1, b2=b2))
        elif kind == "sgd":
            if momentum:
                chain.append(
                    optax.trace(decay=momentum, nesterov=nesterov)
                )
        else:
            raise ValueError(f"unknown SEvo optimizer kind {kind!r}")
        if kind == "adamw" and weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        if smooth:
            chain.append(smooth_updates(smoother))
        chain.append(optax.scale(-lr))
        return optax.chain(*chain)

    return optax.multi_transform(
        {"smooth": branch(True), "plain": branch(False)}, label_fn
    )


def sevo_adam(lr, adj, label_fn, **kw):
    """Backwards-compatible alias for sevo_optimizer(kind="adam")."""
    return sevo_optimizer(lr, adj, label_fn, kind="adam", **kw)


def build_item_graph(
    dataset,
    hops: int = 2,
    maxlen: Optional[int] = None,
    num_pads: int = 1,
) -> SparseAdj:
    """Item co-occurrence graph with 1/h distance weights, symmetric,
    sym-normalized, over Item.count + num_pads nodes
    (SEvo/optims/utils.py:55-105)."""
    seqs = dataset.train().user_seqs(maxlen)
    edge = defaultdict(float)
    for seq in seqs:
        for i in range(len(seq) - 1):
            x = seq[i] + num_pads
            for h, j in enumerate(
                range(i + 1, min(i + hops + 1, len(seq))), start=1
            ):
                y = seq[j] + num_pads
                edge[(x, y)] += 1.0 / h
                edge[(y, x)] += 1.0 / h
    n = dataset.fields["ITEM", "ID"].count + num_pads
    if not edge:
        return SparseAdj(np.zeros(0), np.zeros(0), np.zeros(0), (n, n))
    idx = np.asarray(list(edge.keys()), dtype=np.int64)
    vals = np.asarray(list(edge.values()), dtype=np.float32)
    adj = SparseAdj(idx[:, 0], idx[:, 1], vals, (n, n))
    return to_normalized(adj, "sym")
