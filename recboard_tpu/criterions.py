"""Loss criterions.

freerec parity (SURVEY.md §1 "criterions"): `BaseCriterion`, `BPRLoss`
(+ `.regularize(embds, rtype="l2")`), `BCELoss4Logits`,
`CrossEntropy4Logits`, `cross_entropy_with_logits` — call sites
SASRec/main.py:121-126, LightGCN/main.py:99-106, SimpleX/main.py:62-87.

All criterions are pure functions of jnp arrays (optionally weighted, so
padding positions can be masked without dynamic shapes — SURVEY.md §7
"hard parts" #4) wrapped in light callable classes for API parity.
XLA fuses these elementwise chains into the surrounding matmuls, so no
Pallas is needed here except the fused sampled-softmax in ops/losses.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "BaseCriterion",
    "BPRLoss",
    "BCELoss4Logits",
    "CrossEntropy4Logits",
    "KLDivLoss4Logits",
    "MSELoss",
    "L1Loss",
    "InfoNCELoss",
    "bpr_with_logits",
    "bce_with_logits",
    "cross_entropy_with_logits",
    "infonce",
]


def _reduce(values: jnp.ndarray, reduction: str, weights: Optional[jnp.ndarray]):
    if weights is not None:
        values = values * weights
        if reduction == "mean":
            return values.sum() / jnp.maximum(weights.sum(), 1e-12)
    if reduction == "mean":
        return values.mean()
    if reduction == "sum":
        return values.sum()
    return values  # 'none'


def bpr_with_logits(
    pos_logits: jnp.ndarray,
    neg_logits: jnp.ndarray,
    reduction: str = "mean",
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """-log sigmoid(pos - neg); numerically via softplus(neg - pos)."""
    return _reduce(jax.nn.softplus(neg_logits - pos_logits), reduction, weights)


def bce_with_logits(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    reduction: str = "mean",
    weights: Optional[jnp.ndarray] = None,
    pos_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Stable binary cross entropy on logits:
    max(x,0) - x*y + log(1+exp(-|x|)) (torch BCEWithLogits semantics)."""
    neg_abs = -jnp.abs(logits)
    loss = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(neg_abs))
    if pos_weight is not None:
        loss = jnp.where(labels > 0, loss * pos_weight, loss)
    return _reduce(loss, reduction, weights)


def cross_entropy_with_logits(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    reduction: str = "mean",
    weights: Optional[jnp.ndarray] = None,
    ignore_index: Optional[int] = None,
) -> jnp.ndarray:
    """Softmax CE over the last axis with integer labels; `ignore_index`
    masks positions (the static-shape replacement for boolean gathers)."""
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    loss = logz - picked
    if ignore_index is not None:
        valid = (labels != ignore_index).astype(loss.dtype)
        weights = valid if weights is None else weights * valid
    return _reduce(loss, reduction, weights)


def infonce(
    scores: jnp.ndarray,
    positive_index: int | jnp.ndarray = 0,
    temperature: float = 1.0,
    reduction: str = "mean",
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """InfoNCE over candidate axis -1 (positive at `positive_index`).
    Covers HSTU's sampled softmax (HSTU/main.py:157-201) and
    SGL/SimGCL-style contrastive objectives."""
    scores = scores / temperature
    if isinstance(positive_index, int):
        labels = jnp.full(scores.shape[:-1], positive_index, dtype=jnp.int32)
    else:
        labels = positive_index
    return cross_entropy_with_logits(scores, labels, reduction, weights)


class BaseCriterion:
    """Callable criterion with a reduction; subclass and override
    ``forward`` (SimpleX subclasses BaseCriterion for its cosine
    contrastive loss, SimpleX/main.py:62-87)."""

    def __init__(self, reduction: str = "mean"):
        self.reduction = reduction

    def forward(self, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    @staticmethod
    def regularize(embds: Iterable[jnp.ndarray] | jnp.ndarray, rtype: str = "l2"):
        """Embedding regularizer (LightGCN/main.py:99-106): sum of
        squared/abs entries over the given tensors, halved for l2."""
        if isinstance(embds, (jnp.ndarray,)):
            embds = [embds]
        total = 0.0
        for e in embds:
            if rtype == "l2":
                total = total + 0.5 * jnp.sum(jnp.square(e))
            elif rtype == "l1":
                total = total + jnp.sum(jnp.abs(e))
            else:
                raise ValueError(f"unknown rtype {rtype!r}")
        return total


class BPRLoss(BaseCriterion):
    def forward(self, pos_logits, neg_logits, weights=None):
        return bpr_with_logits(pos_logits, neg_logits, self.reduction, weights)


class BCELoss4Logits(BaseCriterion):
    def forward(self, logits, labels, weights=None):
        return bce_with_logits(logits, labels, self.reduction, weights)


class CrossEntropy4Logits(BaseCriterion):
    def forward(self, logits, labels, weights=None, ignore_index=None):
        return cross_entropy_with_logits(
            logits, labels, self.reduction, weights, ignore_index
        )


class KLDivLoss4Logits(BaseCriterion):
    """KL(target_probs || softmax(logits)) for distillation-style heads
    (ETEGRec alignment losses)."""

    def forward(self, logits, target_probs, weights=None):
        logp = jax.nn.log_softmax(logits, axis=-1)
        kl = jnp.sum(
            target_probs * (jnp.log(jnp.clip(target_probs, 1e-12)) - logp), axis=-1
        )
        return _reduce(kl, self.reduction, weights)


class MSELoss(BaseCriterion):
    def forward(self, inputs, targets, weights=None):
        return _reduce(jnp.square(inputs - targets), self.reduction, weights)


class L1Loss(BaseCriterion):
    def forward(self, inputs, targets, weights=None):
        return _reduce(jnp.abs(inputs - targets), self.reduction, weights)


class InfoNCELoss(BaseCriterion):
    def __init__(self, temperature: float = 1.0, reduction: str = "mean"):
        super().__init__(reduction)
        self.temperature = temperature

    def forward(self, scores, positive_index=0, weights=None):
        return infonce(scores, positive_index, self.temperature, self.reduction, weights)
