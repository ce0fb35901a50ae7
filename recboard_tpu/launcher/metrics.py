"""Ranking & prediction metrics, computed on device.

freerec parity (SURVEY.md §5.5): rank metrics HITRATE / PRECISION /
RECALL / NDCG / MRR at the Ks parsed from monitor names ("HitRate@10"),
scalar LOSS / LOGLOSS / AUC, n-weighted mean reduction. Metric keys are
upper-cased in results ("HITRATE@10" — benchmark/*/MF-BPR.json).

Design: one jitted pass per eval batch — top-K_max indices once, then a
relevance matrix against the padded target ids; every requested metric
is a cheap reduction of that matrix. Ties broken by lower index
(lax.top_k), matching torch.topk.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "parse_monitor",
    "rank_metrics",
    "auc",
    "log_loss",
    "RANK_METRICS",
]

RANK_METRICS = ("HITRATE", "PRECISION", "RECALL", "NDCG", "MRR")

_CANON = {
    "hitrate": "HITRATE",
    "hr": "HITRATE",
    "precision": "PRECISION",
    "recall": "RECALL",
    "ndcg": "NDCG",
    "mrr": "MRR",
    "loss": "LOSS",
    "logloss": "LOGLOSS",
    "auc": "AUC",
}


def parse_monitor(name: str) -> Tuple[str, int]:
    """'HitRate@10' → ('HITRATE', 10); scalar metrics get K=0."""
    # names may carry custom suffixes ("PPL#0") or '$'-namespaces
    # ("Beauty$NDCG@10" — UniSRec/main.py:443-446)
    m = re.fullmatch(r"([A-Za-z_][A-Za-z_0-9#$]*?)\s*(?:@\s*(\d+))?", name.strip())
    if not m:
        raise ValueError(f"bad monitor name {name!r}")
    base = _CANON.get(m.group(1).lower(), m.group(1).upper())
    return base, int(m.group(2) or 0)


def fmt_metric(base: str, k: int) -> str:
    return f"{base}@{k}" if k else base


def rank_metrics(
    scores: jnp.ndarray,
    target_ids: jnp.ndarray,
    wanted: Sequence[Tuple[str, int]],
    valid_rows: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Per-batch metric *sums* (caller divides by row count).

    scores: (B, N) float; target_ids: (B, T) int padded with -1;
    valid_rows: (B,) 0/1 float for padded eval rows.
    """
    ks = sorted({k for _, k in wanted if k > 0}) or [1]
    # catalogs smaller than the largest cutoff (tiny fixtures, filtered
    # pools): ranks past the catalog cannot hold a hit, so METRIC@k
    # degrades to METRIC@N exactly — clamp rather than error
    kmax = min(ks[-1], scores.shape[-1])
    _, topk = jax.lax.top_k(scores, kmax)  # (B, Kmax)
    rel = (topk[:, :, None] == target_ids[:, None, :]).any(axis=-1)  # (B, Kmax)
    rel = rel.astype(jnp.float32)
    num_targets = (target_ids >= 0).sum(axis=-1).astype(jnp.float32)  # (B,)
    num_targets = jnp.maximum(num_targets, 1.0)

    positions = jnp.arange(kmax, dtype=jnp.float32)
    discounts = 1.0 / jnp.log2(positions + 2.0)  # (Kmax,)
    cum_rel = jnp.cumsum(rel, axis=1)
    dcg = jnp.cumsum(rel * discounts, axis=1)  # (B, Kmax) prefix DCG
    ideal_prefix = jnp.cumsum(discounts)  # (Kmax,)

    out: Dict[str, jnp.ndarray] = {}
    for base, k in wanted:
        if k <= 0:
            continue
        hits_k = cum_rel[:, k - 1]
        if base == "HITRATE":
            value = (hits_k > 0).astype(jnp.float32)
        elif base == "PRECISION":
            value = hits_k / k
        elif base == "RECALL":
            value = hits_k / num_targets
        elif base == "NDCG":
            # IDCG: best case places min(T, k) targets at the top
            tcap = jnp.minimum(num_targets, float(k)).astype(jnp.int32)
            idcg = ideal_prefix[jnp.clip(tcap - 1, 0, kmax - 1)]
            value = dcg[:, k - 1] / idcg
        elif base == "MRR":
            first = jnp.argmax(rel, axis=1)  # first hit position
            has_hit = hits_k > 0
            value = jnp.where(
                has_hit & (first < k), 1.0 / (first.astype(jnp.float32) + 1.0), 0.0
            )
        else:
            continue
        out[fmt_metric(base, k)] = (value * valid_rows).sum()
    return out


def auc(labels: np.ndarray, preds: np.ndarray) -> float:
    """Global rank-based AUC (ties averaged) over all eval rows — the
    CTR metric (DeepFM/README.md monitors)."""
    labels = np.asarray(labels).astype(np.float64)
    preds = np.asarray(preds).astype(np.float64)
    order = np.argsort(preds, kind="mergesort")
    ranks = np.empty(len(preds), dtype=np.float64)
    sorted_preds = preds[order]
    ranks[order] = np.arange(1, len(preds) + 1)
    # average ranks over ties
    i = 0
    while i < len(preds):
        j = i
        while j + 1 < len(preds) and sorted_preds[j + 1] == sorted_preds[i]:
            j += 1
        if j > i:
            avg = (i + j + 2) / 2.0
            ranks[order[i : j + 1]] = avg
        i = j + 1
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return float((ranks[labels > 0].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def log_loss(labels: np.ndarray, preds: np.ndarray, eps: float = 1e-7) -> float:
    labels = np.asarray(labels).astype(np.float64)
    preds = np.clip(np.asarray(preds).astype(np.float64), eps, 1 - eps)
    return float(-(labels * np.log(preds) + (1 - labels) * np.log(1 - preds)).mean())
