"""Golden-value metric tests (hand-computed)."""

import jax.numpy as jnp
import numpy as np
import pytest

from recboard_tpu.launcher import metrics as M


def test_parse_monitor():
    assert M.parse_monitor("HitRate@10") == ("HITRATE", 10)
    assert M.parse_monitor("ndcg@5") == ("NDCG", 5)
    assert M.parse_monitor("LOSS") == ("LOSS", 0)
    assert M.parse_monitor("mrr@20") == ("MRR", 20)


def test_rank_metrics_single_target():
    # 2 rows, 5 items. Row0 target=2 ranked 1st; row1 target=0 ranked 3rd.
    scores = jnp.asarray(
        [[0.1, 0.2, 0.9, 0.0, 0.3], [0.5, 0.9, 0.7, 0.1, 0.0]]
    )
    targets = jnp.asarray([[2], [0]])
    wanted = [("HITRATE", 2), ("NDCG", 2), ("HITRATE", 3), ("NDCG", 3), ("MRR", 3), ("RECALL", 3), ("PRECISION", 2)]
    out = M.rank_metrics(scores, targets, wanted, jnp.ones(2))
    assert float(out["HITRATE@2"]) == 1.0  # only row0 hit in top2
    assert float(out["HITRATE@3"]) == 2.0
    # NDCG@3: row0 = 1/log2(2)=1; row1 = 1/log2(4)=0.5
    assert float(out["NDCG@3"]) == pytest.approx(1.5)
    assert float(out["NDCG@2"]) == pytest.approx(1.0)
    # MRR@3: 1/1 + 1/3
    assert float(out["MRR@3"]) == pytest.approx(1 + 1 / 3)
    assert float(out["RECALL@3"]) == pytest.approx(2.0)
    assert float(out["PRECISION@2"]) == pytest.approx(0.5)


def test_rank_metrics_multi_target_and_padding():
    scores = jnp.asarray([[0.9, 0.8, 0.1, 0.7]])
    targets = jnp.asarray([[0, 3, -1]])  # two targets, one pad
    out = M.rank_metrics(scores, targets, [("RECALL", 2), ("NDCG", 2), ("HITRATE", 1)], jnp.ones(1))
    # top2 = [0, 1]; hits = {0}
    assert float(out["RECALL@2"]) == pytest.approx(0.5)
    # DCG@2 = 1; IDCG@2 (2 targets) = 1 + 1/log2(3)
    assert float(out["NDCG@2"]) == pytest.approx(1 / (1 + 1 / np.log2(3)), rel=1e-4)
    assert float(out["HITRATE@1"]) == 1.0


def test_valid_rows_mask():
    scores = jnp.asarray([[0.9, 0.1], [0.9, 0.1]])
    targets = jnp.asarray([[0], [0]])
    out = M.rank_metrics(scores, targets, [("HITRATE", 1)], jnp.asarray([1.0, 0.0]))
    assert float(out["HITRATE@1"]) == 1.0  # padded row ignored


def test_auc_and_logloss():
    labels = np.array([1, 0, 1, 0])
    preds = np.array([0.9, 0.1, 0.8, 0.3])
    assert M.auc(labels, preds) == 1.0
    preds2 = np.array([0.9, 0.95, 0.8, 0.3])
    assert M.auc(labels, preds2) == pytest.approx(0.5)
    # ties average
    assert M.auc(np.array([1, 0]), np.array([0.5, 0.5])) == pytest.approx(0.5)
    ll = M.log_loss(np.array([1.0]), np.array([0.5]))
    assert ll == pytest.approx(np.log(2))


def test_rank_metrics_k_exceeds_catalog():
    # METRIC@k with k > N degrades to METRIC@N exactly (tiny fixtures /
    # filtered pools must not crash top_k) — metrics.py kmax clamp
    scores = jnp.asarray(
        [[0.1, 0.2, 0.9, 0.0, 0.3], [0.5, 0.9, 0.7, 0.1, 0.0]]
    )
    targets = jnp.asarray([[3], [3]])  # row0 rank 4th, row1 rank 4th
    big = M.rank_metrics(scores, targets, [("HITRATE", 20), ("NDCG", 20)],
                         jnp.ones(2))
    ref = M.rank_metrics(scores, targets, [("HITRATE", 5), ("NDCG", 5)],
                         jnp.ones(2))
    assert float(big["HITRATE@20"]) == float(ref["HITRATE@5"]) == 2.0
    assert float(big["NDCG@20"]) == pytest.approx(float(ref["NDCG@5"]))
