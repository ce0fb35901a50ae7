"""Smoke tests: NARM, BSARec, STOSA, GLINT-RU, RUM."""

import jax.numpy as jnp
import numpy as np
import pytest

from test_models_smoke import _first_batch, _fit_loss


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("NARM", dict(embedding_dim=16, hidden_size=16, emb_dropout_rate=0.0,
                      hidden_dropout_rate=0.0, ct_dropout_rate=0.0)),
        ("BSARec", dict(embedding_dim=16, num_blocks=1, hidden_dropout_rate=0.0,
                        attn_dropout_rate=0.0, c=3)),
        ("GLINT-RU", dict(embedding_dim=16, hidden_size=16, emb_dropout_rate=0.0,
                          hidden_dropout_rate=0.0, attn_dropout_rate=0.0)),
    ],
)
def test_seq_models_full(tiny_dataset, name, kwargs):
    from recboard_tpu.models.zoo import REGISTRY

    model = REGISTRY[name](tiny_dataset, maxlen=10, **kwargs)
    batch = _first_batch(model.sure_trainpipe(10, 8))
    losses, params = _fit_loss(model, batch, steps=25, lr=0.02)
    assert losses[-1] < losses[0], f"{name} did not learn"
    eval_batch = _first_batch(model.sure_validpipe(10, "full", batch_size=4))
    scores = model.apply(
        {"params": params}, eval_batch, None, method="recommend_from_full"
    )
    assert scores.shape == (4, model.Item.count)


def test_stosa(tiny_dataset):
    from recboard_tpu.models.zoo import STOSA
    from recboard_tpu.models.zoo.stosa import (
        wasserstein_distance,
        wasserstein_distance_matmul,
    )

    # matmul decomposition == elementwise distance
    rng = np.random.default_rng(0)
    m1 = jnp.asarray(rng.normal(size=(3, 8)), jnp.float32)
    c1 = jnp.asarray(rng.random((3, 8)) + 0.5, jnp.float32)
    m2 = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)
    c2 = jnp.asarray(rng.random((5, 8)) + 0.5, jnp.float32)
    pairwise = wasserstein_distance_matmul(m1, c1, m2, c2)
    direct = wasserstein_distance(m1[0], c1[0], m2[2], c2[2])
    np.testing.assert_allclose(float(pairwise[0, 2]), float(direct), rtol=1e-4)

    model = STOSA(
        tiny_dataset, maxlen=10, embedding_dim=16, num_heads=2, num_blocks=1,
        hidden_dropout_rate=0.0,
    )
    batch = _first_batch(model.sure_trainpipe(10, 8))
    losses, params = _fit_loss(model, batch, steps=25, lr=0.01)
    assert losses[-1] < losses[0]
    eval_batch = _first_batch(model.sure_validpipe(10, "full", batch_size=4))
    scores = model.apply(
        {"params": params}, eval_batch, None, method="recommend_from_full"
    )
    assert scores.shape == (4, model.Item.count)
    assert bool(jnp.all(scores <= 0))  # negative distances


def test_rum_pool_only(tiny_dataset):
    from recboard_tpu.models.zoo import RUM

    model = RUM(tiny_dataset, maxlen=10, embedding_dim=16, dropout_rate=0.0)
    batch = _first_batch(model.sure_trainpipe(10, 8))
    losses, params = _fit_loss(model, batch, steps=25)
    assert losses[-1] < losses[0]
    eval_batch = _first_batch(model.sure_validpipe(10, "pool", batch_size=4))
    scores = model.apply(
        {"params": params}, eval_batch, None, method="recommend_from_pool"
    )
    assert scores.shape == (4, 101)
