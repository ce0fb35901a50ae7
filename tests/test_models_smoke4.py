"""Smoke tests: graph CF batch (GCN/NGCF/SimGCL/SGL/GTE) and FPMC."""

import jax.numpy as jnp
import numpy as np
import pytest

from test_models_smoke import _first_batch, _fit_loss


@pytest.mark.parametrize("name", ["GCN", "NGCF", "SimGCL", "SGL"])
def test_graph_models_train(tiny_dataset, name):
    from recboard_tpu.models.zoo import REGISTRY

    cls = REGISTRY[name]
    model = cls(
        tiny_dataset, embedding_dim=16, num_layers=2, adj=cls.build_adj(tiny_dataset)
    )
    batch = _first_batch(model.sure_trainpipe(16))
    losses, params = _fit_loss(model, batch, steps=20)
    assert losses[-1] < losses[0]
    u, i = model.apply({"params": params}, method="reset_ranking_buffers")
    assert u.shape[0] == model.User.count
    assert i.shape[0] == model.Item.count
    eval_batch = _first_batch(model.sure_validpipe("full", batch_size=4))
    scores = model.apply(
        {"params": params},
        eval_batch,
        (u, i),
        method="recommend_from_full",
    )
    assert scores.shape == (4, model.Item.count)


def test_gte_training_free(tiny_dataset):
    import jax

    from recboard_tpu.models.zoo import GTE

    model = GTE(tiny_dataset, num_layers=2, adj=GTE.build_adj(tiny_dataset))
    batch = _first_batch(model.sure_trainpipe(8))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch
    )["params"]
    u, i = model.apply({"params": params}, method="reset_ranking_buffers")
    assert u.shape == (model.User.count, model.Item.count)
    # propagation actually spreads mass: user rows are nonzero
    assert float(jnp.abs(u).sum()) > 0


def test_fpmc(tiny_dataset):
    from recboard_tpu.models.zoo import FPMC

    model = FPMC(tiny_dataset, embedding_dim=16)
    batch = _first_batch(model.sure_trainpipe(8, 8))
    assert batch[model.ISeq].shape == (8, 1)  # last transition only
    losses, params = _fit_loss(model, batch, steps=25)
    assert losses[-1] < losses[0]
    eval_batch = _first_batch(model.sure_validpipe(8, "full", batch_size=4))
    scores = model.apply(
        {"params": params}, eval_batch, None, method="recommend_from_full"
    )
    assert scores.shape == (4, model.Item.count)
