"""Per-model smoke tests: one train step decreases loss on repeat, and
full/pool scoring shapes are right. Fast versions of the benchmark runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recboard_tpu.data.pipes import Size


def _first_batch(pipe):
    batch = next(iter(pipe.set_seed(0)))
    return {
        f: jnp.asarray(v)
        for f, v in batch.items()
        if isinstance(v, np.ndarray) and f != Size
    }


def _fit_loss(model, batch, steps=30, lr=0.05):
    import optax

    params = model.init(
        {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "sampling": jax.random.PRNGKey(2),
        },
        batch,
    )["params"]
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, rng):
        (loss, _), g = jax.value_and_grad(
            lambda p: model.apply(
                {"params": p},
                batch,
                method="fit",
                rngs={"dropout": rng, "sampling": jax.random.fold_in(rng, 1)},
            ),
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    losses = []
    for i in range(steps):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
        losses.append(float(loss))
    return losses, params


def test_sasrec_overfits_batch(tiny_dataset):
    from recboard_tpu.models.zoo import SASRec

    model = SASRec(tiny_dataset, maxlen=12, embedding_dim=32, num_blocks=2,
                   dropout_rate=0.0)
    batch = _first_batch(model.sure_trainpipe(12, 8))
    losses, params = _fit_loss(model, batch)
    assert losses[-1] < losses[0] * 0.7

    eval_batch = _first_batch(model.sure_validpipe(12, "full", batch_size=8))
    scores = model.apply(
        {"params": params}, eval_batch, None, method="recommend_from_full"
    )
    assert scores.shape == (8, model.Item.count)


def test_gru4rec_overfits_batch(tiny_dataset):
    from recboard_tpu.models.zoo import GRU4Rec

    model = GRU4Rec(
        tiny_dataset, maxlen=12, embedding_dim=16, hidden_size=32,
        emb_dropout_rate=0.0, hidden_dropout_rate=0.0,
    )
    batch = _first_batch(model.sure_trainpipe(12, 8))
    losses, params = _fit_loss(model, batch)
    assert losses[-1] < losses[0] * 0.8
    eval_batch = _first_batch(model.sure_validpipe(12, "full", batch_size=4))
    scores = model.apply(
        {"params": params}, eval_batch, None, method="recommend_from_full"
    )
    assert scores.shape == (4, model.Item.count)


def test_lightgcn_propagation_and_fit(tiny_dataset):
    from recboard_tpu.models.zoo import LightGCN

    adj = tiny_dataset.train().to_normalized_adj("sym")
    model = LightGCN(tiny_dataset, embedding_dim=16, num_layers=2, adj=adj)
    batch = _first_batch(model.sure_trainpipe(16))
    losses, params = _fit_loss(model, batch, steps=25)
    assert losses[-1] < losses[0]
    u, i = model.apply({"params": params}, method="reset_ranking_buffers")
    assert u.shape == (model.User.count, 16)
    assert i.shape == (model.Item.count, 16)


def test_lightgcn_spmm_matches_dense(tiny_dataset):
    adj = tiny_dataset.train().to_normalized_adj("sym")
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(adj.shape[1], 8)), jnp.float32
    )
    got = adj @ x
    want = adj.to_dense() @ x
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # sym-normalized bipartite adj is symmetric
    np.testing.assert_allclose(
        np.asarray(adj.to_dense()), np.asarray(adj.to_dense()).T, atol=1e-6
    )
