"""Smoke tests: JGCF, PairNorm, UltraGCN, SimpleX, AlphaRec, CAGCN."""

import numpy as np
import pytest

from test_models_smoke import _first_batch, _fit_loss


@pytest.mark.parametrize("name", ["JGCF", "PairNorm"])
def test_jacobi_pairnorm(tiny_dataset, name):
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


def test_ultragcn(tiny_dataset):
    from recboard_tpu.models.zoo import REGISTRY

    cls = REGISTRY["UltraGCN"]
    ub, ib, iiw, iii = cls.build_side_info(tiny_dataset, num_neighbors=4)
    assert ub.shape == (tiny_dataset.fields["USER", "ID"].count,)
    assert iiw.shape == (tiny_dataset.fields["ITEM", "ID"].count, 4)
    # co-occurrence neighbors are sorted descending
    assert (np.diff(iiw, axis=1) <= 1e-6).all()
    model = cls(
        tiny_dataset, embedding_dim=16, num_negs=8, num_neighbors=4,
        user_beta=ub, item_beta=ib, ii_weights=iiw, ii_indices=iii,
    )
    batch = _first_batch(model.sure_trainpipe(16))
    losses, params = _fit_loss(model, batch, steps=20)
    assert losses[-1] < losses[0]


def test_simplex(tiny_dataset):
    from recboard_tpu.models.zoo import REGISTRY

    cls = REGISTRY["SimpleX"]
    model = cls(
        tiny_dataset, embedding_dim=16, num_negs=8, dropout_rate=0.0,
        adj=cls.build_adj(tiny_dataset),
    )
    batch = _first_batch(model.sure_trainpipe(16))
    losses, params = _fit_loss(model, batch, steps=25)
    assert losses[-1] < losses[0]
    u, i = model.apply({"params": params}, method="reset_ranking_buffers")
    # cosine embeddings are unit-norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(i), axis=-1), 1.0, atol=1e-4
    )


def test_alpharec(tiny_dataset):
    from recboard_tpu.models.zoo import REGISTRY

    cls = REGISTRY["AlphaRec"]
    I = tiny_dataset.fields["ITEM", "ID"].count
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(I, 24)).astype(np.float32)
    item_f, user_f = cls.build_features(tiny_dataset, feats)
    model = cls(
        tiny_dataset, embedding_dim=16, num_layers=1, num_negs=8,
        adj=cls.build_adj(tiny_dataset),
        item_features=item_f, user_features_arr=user_f,
    )
    batch = _first_batch(model.sure_trainpipe(16))
    losses, params = _fit_loss(model, batch, steps=20)
    assert losses[-1] < losses[0]


def test_cagcn_adj_and_fit(tiny_dataset):
    from recboard_tpu.models.zoo import REGISTRY

    cls = REGISTRY["CAGCN"]
    adj = cls.build_adj(tiny_dataset, trend_type="jc")
    n = tiny_dataset.fields["USER", "ID"].count + tiny_dataset.fields["ITEM", "ID"].count
    assert adj.shape == (n, n)
    vals = np.asarray(adj.vals)
    assert np.isfinite(vals).all() and (vals >= 0).all()
    model = cls(tiny_dataset, embedding_dim=16, num_layers=2, adj=adj)
    batch = _first_batch(model.sure_trainpipe(16))
    losses, params = _fit_loss(model, batch, steps=20)
    assert losses[-1] < losses[0]
