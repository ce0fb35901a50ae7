"""Smoke tests: multimodal family (MMGCN, LATTICE, FREEDOM, BM3, MGCN)."""

import numpy as np
import pytest

from test_models_smoke import _first_batch, _fit_loss


@pytest.fixture(scope="module")
def mm_feats(tiny_dataset):
    I = tiny_dataset.fields["ITEM", "ID"].count
    rng = np.random.default_rng(1)
    v = rng.normal(size=(I, 12)).astype(np.float32)
    t = rng.normal(size=(I, 20)).astype(np.float32)
    return v, t


def test_knn_graph_helpers(mm_feats):
    from recboard_tpu.models.zoo.multimodal import knn_graph_np, knn_propagate
    import jax.numpy as jnp

    v, _ = mm_feats
    idx, w = knn_graph_np(v, 4)
    assert idx.shape == (v.shape[0], 4) and w.shape == idx.shape
    # self is always the nearest neighbor of itself (cos sim 1)
    assert (idx == np.arange(v.shape[0])[:, None]).any(axis=1).all()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(v.shape[0], 8)), jnp.float32)
    y = knn_propagate(x, jnp.asarray(idx), jnp.asarray(w))
    # equivalent dense computation
    dense = np.zeros((v.shape[0], v.shape[0]), np.float32)
    np.put_along_axis(dense, idx, w, axis=1)
    np.testing.assert_allclose(np.asarray(y), dense @ np.asarray(x), atol=1e-4)


def test_mmgcn(tiny_dataset, mm_feats):
    from recboard_tpu.models.zoo import REGISTRY

    v, t = mm_feats
    cls = REGISTRY["MMGCN"]
    model = cls(
        tiny_dataset, embedding_dim=16, num_layers=2, vfeat_hidden=8,
        adj=cls.build_adj(tiny_dataset), vfeats=v, tfeats=t,
    )
    batch = _first_batch(model.sure_trainpipe(16))
    losses, params = _fit_loss(model, batch, steps=15)
    assert losses[-1] < losses[0]


def test_lattice(tiny_dataset, mm_feats):
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.models.zoo.multimodal import knn_graph_np

    v, t = mm_feats
    cls = REGISTRY["LATTICE"]
    model = cls(
        tiny_dataset, embedding_dim=16, knn_k=4,
        adj=cls.build_adj(tiny_dataset), vfeats=v, tfeats=t,
        v_origin=knn_graph_np(v, 4), t_origin=knn_graph_np(t, 4),
    )
    batch = _first_batch(model.sure_trainpipe(16))
    losses, params = _fit_loss(model, batch, steps=15)
    assert losses[-1] < losses[0]


def test_freedom(tiny_dataset, mm_feats):
    from recboard_tpu.models.zoo import REGISTRY

    v, t = mm_feats
    cls = REGISTRY["FREEDOM"]
    model = cls(
        tiny_dataset, embedding_dim=16, knn_k=4,
        adj=cls.build_adj(tiny_dataset), vfeats=v, tfeats=t,
        m_knn=cls.build_m_knn(v, t, knn_k=4),
    )
    batch = _first_batch(model.sure_trainpipe(16))
    losses, params = _fit_loss(model, batch, steps=15)
    assert losses[-1] < losses[0]
    u, it = model.apply({"params": params}, method="reset_ranking_buffers")
    assert u.shape[0] == model.User.count


def test_bm3(tiny_dataset, mm_feats):
    from recboard_tpu.models.zoo import REGISTRY

    v, t = mm_feats
    cls = REGISTRY["BM3"]
    model = cls(
        tiny_dataset, embedding_dim=16, dropout_rate=0.3,
        adj=cls.build_adj(tiny_dataset), vfeats=v, tfeats=t,
    )
    batch = _first_batch(model.sure_trainpipe(16))
    losses, params = _fit_loss(model, batch, steps=20)
    assert losses[-1] < losses[0]


def test_mgcn(tiny_dataset, mm_feats):
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.models.zoo.multimodal import knn_graph_np

    v, t = mm_feats
    cls = REGISTRY["MGCN"]
    model = cls(
        tiny_dataset, embedding_dim=16, knn_k=4,
        adj=cls.build_adj(tiny_dataset), r_adj=cls.build_r_adj(tiny_dataset),
        vfeats=v, tfeats=t, v_knn=knn_graph_np(v, 4), t_knn=knn_graph_np(t, 4),
    )
    batch = _first_batch(model.sure_trainpipe(16))
    losses, params = _fit_loss(model, batch, steps=15)
    assert losses[-1] < losses[0]
