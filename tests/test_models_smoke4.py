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


def test_sevo_optimizer_variants(tiny_dataset):
    """SEvo smoothing injected into all three reference optimizer
    variants (SEvo/optims/{Adam,AdamW,SGD}.py): each trains and the
    smoothed branch actually differs from the plain one."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from recboard_tpu import optims
    from recboard_tpu.models.zoo import REGISTRY

    SEvo = REGISTRY["SEvo"]
    model = SEvo(tiny_dataset, maxlen=8, embedding_dim=16, num_blocks=1)
    adj = optims.build_item_graph(tiny_dataset, num_pads=model.NUM_PADS)

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: "smooth"
            if "item_embeddings" in "/".join(str(getattr(k, "key", k)) for k in p)
            else "plain",
            params,
        )

    rng = np.random.default_rng(0)
    params = {
        "item_embeddings": {"embedding": jnp.asarray(
            rng.normal(size=(model.Item.count + 1, 16)), jnp.float32)},
        "other": jnp.asarray(rng.normal(size=(16, 16)), jnp.float32),
    }
    grads = jax.tree.map(lambda x: jnp.ones_like(x) * 0.1, params)

    outs = {}
    for kind in ("adam", "adamw", "sgd"):
        tx = optims.sevo_optimizer(
            1e-2, adj, label_fn, kind=kind, weight_decay=1e-2, momentum=0.9,
        )
        state = tx.init(params)
        up, _ = tx.update(grads, state, params)
        outs[kind] = up
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(up))
    # adam vs adamw differ only in decay placement; sgd differs more
    a = np.asarray(outs["adam"]["other"])
    w = np.asarray(outs["adamw"]["other"])
    s = np.asarray(outs["sgd"]["other"])
    assert not np.allclose(a, s)
    assert not np.allclose(a, w)
