"""Smoke tests: LESSR (session graphs) and SEvo (smoothed optimizer)."""

import jax
import jax.numpy as jnp
import numpy as np

from test_models_smoke import _first_batch, _fit_loss


def test_lessr_graph_builder(tiny_dataset):
    from recboard_tpu.models.zoo import LESSR
    from recboard_tpu.models.zoo.lessr import (
        EOPDeg,
        EOPNbr,
        LastNode,
        NodeItems,
        NodeMask,
        Pos2Node,
        ShortMask,
    )

    model = LESSR(tiny_dataset, maxlen=8, embedding_dim=16, dropout_rate=0.0)
    batch = next(iter(model.sure_trainpipe(8, 4).set_seed(0)))
    L = 8
    assert batch[NodeItems].shape == (4, L)
    assert batch[EOPNbr].shape == (4, L, L - 1)
    assert batch[ShortMask].shape == (4, L, L)
    # node items are unique per row among valid entries
    nm = batch[NodeMask].astype(bool)
    for b in range(4):
        vals = batch[NodeItems][b][nm[b]]
        assert len(set(vals.tolist())) == len(vals)
        # edge degrees consistent with valid positions
        n_pos = (np.asarray(batch[model.ISeq][b]) != 0).sum()
        assert batch[EOPDeg][b].sum() == max(0, n_pos - 1)


def test_lessr_trains(tiny_dataset):
    from recboard_tpu.models.zoo import LESSR

    model = LESSR(
        tiny_dataset, maxlen=8, embedding_dim=16, num_layers=2, dropout_rate=0.0,
        batch_norm=True,
    )
    batch = _first_batch(model.sure_trainpipe(8, 8))
    losses, params = _fit_loss(model, batch, steps=20, lr=0.01)
    assert losses[-1] < losses[0]
    eval_batch = _first_batch(model.sure_validpipe(8, "full", batch_size=4))
    scores = model.apply(
        {"params": params}, eval_batch, None, method="recommend_from_full"
    )
    assert scores.shape == (4, model.Item.count)


def test_smoother_and_item_graph(tiny_dataset):
    from recboard_tpu import optims

    adj = optims.build_item_graph(tiny_dataset, hops=2, num_pads=1)
    n = tiny_dataset.fields["ITEM", "ID"].count + 1
    assert adj.shape == (n, n)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, 4)), jnp.float32)
    sm = optims.make_smoother(adj, beta=0.9, L=2)
    y = sm(x)
    assert y.shape == x.shape
    # smoothing is a contraction toward neighborhood means, not identity
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_sevo_coach_trains(tiny_dataset, tmp_path):
    import os

    from recboard_tpu.models.zoo import SEvo, SEvoCoach
    from recboard_tpu.parser import Parser

    p = Parser()
    p.set_defaults(
        description="SEvo", root="x", dataset="tiny", epochs=2, batch_size=16,
        lr=1e-2, eval_freq=5, log2file=False, log2console=False,
        log_path=str(tmp_path / "l"), checkpoint_path=str(tmp_path / "i"),
        monitors=["LOSS"], which4best="LOSS",
    )
    cfg = p.compile([])
    model = SEvo(tiny_dataset, maxlen=8, embedding_dim=16, num_blocks=1,
                 dropout_rate=0.0)
    coach = SEvoCoach(
        dataset=tiny_dataset,
        trainpipe=model.sure_trainpipe(8, 16),
        validpipe=None,
        testpipe=None,
        model=model,
        cfg=cfg,
    )
    for epoch in range(2):
        coach.train(epoch)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert losses[-1] < losses[0]
