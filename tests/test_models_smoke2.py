"""Smoke tests for the second model batch (BERT4Rec/NeuMF/STAMP/Caser)."""

import jax
import jax.numpy as jnp
import numpy as np

from test_models_smoke import _first_batch, _fit_loss


def test_bert4rec(tiny_dataset):
    from recboard_tpu.models.zoo import BERT4Rec

    model = BERT4Rec(
        tiny_dataset, maxlen=12, embedding_dim=16, num_blocks=1, num_heads=2,
        dropout_rate=0.0, mask_ratio=0.4,
    )
    batch = _first_batch(model.sure_trainpipe(12, 8))
    losses, params = _fit_loss(model, batch, steps=25)
    assert losses[-1] < losses[0]
    eval_batch = _first_batch(model.sure_validpipe(12, "full", batch_size=4))
    # rightmost position is MASK
    assert (np.asarray(eval_batch[model.ISeq])[:, -1] == model.MASKING_VALUE).all()
    scores = model.apply(
        {"params": params}, eval_batch, None, method="recommend_from_full"
    )
    assert scores.shape == (4, model.Item.count)


def test_neumf(tiny_dataset):
    from recboard_tpu.models.zoo import NeuMF

    model = NeuMF(tiny_dataset, embedding_dim=8, hidden_dims=(16, 8), num_negs=2,
                  item_chunk=16)
    batch = _first_batch(model.sure_trainpipe(16))
    losses, params = _fit_loss(model, batch, steps=25)
    assert losses[-1] < losses[0]
    eval_batch = _first_batch(model.sure_validpipe("full", batch_size=4))
    scores = model.apply(
        {"params": params}, eval_batch, None, method="recommend_from_full"
    )
    assert scores.shape == (4, model.Item.count)
    # chunked full scoring == pool scoring on the same candidates
    cands = jnp.arange(5)[None].repeat(4, 0)
    pool = model.apply(
        {"params": params},
        {model.User: eval_batch[model.User], model.IUnseen: cands},
        None,
        method="recommend_from_pool",
    )
    np.testing.assert_allclose(
        np.asarray(scores[:, :5]), np.asarray(pool), rtol=1e-5, atol=1e-6
    )


def test_stamp(tiny_dataset):
    from recboard_tpu.models.zoo import STAMP

    model = STAMP(tiny_dataset, maxlen=12, embedding_dim=16, hidden_size=16)
    batch = _first_batch(model.sure_trainpipe(12, 8))
    losses, params = _fit_loss(model, batch, steps=25)
    assert losses[-1] < losses[0]
    eval_batch = _first_batch(model.sure_validpipe(12, "full", batch_size=4))
    scores = model.apply(
        {"params": params}, eval_batch, None, method="recommend_from_full"
    )
    assert scores.shape == (4, model.Item.count)


def test_caser(tiny_dataset):
    from recboard_tpu.models.zoo import Caser

    model = Caser(
        tiny_dataset, maxlen=8, embedding_dim=16, num_vert=2, num_horiz=4,
        dropout_rate=0.0, num_poss=2, num_negs=2,
    )
    batch = _first_batch(model.sure_trainpipe(8, 8))
    assert batch[model.IPos].shape == (8, 2)
    assert batch[model.INeg].shape == (8, 2)
    losses, params = _fit_loss(model, batch, steps=25)
    assert losses[-1] < losses[0]
    eval_batch = _first_batch(model.sure_validpipe(8, "full", batch_size=4))
    scores = model.apply(
        {"params": params}, eval_batch, None, method="recommend_from_full"
    )
    assert scores.shape == (4, model.Item.count)
