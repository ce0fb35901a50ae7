"""Smoke tests: CCFRec (sem-id + QFormer) and E4SRec (LoRA LLM)."""

import jax
import numpy as np

from test_models_smoke import _first_batch, _fit_loss


def test_pca_reduce():
    from recboard_tpu.models.zoo.ccfrec import pca_reduce

    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 10)) @ np.diag([5, 3] + [0.1] * 8)
    y = pca_reduce(x, 2, whiten=True)
    assert y.shape == (50, 2)
    # whitened: unit variance per component
    np.testing.assert_allclose(y.std(axis=0), 1.0, rtol=0.1)


def test_ccfrec(tiny_dataset):
    from recboard_tpu.models.zoo import CCFRec
    from recboard_tpu.models.zoo.ccfrec import pca_reduce
    from recboard_tpu.sem.kmeans import residual_kmeans_sids

    I = tiny_dataset.fields["ITEM", "ID"].count
    rng = np.random.default_rng(0)
    raw = rng.normal(size=(I, 24)).astype(np.float32)
    codes = residual_kmeans_sids(raw, num_codebooks=2, num_codewords=6, iters=4)
    feats = pca_reduce(raw, 16)[:, None, :]  # (I, 1 field, D)
    model = CCFRec(
        tiny_dataset, sem_codes=codes, text_features=feats, maxlen=8,
        embedding_dim=16, hidden_size=32, num_qformer_blocks=1,
        num_encoder_blocks=1, num_negs=8, qformer_dropout_rate=0.0,
        encoder_dropout_rate=0.0,
    )
    batch = _first_batch(model.sure_trainpipe(8, 8))
    losses, params = _fit_loss(model, batch, steps=20, lr=0.01)
    assert losses[-1] < losses[0]
    buffers = model.apply({"params": params}, method="reset_ranking_buffers")
    assert buffers.shape == (I + 2, 16)
    eval_batch = _first_batch(model.sure_validpipe(8, "full", batch_size=4))
    scores = model.apply(
        {"params": params}, eval_batch, buffers, method="recommend_from_full"
    )
    assert scores.shape == (4, I)


def test_e4srec(tiny_dataset):
    from recboard_tpu.models.zoo import E4SRec

    I = tiny_dataset.fields["ITEM", "ID"].count
    feats = np.random.default_rng(0).normal(size=(I, 12)).astype(np.float32)
    model = E4SRec(
        tiny_dataset, item_features=feats, maxlen=8, backbone_dim=32,
        num_blocks=1, num_heads=2, lora_rank=4,
    )
    batch = _first_batch(model.sure_trainpipe(8, 8))
    losses, params = _fit_loss(model, batch, steps=20, lr=0.01)
    assert losses[-1] < losses[0]
    # freezing protocol: base kernels labeled frozen, LoRA trainable
    labels = model.trainable_labels(params)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    froz = {"/".join(str(getattr(k, "key", k)) for k in p): v for p, v in flat}
    assert any("lora_A" in k and v == "trainable" for k, v in froz.items())
    assert any("base_kernel" in k and v == "frozen" for k, v in froz.items())
    eval_batch = _first_batch(model.sure_validpipe(8, "full", batch_size=4))
    scores = model.apply(
        {"params": params}, eval_batch, None, method="recommend_from_full"
    )
    assert scores.shape == (4, I)
