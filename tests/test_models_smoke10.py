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


def test_e4srec_eight_bit(tiny_dataset, tmp_path):
    """eight_bit=True: int8 backbone weights live in the 'quant'
    collection (bitsandbytes load_in_8bit analogue), the optimizer never
    sees them, LoRA still learns, and the quantized forward stays close
    to a float backbone sharing the same dequantized weights."""
    import jax
    import jax.numpy as jnp
    import optax

    from recboard_tpu.models.zoo import E4SRec

    I = tiny_dataset.fields["ITEM", "ID"].count
    feats = np.random.default_rng(0).normal(size=(I, 12)).astype(np.float32)
    kw = dict(item_features=feats, maxlen=8, backbone_dim=32,
              num_blocks=1, num_heads=2, lora_rank=4)
    model = E4SRec(tiny_dataset, eight_bit=True, **kw)
    batch = _first_batch(model.sure_trainpipe(8, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sampling": jax.random.PRNGKey(2)}, batch,
    )
    params, quant = variables["params"], variables["quant"]
    # int8 storage, per-output-channel scales
    q = quant["block_0"]["q_proj"]["base_kernel"]
    assert q["q8"].dtype == jnp.int8 and q["scale"].shape == (32,)
    # no float base kernels among the trainable params
    names = ["/".join(str(getattr(k, "key", k)) for k, *_ in [p]) + str(p)
             for p, _ in jax.tree_util.tree_leaves_with_path(params)]
    assert not any("base_kernel" in n for n in names)

    # quantized forward ~ float forward with the dequantized weights
    deq_params = jax.tree.map(lambda x: x, params)
    m_float = E4SRec(tiny_dataset, eight_bit=False, **kw)
    fp = m_float.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sampling": jax.random.PRNGKey(2)}, batch,
    )["params"]
    # transplant: shared params + dequantized base kernels
    import flax
    fp = flax.core.unfreeze(fp) if hasattr(flax.core, "unfreeze") else dict(fp)
    def put(tree, path, val):
        node = tree
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = val
    for blk in ["block_0"]:
        for proj in ["q_proj", "k_proj", "v_proj", "o_proj"]:
            qq = quant[blk][proj]["base_kernel"]
            deq = qq["q8"].astype(jnp.float32) * qq["scale"][None, :]
            put(fp, (blk, proj, "base_kernel"), deq)
            for lk in ("lora_A", "lora_B"):
                put(fp, (blk, proj, lk), params[blk][proj][lk])
    for key in params:
        if key != "block_0":
            fp[key] = params[key]
    s_q = model.apply({"params": params, "quant": quant},
                      batch, None, method="recommend_from_full")
    s_f = m_float.apply({"params": fp}, batch, None,
                        method="recommend_from_full")
    np.testing.assert_allclose(np.asarray(s_q), np.asarray(s_f),
                               atol=1e-4, rtol=1e-4)

    # end-to-end through the Coach: quant collection rides
    # TrainState.stats and survives training + eval
    from recboard_tpu.launcher import Coach
    from recboard_tpu.parser import Parser

    p = Parser()
    p.set_defaults(description="E4SRec", root="x", dataset="tiny", epochs=3,
                   batch_size=16, lr=5e-3, eval_freq=10, log2file=False,
                   log2console=False, log_path=str(tmp_path / "l"),
                   checkpoint_path=str(tmp_path / "i"),
                   monitors=["LOSS"], which4best="LOSS", seed=0)
    cfg = p.compile([])
    coach = Coach(dataset=tiny_dataset,
                  trainpipe=model.sure_trainpipe(8, 16),
                  validpipe=None, testpipe=None, model=model, cfg=cfg)
    coach.train(0)
    assert "quant" in coach.state.stats
    q_start = np.asarray(
        coach.state.stats["quant"]["block_0"]["q_proj"]["base_kernel"]["q8"]
    )
    for epoch in range(1, 5):
        coach.train(epoch)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert np.isfinite(losses).all() and min(losses[1:]) < losses[0]
    # the int8 backbone never trains — bit-identical across epochs
    q_after = coach.state.stats["quant"]["block_0"]["q_proj"]["base_kernel"]["q8"]
    np.testing.assert_array_equal(np.asarray(q_after), q_start)


def test_e4srec_coach_partial_save_load(tiny_dataset, tmp_path):
    """E4SRecCoach persists ONLY the trainable subset (adaptor/LoRA/
    head/LN — E4SRec/main.py:215-246); loading merges it over fresh
    params, leaving the frozen backbone untouched."""
    import os

    import jax
    import jax.numpy as jnp

    from recboard_tpu.models.zoo import E4SRec
    from recboard_tpu.models.zoo.e4srec import E4SRecCoach
    from recboard_tpu.parser import Parser
    from recboard_tpu import utils

    I = tiny_dataset.fields["ITEM", "ID"].count
    feats = np.random.default_rng(0).normal(size=(I, 12)).astype(np.float32)
    model = E4SRec(tiny_dataset, item_features=feats, maxlen=8,
                   backbone_dim=32, num_blocks=1, num_heads=2, lora_rank=4)
    assert getattr(type(model), "COACH", None) is E4SRecCoach

    p = Parser()
    p.set_defaults(description="E4SRec", root="x", dataset="tiny", epochs=2,
                   batch_size=16, lr=5e-3, eval_freq=10, log2file=False,
                   log2console=False, log_path=str(tmp_path / "l"),
                   checkpoint_path=str(tmp_path / "i"),
                   monitors=["LOSS"], which4best="LOSS", seed=0)
    cfg = p.compile([])
    coach = E4SRecCoach(dataset=tiny_dataset,
                        trainpipe=model.sure_trainpipe(8, 16),
                        validpipe=None, testpipe=None, model=model, cfg=cfg)
    coach.train(0)
    coach.save("partial.pkl")

    payload = utils.import_pickle(os.path.join(cfg.CHECKPOINT_PATH, "partial.pkl"))
    assert payload["partial"]
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_leaves_with_path(
            payload["params"], is_leaf=lambda x: x is None
        )
    }
    assert any("lora_A" in n and v is not None for n, v in flat.items())
    assert all(v is None for n, v in flat.items() if "base_kernel" in n)

    # perturb then load: trainable params restore, frozen stay perturbed
    before = jax.tree.map(np.asarray, coach.state.params)
    from recboard_tpu.launcher.coach import TrainState
    coach.state = TrainState(
        jax.tree.map(lambda x: x + 1.0, coach.state.params),
        coach.state.opt_state, coach.state.step, coach.state.stats,
    )
    coach.load(filename="partial.pkl")
    after = jax.tree.map(np.asarray, coach.state.params)
    np.testing.assert_allclose(
        after["adaptor"]["kernel"], before["adaptor"]["kernel"], rtol=1e-6
    )
    bk_b = before["block_0"]["q_proj"]["base_kernel"]
    bk_a = after["block_0"]["q_proj"]["base_kernel"]
    np.testing.assert_allclose(np.asarray(bk_a), np.asarray(bk_b) + 1.0, rtol=1e-6)
