"""Smoke tests for the third batch: FMLP-Rec and HSTU (incl. the
time-aware pipes and the relative time/position bias)."""

import jax.numpy as jnp
import numpy as np

from test_models_smoke import _first_batch, _fit_loss


def test_fmlp_rec(tiny_dataset):
    from recboard_tpu.models.zoo import FMLPRec

    model = FMLPRec(
        tiny_dataset, maxlen=12, embedding_dim=16, num_blocks=2,
        hidden_dropout_rate=0.0,
    )
    batch = _first_batch(model.sure_trainpipe(12, 8))
    losses, params = _fit_loss(model, batch, steps=25)
    assert losses[-1] < losses[0]
    eval_batch = _first_batch(model.sure_validpipe(12, "full", batch_size=4))
    scores = model.apply(
        {"params": params}, eval_batch, None, method="recommend_from_full"
    )
    assert scores.shape == (4, model.Item.count)


def test_hstu_time_pipes_aligned(tiny_dataset):
    from recboard_tpu.models.zoo import HSTU

    model = HSTU(
        tiny_dataset, maxlen=10, num_blocks=2, num_heads=2, embedding_dim=16,
        num_negs=8,
    )
    batch = _first_batch(model.sure_trainpipe(10, 8))
    seqs = np.asarray(batch[model.ISeq])
    times = np.asarray(batch[model.Time])
    pos = np.asarray(batch[model.IPos])
    assert seqs.shape == times.shape == pos.shape == (8, 10)
    # timestamps aligned with inputs: both padded identically
    np.testing.assert_array_equal(seqs == 0, times == 0)


def test_hstu_overfits_and_scores(tiny_dataset):
    from recboard_tpu.models.zoo import HSTU

    model = HSTU(
        tiny_dataset, maxlen=10, num_blocks=2, num_heads=2, embedding_dim=16,
        num_negs=16, temperature=0.2,
    )
    batch = _first_batch(model.sure_trainpipe(10, 8))
    losses, params = _fit_loss(model, batch, steps=30, lr=0.005)
    assert losses[-1] < losses[0]
    eval_batch = _first_batch(model.sure_validpipe(10, "full", batch_size=4))
    scores = model.apply(
        {"params": params}, eval_batch, None, method="recommend_from_full"
    )
    assert scores.shape == (4, model.Item.count)
    # normalized embeddings → bounded scores
    assert float(jnp.abs(scores).max()) <= 1.0 + 1e-5


def test_rel_bias_bucketization():
    from recboard_tpu.models.zoo.hstu import RelativeBucketedTimeAndPositionBias
    import jax

    mod = RelativeBucketedTimeAndPositionBias(maxlen=4, num_buckets=10)
    ts = jnp.asarray([[0, 1, 10, 100]])
    params = mod.init(jax.random.PRNGKey(0), ts)
    bias = mod.apply(params, ts)
    assert bias.shape == (1, 4, 4)
    # reference formula check: bias[m,n] - ts_bias == pos_w[n-m+L-1]
    pos_w = params["params"]["position_weights"]
    ts_w = params["params"]["timestamp_weights"]
    ext = jnp.concatenate([ts, ts[:, 3:4]], axis=1)
    diff = ext[:, 1:, None] - ext[:, None, :-1]
    bucket = jnp.clip(
        jnp.floor(jnp.log(jnp.maximum(jnp.abs(diff).astype(jnp.float32), 1.0)) / 0.301),
        0, 10,
    ).astype(jnp.int32)
    m, n = 2, 1
    expected = pos_w[n - m + 3] + ts_w[bucket[0, m, n]]
    np.testing.assert_allclose(float(bias[0, m, n]), float(expected), rtol=1e-6)


def test_stacked_rel_bias_matches_per_block():
    import jax

    from recboard_tpu.models.zoo.hstu import (
        RelativeBucketedTimeAndPositionBias,
        StackedRelBias,
    )

    L, K, NB = 6, 12, 3
    stacked = StackedRelBias(maxlen=L, num_buckets=K, num_blocks=NB)
    ts = jnp.asarray([[0, 3, 9, 40, 300, 301], [5, 6, 7, 8, 9, 100]])
    params = stacked.init(jax.random.PRNGKey(0), ts)
    all_bias = stacked.apply(params, ts)  # (NB, B, L, L)
    assert all_bias.shape == (NB, 2, L, L)
    single = RelativeBucketedTimeAndPositionBias(maxlen=L, num_buckets=K)
    for b in range(NB):
        sub = {
            "params": {
                "timestamp_weights": params["params"]["timestamp_weights"][b],
                "position_weights": params["params"]["position_weights"][b],
            }
        }
        ref = single.apply(sub, ts)  # (B, L, L)
        np.testing.assert_allclose(
            np.asarray(all_bias[b]), np.asarray(ref), rtol=1e-5, atol=1e-6
        )


def test_active_buckets_shrink_is_exact():
    """StackedRelBias with active_buckets = max reachable bucket + 1
    must match the full-width contraction bit-for-bit in value AND
    gradients (unreachable buckets get zero grads either way)."""
    import jax

    from recboard_tpu.models.zoo.hstu import StackedRelBias, max_reachable_bucket

    L, K, NB = 6, 200, 2
    max_ts = 5000
    active = min(K, max_reachable_bucket(max_ts)) + 1
    assert active < K + 1  # the shrink actually engages
    full = StackedRelBias(maxlen=L, num_buckets=K, num_blocks=NB)
    shrunk = StackedRelBias(
        maxlen=L, num_buckets=K, num_blocks=NB, active_buckets=active
    )
    rng = np.random.default_rng(3)
    ts = jnp.asarray(
        np.sort(rng.integers(0, max_ts + 1, (4, L)), axis=1), jnp.int32
    )
    params = full.init(jax.random.PRNGKey(0), ts)  # same param shapes

    out_full = full.apply(params, ts)
    out_shrunk = shrunk.apply(params, ts)
    np.testing.assert_array_equal(np.asarray(out_full), np.asarray(out_shrunk))

    def loss(mod):
        def f(p):
            out = mod.apply({"params": p}, ts)
            return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))
        return f

    g_full = jax.grad(loss(full))(params["params"])
    g_shrunk = jax.grad(loss(shrunk))(params["params"])
    for key in g_full:
        np.testing.assert_allclose(
            np.asarray(g_full[key]), np.asarray(g_shrunk[key]), rtol=1e-6, atol=0
        )
    # unreachable buckets: zero gradient on both paths
    assert np.abs(np.asarray(g_full["timestamp_weights"])[:, active:]).max() == 0


def test_hstu_derives_active_buckets(tiny_dataset):
    """HSTU bakes the dataset's reachable-bucket count into its bias."""
    import jax

    from recboard_tpu.data.tags import TIMESTAMP
    from recboard_tpu.models.zoo import HSTU
    from recboard_tpu.models.zoo.hstu import max_reachable_bucket

    model = HSTU(tiny_dataset, maxlen=8, num_blocks=1, num_heads=2,
                 linear_hidden_dim=4, attention_dim=4, num_buckets=128)
    ts_field = tiny_dataset.fields[TIMESTAMP]
    if ts_field is None:
        return  # fixture has no timestamp column; nothing to derive
    max_abs = tiny_dataset.column_abs_max(ts_field)
    want = min(128, max_reachable_bucket(max_abs)) + 1

    bound = model.bind(
        {"params": model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
             "sampling": jax.random.PRNGKey(2)},
            {model.ISeq: jnp.zeros((2, 8), jnp.int32),
             model.IPos: jnp.zeros((2, 8), jnp.int32),
             model.Time: jnp.zeros((2, 8), jnp.int32)},
            method="fit",
        )["params"]}
    )
    assert bound.rel_bias.active_buckets == want


def test_hstu_remat_matches_no_remat(tiny_dataset):
    """remat=True only changes the autodiff schedule, not values."""
    import jax

    from recboard_tpu.models.zoo import HSTU

    kw = dict(maxlen=10, num_blocks=2, num_heads=2, embedding_dim=16,
              num_negs=8, hidden_dropout_rate=0.0, emb_dropout_rate=0.0)
    m0 = HSTU(tiny_dataset, **kw)
    m1 = HSTU(tiny_dataset, remat=True, **kw)
    batch = _first_batch(m0.sure_trainpipe(10, 8))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "sampling": jax.random.PRNGKey(2)}
    p0 = m0.init(rngs, batch, method="fit")["params"]

    def loss(m):
        def f(p):
            return m.apply(
                {"params": p}, batch, method="fit",
                rngs={"dropout": jax.random.PRNGKey(3),
                      "sampling": jax.random.PRNGKey(4)},
            )[0]
        return f

    l0, g0 = jax.value_and_grad(loss(m0))(p0)
    l1, g1 = jax.value_and_grad(loss(m1))(p0)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
