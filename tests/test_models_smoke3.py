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
    all_bias = stacked.apply(params, ts)  # (B, L, L, NB)
    assert all_bias.shape == (2, L, L, NB)
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
            np.asarray(all_bias[..., b]), np.asarray(ref), rtol=1e-5, atol=1e-6
        )
