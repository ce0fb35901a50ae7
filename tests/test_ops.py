"""Kernel equivalence tests: Pallas (interpret mode on CPU) vs the jnp
reference implementation (SURVEY.md §7 — every kernel ships with a
pure-jnp reference and an equivalence test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recboard_tpu.ops import attention as A


@pytest.mark.parametrize("heads", [1, 2])
@pytest.mark.parametrize("causal", [True, False])
def test_mha_pallas_matches_reference(heads, causal):
    rng = np.random.default_rng(0)
    B, L, D = 3, 10, 16
    q = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    pad = jnp.asarray(rng.random((B, L)) < 0.3)
    pad = pad.at[:, -1].set(False)  # keep at least one valid key
    ref = A.mha_reference(q, k, v, heads, causal, key_padding_mask=pad)
    got = A.mha_pallas(q, k, v, heads, causal, key_padding_mask=pad, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_mha_reference_causality():
    """Changing future keys must not affect earlier outputs."""
    rng = np.random.default_rng(1)
    B, L, D = 2, 8, 8
    q = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    out1 = A.mha_reference(q, k, v, 1, causal=True)
    k2 = k.at[:, -1].set(99.0)
    v2 = v.at[:, -1].set(99.0)
    out2 = A.mha_reference(q, k2, v2, 1, causal=True)
    np.testing.assert_allclose(
        np.asarray(out1[:, :-1]), np.asarray(out2[:, :-1]), atol=1e-6
    )
    assert not np.allclose(out1[:, -1], out2[:, -1])


def test_mha_bias():
    rng = np.random.default_rng(2)
    B, H, L, D = 2, 2, 6, 8
    q = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(B, H, L, L)), jnp.float32)
    ref = A.mha_reference(q, q, q, H, causal=False, bias=bias)
    got = A.mha_pallas(q, q, q, H, causal=False, bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_sampled_softmax_scan_matches_reference():
    from recboard_tpu.ops import losses as L

    rng = np.random.default_rng(0)
    M, C, D, N = 1100, 7, 16, 40
    user = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, N, size=(M, C)), jnp.int32)
    table = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    w = jnp.asarray((rng.random(M) < 0.8), jnp.float32)
    a = L.sampled_softmax_loss_reference(user, ids, table, w, 0.1)
    b = L.sampled_softmax_loss(user, ids, table, w, 0.1, chunk=256)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)

    ga = jax.grad(
        lambda u, t: L.sampled_softmax_loss_reference(u, ids, t, w, 0.1),
        argnums=(0, 1),
    )(user, table)
    gb = jax.grad(
        lambda u, t: L.sampled_softmax_loss(u, ids, t, w, 0.1, chunk=256),
        argnums=(0, 1),
    )(user, table)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]), atol=1e-5)


def test_sampled_softmax_pallas_interpret():
    from recboard_tpu.ops import losses as L

    rng = np.random.default_rng(1)
    M, C, D, N = 64, 5, 8, 16
    user = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, N, size=(M, C)), jnp.int32)
    table = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    w = jnp.ones(M, jnp.float32)
    a = L.sampled_softmax_loss_reference(user, ids, table, w, 1.0)
    b = L.sampled_softmax_loss_pallas(user, ids, table, w, 1.0, block=32, interpret=True)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_sampled_softmax_shared_matches_reference():
    # Shared negatives == per-position variant when every row is handed
    # the SAME candidate list [pos; negs].
    from recboard_tpu.ops import losses as L

    rng = np.random.default_rng(7)
    M, K, D, N = 48, 9, 8, 32
    user = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, N, size=(M,)), jnp.int32)
    negs = jnp.asarray(rng.integers(0, N, size=(K,)), jnp.int32)
    table = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    w = jnp.asarray(rng.integers(0, 2, size=(M,)), jnp.float32)
    ids = jnp.concatenate([pos[:, None], jnp.tile(negs[None, :], (M, 1))], axis=1)
    a = L.sampled_softmax_loss_reference(user, ids, table, w, 0.3)
    b = L.sampled_softmax_loss_shared(user, pos, negs, table, w, 0.3)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)
    ga = jax.grad(lambda t: L.sampled_softmax_loss_reference(user, ids, t, w, 0.3))(table)
    gb = jax.grad(lambda t: L.sampled_softmax_loss_shared(user, pos, negs, t, w, 0.3))(table)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)


def test_hstu_shared_negs_learns(tiny_dataset):
    from recboard_tpu.data.device import DeviceTimeSeqSampler
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import HSTU
    from recboard_tpu.parser import Parser
    import tempfile, os

    model = HSTU(tiny_dataset, maxlen=8, num_blocks=1, num_heads=2,
                 embedding_dim=16, num_negs=16, temperature=0.2,
                 shared_negs=True)
    sampler = DeviceTimeSeqSampler(tiny_dataset, maxlen=8, batch_size=16)
    tmp = tempfile.mkdtemp()
    p = Parser()
    p.set_defaults(description="HSTU", root="x", dataset="tiny", epochs=3,
                   batch_size=16, lr=5e-3, eval_freq=10, log2file=False,
                   log2console=False, log_path=os.path.join(tmp, "l"),
                   checkpoint_path=os.path.join(tmp, "i"),
                   monitors=["LOSS"], which4best="LOSS", seed=0)
    cfg = p.compile([])
    coach = Coach(dataset=tiny_dataset, trainpipe=sampler, validpipe=None,
                  testpipe=None, model=model, cfg=cfg)
    for epoch in range(3):
        coach.train(epoch)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_dropout_cpu_fallback_semantics():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from recboard_tpu.ops.dropout import dropout

    x = jnp.ones((400, 64))
    key = jax.random.PRNGKey(0)
    # deterministic / rate 0 are identity
    np.testing.assert_array_equal(dropout(x, 0.2, key, deterministic=True), x)
    np.testing.assert_array_equal(dropout(x, 0.0, key), x)
    y = np.asarray(dropout(x, 0.25, key))
    zero_frac = (y == 0).mean()
    assert abs(zero_frac - 0.25) < 0.02
    np.testing.assert_allclose(np.unique(y[y != 0]), [1.0 / 0.75], rtol=1e-6)
    # gradient flows through the kept positions only, scaled
    g = jax.grad(lambda x: dropout(x, 0.25, key).sum())(x)
    np.testing.assert_allclose(np.asarray(g), y, rtol=1e-6)


def test_dropout_mask_pallas_tpu():
    import jax

    if jax.default_backend() != "tpu":
        import pytest

        pytest.skip("pallas hardware-PRNG kernel needs a TPU")
    import numpy as np

    from recboard_tpu.ops.dropout import dropout_mask

    m = np.asarray(dropout_mask(jax.random.PRNGKey(0), (1024, 50, 64), 0.2))
    assert abs((m == 0).mean() - 0.2) < 0.01
    np.testing.assert_allclose(np.unique(m[m != 0]), [1.25], rtol=1e-6)
    m2 = np.asarray(dropout_mask(jax.random.PRNGKey(0), (1024, 50, 64), 0.2))
    np.testing.assert_array_equal(m, m2)
