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


def test_sampled_softmax_per_row_matches_reference():
    # Per-row negatives == per-position variant when every position of a
    # row is handed the SAME candidate list [pos; that row's negs].
    from recboard_tpu.ops import losses as L

    rng = np.random.default_rng(11)
    B, Ln, K, D, N = 6, 5, 9, 8, 32
    user = jnp.asarray(rng.normal(size=(B, Ln, D)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, N, size=(B, Ln)), jnp.int32)
    negs = jnp.asarray(rng.integers(0, N, size=(B, K)), jnp.int32)
    table = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    w = jnp.asarray(rng.integers(0, 2, size=(B, Ln)), jnp.float32)
    ids = jnp.concatenate(
        [pos[..., None], jnp.tile(negs[:, None, :], (1, Ln, 1))], axis=-1
    )  # (B, Ln, 1+K)
    a = L.sampled_softmax_loss_reference(
        user.reshape(B * Ln, D), ids.reshape(B * Ln, -1), table,
        w.reshape(-1), 0.3,
    )
    b = L.sampled_softmax_loss_per_row(user, pos, negs, table, w, 0.3)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)
    ga = jax.grad(
        lambda t: L.sampled_softmax_loss_reference(
            user.reshape(B * Ln, D), ids.reshape(B * Ln, -1), t,
            w.reshape(-1), 0.3,
        )
    )(table)
    gb = jax.grad(
        lambda t: L.sampled_softmax_loss_per_row(user, pos, negs, t, w, 0.3)
    )(table)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)


def test_hstu_per_row_negs_learns(tiny_dataset):
    from recboard_tpu.models.zoo import HSTU

    model = HSTU(tiny_dataset, maxlen=8, num_blocks=1, num_heads=2,
                 embedding_dim=16, num_negs=16, temperature=0.2,
                 negs_mode="per_row")
    import jax as _jax

    rng = np.random.default_rng(0)
    batch = {
        model.ISeq: jnp.asarray(rng.integers(1, 5, (4, 8)), jnp.int32),
        model.IPos: jnp.asarray(rng.integers(0, 4, (4, 8)), jnp.int32),
        model.Time: jnp.asarray(rng.integers(1, 100, (4, 8)), jnp.int32),
    }
    variables = model.init(
        {"params": _jax.random.PRNGKey(0), "dropout": _jax.random.PRNGKey(1),
         "sampling": _jax.random.PRNGKey(2)},
        batch, method="fit",
    )
    loss, logs = model.apply(
        variables, batch, method="fit",
        rngs={"dropout": _jax.random.PRNGKey(3),
              "sampling": _jax.random.PRNGKey(4)},
    )
    assert np.isfinite(float(loss)) and float(loss) > 0


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


def test_sampled_softmax_shared_fused_matches_autodiff():
    """Pallas fused shared-neg softmax (interpret mode): value and all
    four gradients must match autodiff of the jnp formulation."""
    from recboard_tpu.ops import losses as L

    rng = np.random.default_rng(11)
    M, K, D = 70, 12, 8  # M not a tile multiple → exercises padding
    user = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    neg = jnp.asarray(rng.normal(size=(K, D)), jnp.float32)
    w = jnp.asarray(rng.integers(0, 2, size=(M,)), jnp.float32)
    tau = 0.3

    def ref(user, pos, neg, w):
        pl_ = (user * pos).sum(-1) / tau
        nl = (user @ neg.T) / tau
        logz = jax.scipy.special.logsumexp(
            jnp.concatenate([pl_[:, None], nl], axis=1), axis=-1
        )
        return ((logz - pl_) * w).sum() / jnp.maximum(w.sum(), 1.0)

    def fused(user, pos, neg, w):
        return L.sampled_softmax_shared_fused(user, pos, neg, w, tau, True)

    a = ref(user, pos, neg, w)
    b = fused(user, pos, neg, w)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)

    ga = jax.grad(ref, argnums=(0, 1, 2, 3))(user, pos, neg, w)
    gb = jax.grad(fused, argnums=(0, 1, 2, 3))(user, pos, neg, w)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-5)


def test_sampled_softmax_shared_fused_dispatch():
    """fused=True through the public entry (table gathers outside the
    kernel) == fused=False, including table gradients."""
    from recboard_tpu.ops import losses as L
    import recboard_tpu.ops.losses as lmod
    from unittest import mock

    rng = np.random.default_rng(5)
    M, K, D, N = 40, 6, 8, 25
    user = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, N, size=(M,)), jnp.int32)
    negs = jnp.asarray(rng.integers(0, N, size=(K,)), jnp.int32)
    table = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    w = jnp.asarray(rng.integers(0, 2, size=(M,)), jnp.float32)

    orig = lmod.sampled_softmax_shared_fused
    with mock.patch.object(
        lmod, "sampled_softmax_shared_fused",
        lambda u, p, n, ww, t: orig(u, p, n, ww, t, True),
    ):
        def f_fused(t):
            return L.sampled_softmax_loss_shared(
                user, pos, negs, t, w, 0.5, fused=True
            )

        def f_plain(t):
            return L.sampled_softmax_loss_shared(
                user, pos, negs, t, w, 0.5, fused=False
            )

        np.testing.assert_allclose(
            float(f_fused(table)), float(f_plain(table)), rtol=1e-5
        )
        ga = jax.grad(f_fused)(table)
        gb = jax.grad(f_plain)(table)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=2e-5)


def test_stacked_rel_bias_kernel_bwd():
    """custom-VJP stacked bias (Pallas bwd, interpret mode) == plain
    XLA autodiff: values and both weight gradients."""
    from recboard_tpu.ops import rel_bias as RB

    rng = np.random.default_rng(9)
    NB, B, L, KT = 3, 5, 7, 40
    K = 23
    ts = jnp.asarray(np.sort(rng.integers(0, 4000, (B, L)), axis=1), jnp.int32)
    ts_w = jnp.asarray(rng.normal(size=(NB, KT)), jnp.float32)
    pos_w = jnp.asarray(rng.normal(size=(NB, 2 * L - 1)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(NB, B, L, L)), jnp.float32)

    def scalar(f):
        return lambda tw, pw: jnp.vdot(f(ts, tw, pw, K), cot)

    ref = scalar(RB.stacked_rel_bias_reference)
    ker = scalar(
        lambda t, tw, pw, k: RB.stacked_rel_bias(
            t, tw, pw, k, kernel_bwd=True, interpret=True
        )
    )
    np.testing.assert_allclose(float(ref(ts_w, pos_w)), float(ker(ts_w, pos_w)), rtol=1e-6)
    ga = jax.grad(ref, argnums=(0, 1))(ts_w, pos_w)
    gb = jax.grad(ker, argnums=(0, 1))(ts_w, pos_w)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]), rtol=1e-4, atol=1e-4)


def test_fullvocab_ce_kernel_matches_jnp():
    """Fused full-vocab CE (ops/vocab_ce.py): values and h/W/b grads
    match the jnp logsumexp path (interpret mode)."""
    import jax
    import jax.numpy as jnp

    from recboard_tpu.ops.vocab_ce import _rows_jnp, fullvocab_ce_rows

    rng = np.random.default_rng(0)
    M, D, V = 70, 16, 300
    h = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(D, V)), jnp.float32) * 0.1
    b = jnp.asarray(rng.normal(size=(V,)), jnp.float32) * 0.1
    y = jnp.asarray(rng.integers(0, V, (M,)), jnp.int32)
    w = jnp.asarray(rng.random((M,)), jnp.float32)

    def f_ref(h, W, b):
        return (_rows_jnp(h, W, b, y) * w).sum() / w.sum()

    def f_fused(h, W, b):
        rows = fullvocab_ce_rows(h, W, b, y, tile_rows=16, interpret=True)
        return (rows * w).sum() / w.sum()

    v1, g1 = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(h, W, b)
    v2, g2 = jax.value_and_grad(f_fused, argnums=(0, 1, 2))(h, W, b)
    assert abs(float(v1) - float(v2)) < 1e-5
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4)


def test_mha_dropout_pallas_kernel():
    """Fused dropout attention (ops/attention.py): bit-equal to
    mha_reference at rate 0, deterministic under a fixed seed, and its
    custom VJP matches finite differences (the kernel is a
    deterministic function of the seed, so FD is well-defined)."""
    import jax
    import jax.numpy as jnp

    from recboard_tpu.ops.attention import mha_dropout_pallas, mha_reference

    rng = np.random.default_rng(0)
    B, L, D, H = 4, 10, 16, 2
    q = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    pad = jnp.asarray(rng.random((B, L)) < 0.3)
    key = jax.random.PRNGKey(3)

    for causal in (False, True):
        a = mha_reference(q, k, v, num_heads=H, causal=causal,
                          key_padding_mask=pad)
        b = mha_dropout_pallas(q, k, v, H, causal, pad, None, None,
                               0.0, key, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    c1 = mha_dropout_pallas(q, k, v, H, False, pad, None, None, 0.3, key,
                            interpret=True)
    c2 = mha_dropout_pallas(q, k, v, H, False, pad, None, None, 0.3, key,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    a = mha_reference(q, k, v, num_heads=H, causal=False,
                      key_padding_mask=pad)
    assert float(jnp.abs(c1 - a).max()) > 1e-3  # dropout active

    eps = 1e-3
    idxs = [(0, 1, 2), (1, 3, 7), (3, 9, 15), (2, 0, 0)]
    wrappers = [(q, lambda x: (x, k, v)), (k, lambda x: (q, x, v)),
                (v, lambda x: (q, k, x))]
    for arr, wrap in wrappers:
        def f(x):
            qq, kk, vv = wrap(x)
            out = mha_dropout_pallas(qq, kk, vv, H, True, pad, None, None,
                                     0.3, key, interpret=True)
            return jnp.sum(out * jnp.cos(jnp.arange(D)))

        g = jax.grad(f)(arr)
        for i in idxs:
            fd = (f(arr.at[i].add(eps)) - f(arr.at[i].add(-eps))) / (2 * eps)
            assert abs(float(fd) - float(g[i])) < 5e-2 * max(1.0, abs(float(fd)))


def test_mha_dropout_pallas_bias_grads():
    """Learned-bias support in the fused dropout-attention kernel: at
    rate 0 both the output and the bias gradient match the jnp
    reference (dbias is accumulated across grid cells in-kernel)."""
    import jax
    import jax.numpy as jnp

    from recboard_tpu.ops.attention import mha_dropout_pallas, mha_reference

    rng = np.random.default_rng(4)
    B, L, D, H = 5, 10, 16, 2
    q = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, L, L)), jnp.float32)
    pad = jnp.asarray(rng.random((B, L)) < 0.3)
    key = jax.random.PRNGKey(5)
    cos = jnp.cos(jnp.arange(D))

    def f_fused(b):
        out = mha_dropout_pallas(q, k, v, H, True, pad, b, None, 0.0, key,
                                 interpret=True)
        return jnp.sum(out * cos)

    def f_ref(b):
        out = mha_reference(q, k, v, H, True, key_padding_mask=pad,
                            bias=b[None])
        return jnp.sum(out * cos)

    np.testing.assert_allclose(float(f_fused(bias)), float(f_ref(bias)),
                               rtol=1e-5)
    g_fused = jax.grad(f_fused)(bias)
    g_ref = jax.grad(f_ref)(bias)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_mha_dropout_pallas_head_split():
    """Score areas above _SPLIT_AREA dispatch per-head single-head
    kernel calls (VMEM: the multi-head kernel overflows the 16 MB
    scoped limit at L=S≈300). Output and bias grads still match the
    jnp reference at rate 0, and dropout masks differ across heads."""
    import jax
    import jax.numpy as jnp

    from recboard_tpu.ops import attention as A

    rng = np.random.default_rng(6)
    B, L, D, H = 2, 240, 16, 2
    assert L * L > A._SPLIT_AREA  # exercises the split path
    q = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, L, L)), jnp.float32)
    pad = jnp.asarray(rng.random((B, L)) < 0.2)
    key = jax.random.PRNGKey(7)
    cos = jnp.cos(jnp.arange(D))

    def f_fused(b):
        out = A.mha_dropout_pallas(q, k, v, H, False, pad, b, None, 0.0,
                                   key, interpret=True)
        return jnp.sum(out * cos)

    def f_ref(b):
        out = A.mha_reference(q, k, v, H, False, key_padding_mask=pad,
                              bias=b[None])
        return jnp.sum(out * cos)

    np.testing.assert_allclose(float(f_fused(bias)), float(f_ref(bias)),
                               rtol=1e-5)
    g_fused = jax.grad(f_fused)(bias)
    g_ref = jax.grad(f_ref)(bias)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)

    # per-head seeds: the two heads must not share a dropout mask
    out = A.mha_dropout_pallas(q, k, v, H, False, pad, bias, None, 0.5,
                               key, interpret=True)
    ref = A.mha_reference(q, k, v, H, False, key_padding_mask=pad,
                          bias=bias[None])
    d = np.abs(np.asarray(out) - np.asarray(ref)).reshape(B, L, H, D // H)
    assert d[..., 0, :].max() > 1e-3 and d[..., 1, :].max() > 1e-3
