"""SparseAdj SpMM paths: the fixed-adjacency custom-VJP fast path
(spmm_const — backward runs the pre-sorted transpose segment-sum)
must match plain `adj @ x` in both value and gradient."""

import jax
import jax.numpy as jnp
import numpy as np

from recboard_tpu.graph import SparseAdj


def _random_adj(rng, m, n, nnz):
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.normal(size=nnz).astype(np.float32)
    return SparseAdj(rows, cols, vals, (m, n))


def test_spmm_const_matches_matmul_value_and_grad():
    rng = np.random.default_rng(0)
    adj = _random_adj(rng, 37, 29, 400)
    x = jnp.asarray(rng.normal(size=(29, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(37, 8)).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(adj.spmm_const(x)), np.asarray(adj @ x), rtol=1e-5
    )

    def loss_plain(x):
        return jnp.sum(jnp.tanh(adj @ x) * w)

    def loss_const(x):
        return jnp.sum(jnp.tanh(adj.spmm_const(x)) * w)

    g_plain = jax.grad(loss_plain)(x)
    g_const = jax.grad(loss_const)(x)
    np.testing.assert_allclose(
        np.asarray(g_const), np.asarray(g_plain), rtol=1e-4, atol=1e-5
    )


def test_spmm_const_under_jit_and_chained_layers():
    rng = np.random.default_rng(1)
    adj = _random_adj(rng, 25, 25, 200)
    x = jnp.asarray(rng.normal(size=(25, 4)).astype(np.float32))

    @jax.jit
    def khop_const(x):
        y = x
        for _ in range(3):
            y = adj.spmm_const(y)
        return jnp.sum(y**2)

    def khop_plain(x):
        y = x
        for _ in range(3):
            y = adj @ y
        return jnp.sum(y**2)

    np.testing.assert_allclose(
        float(khop_const(x)), float(khop_plain(x)), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(jax.grad(khop_const)(x)),
        np.asarray(jax.grad(khop_plain)(x)),
        rtol=1e-4, atol=1e-5,
    )
