"""HBM-scale table path (parallel/big_table.py): row-wise AdaGrad
sparse updates, the autodiff-boundary step pattern, streaming top-k,
and sharded-update HLO discipline on the 8-device CPU mesh."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recboard_tpu.parallel.big_table import (
    RowwiseAdagradTable,
    apply_row_grads,
    blocked_top_k,
    init_rowwise_adagrad,
)

V, D = 64, 8


def _dense_rowwise_adagrad(table, acc, ids, grads, lr, eps=1e-10):
    """Reference semantics, dense numpy: dup grads sum per row, acc sees
    the summed row once, update uses the post-accumulation scale."""
    g = np.zeros_like(table)
    np.add.at(g, ids, grads)
    touched = np.zeros(table.shape[0], bool)
    touched[ids] = True
    acc = acc + np.where(touched, (g**2).mean(-1), 0.0)
    upd = -lr * g / np.sqrt(acc[:, None] + eps)
    return table + np.where(touched[:, None], upd, 0.0), acc


def test_apply_row_grads_matches_dense_reference():
    rng = np.random.default_rng(0)
    state = init_rowwise_adagrad(jax.random.PRNGKey(0), V, D)
    # duplicates on purpose
    ids = np.array([3, 7, 3, 3, 50, 7, 0], np.int32)
    grads = rng.normal(size=(len(ids), D)).astype(np.float32)

    new = jax.jit(apply_row_grads, static_argnames=("lr",))(
        state, jnp.asarray(ids), jnp.asarray(grads), lr=0.5
    )
    want_t, want_a = _dense_rowwise_adagrad(
        np.asarray(state.table), np.asarray(state.acc), ids, grads, 0.5
    )
    np.testing.assert_allclose(np.asarray(new.table), want_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new.acc), want_a, atol=1e-5)
    # untouched rows bit-identical
    untouched = sorted(set(range(V)) - set(ids.tolist()))
    np.testing.assert_array_equal(
        np.asarray(new.table)[untouched], np.asarray(state.table)[untouched]
    )


def test_autodiff_boundary_matches_dense_table_grad():
    """Grads w.r.t. gathered rows, scatter-summed per id, equal the
    dense d loss/d table rows — the boundary loses nothing."""
    state = init_rowwise_adagrad(jax.random.PRNGKey(1), V, D)
    ids = jnp.asarray([1, 5, 1, 9], jnp.int32)
    w = jax.random.normal(jax.random.PRNGKey(2), (D,))

    def loss_rows(rows):
        return jnp.sum(jnp.tanh(rows @ w) ** 2)

    rows = state.table[ids]
    g_rows = jax.grad(loss_rows)(rows)  # (M, D)

    def loss_dense(table):
        return loss_rows(table[ids])

    g_dense = jax.grad(loss_dense)(state.table)  # (V, D)
    g_scatter = np.zeros((V, D), np.float32)
    np.add.at(g_scatter, np.asarray(ids), np.asarray(g_rows))
    np.testing.assert_allclose(g_scatter, np.asarray(g_dense), atol=1e-6)


def test_blocked_top_k_approx_high_recall():
    """approx=True (per-slab lax.approx_max_k + exact merge) must keep
    high recall vs the exact result on well-separated scores."""
    q = jax.random.normal(jax.random.PRNGKey(11), (8, D))
    table = jax.random.normal(jax.random.PRNGKey(12), (4096, D))
    _, exact_i = blocked_top_k(q, table, k=10, block_size=512)
    _, approx_i = jax.jit(
        blocked_top_k, static_argnames=("k", "block_size", "approx")
    )(q, table, k=10, block_size=512, approx=True)
    hits = np.mean([
        len(set(a.tolist()) & set(e.tolist())) / 10
        for a, e in zip(np.asarray(approx_i), np.asarray(exact_i))
    ])
    assert hits >= 0.9, f"approx recall {hits}"


@pytest.mark.parametrize("vocab,block", [(1000, 256), (512, 512), (513, 128)])
def test_blocked_top_k_matches_lax_top_k(vocab, block):
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (5, D))
    table = jax.random.normal(jax.random.PRNGKey(4), (vocab, D))
    # quantize scores to force ties across blocks
    table = jnp.round(table * 2) / 2
    scores = q @ table.T
    want_v, want_i = jax.lax.top_k(scores, 10)
    got_v, got_i = jax.jit(
        blocked_top_k, static_argnames=("k", "block_size")
    )(q, table, k=10, block_size=block)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_sparse_step_trains_and_stays_sparse():
    """A full train step through the boundary pattern learns (loss
    drops) while per-step FLOPs stay O(M·D): the compiled HLO contains
    no (V, D)-sized dot or reduce beyond the scatter/gather pair."""
    state = init_rowwise_adagrad(jax.random.PRNGKey(5), V, D, scale=0.5)
    targets = jax.random.normal(jax.random.PRNGKey(6), (V, D))

    @jax.jit
    def step(state, ids):
        rows = state.table[ids]

        def loss_fn(r):
            return jnp.mean((r - targets[ids]) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(rows)
        return apply_row_grads(state, ids, g, lr=1.0), loss

    rng = np.random.default_rng(1)
    losses = []
    for _ in range(50):
        ids = jnp.asarray(rng.integers(0, V, 16), jnp.int32)
        state, loss = step(state, ids)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10])


def test_sharded_update_no_full_table_allgather():
    """On the 8-device mesh with the table row-sharded over `model`,
    the jitted gather→grad→scatter step must keep the table sharded:
    no all-gather producing a (V, D)-sized result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("model",))
    BIGV = 1024
    state = init_rowwise_adagrad(jax.random.PRNGKey(7), BIGV, D)
    sh_t = NamedSharding(mesh, PartitionSpec("model", None))
    sh_a = NamedSharding(mesh, PartitionSpec("model"))
    state = RowwiseAdagradTable(
        table=jax.device_put(state.table, sh_t),
        acc=jax.device_put(state.acc, sh_a),
    )
    w = jax.random.normal(jax.random.PRNGKey(8), (D,))

    def step(state, ids):
        rows = state.table[ids]

        def loss_fn(r):
            return jnp.sum(jnp.tanh(r @ w))

        loss, g = jax.value_and_grad(loss_fn)(rows)
        return apply_row_grads(state, ids, g, lr=0.1), loss

    ids = jnp.asarray(np.random.default_rng(2).integers(0, BIGV, 64), jnp.int32)
    lowered = jax.jit(step).lower(state, ids)
    hlo = lowered.compile().as_text()
    full = rf"f32\[{BIGV},{D}\]"
    bad = [
        ln
        for ln in hlo.splitlines()
        if "all-gather" in ln and re.search(full, ln)
    ]
    assert not bad, "full-table all-gather:\n" + "\n".join(bad)

    new, _ = jax.jit(step)(state, ids)
    spec = getattr(new.table.sharding, "spec", None)
    assert spec is not None and tuple(spec)[0] == "model", spec
