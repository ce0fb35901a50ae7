"""Sharded embedding tables on an 8-device CPU mesh: lookup equivalence
vs. plain take, gradient correctness under duplicate ids, sharded
full-catalog scoring (SURVEY.md §7 hard parts #2/#3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec

from recboard_tpu.parallel import mesh as mesh_lib, tables


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8
    return mesh_lib.make_mesh(num_model_shards=4)  # (data=2, model=4)


def test_pad_vocab():
    assert tables.pad_vocab(100, 4) % 4 == 0
    assert tables.pad_vocab(100, 4) >= 100
    assert tables.pad_vocab(128, 4) == 128


def test_row_sharded_lookup_matches_take(mesh8):
    V, D = 64, 16
    table = jnp.asarray(np.random.default_rng(0).normal(size=(V, D)), jnp.float32)
    ids = jnp.asarray([0, 5, 63, 17, 17, 32, 48, 1], jnp.int32)
    sharded = jax.device_put(
        table, NamedSharding(mesh8, tables.row_sharded_spec())
    )
    got = tables.lookup_row_sharded(mesh8, sharded, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(table[ids]), rtol=1e-6)


def test_row_sharded_lookup_grad_duplicate_ids(mesh8):
    """Duplicate ids in a batch must accumulate gradients (segment-sum
    before scatter — SURVEY.md §7 hard part #2)."""
    V, D = 32, 8
    table = jnp.ones((V, D), jnp.float32)
    ids = jnp.asarray([3, 3, 3, 7], jnp.int32)

    def loss(t):
        e = tables.lookup_row_sharded(mesh8, t, ids)
        return (e * jnp.arange(1.0, 5.0)[:, None]).sum()

    g = jax.grad(loss)(jax.device_put(table, NamedSharding(mesh8, tables.row_sharded_spec())))
    g = np.asarray(g)
    np.testing.assert_allclose(g[3], np.full(D, 6.0))  # 1+2+3
    np.testing.assert_allclose(g[7], np.full(D, 4.0))
    assert np.abs(g[[0, 1, 2, 4]]).sum() == 0


def test_dot_all_items_row_sharded(mesh8):
    B, V, D = 4, 64, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    ts = jax.device_put(t, NamedSharding(mesh8, tables.row_sharded_spec()))
    got = tables.dot_all_items_row_sharded(mesh8, q, ts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(q @ t.T), rtol=1e-5)


def test_gspmd_lookup_under_jit(mesh8):
    """Plain take on a row-sharded table under jit — XLA partitions it."""
    V, D = 64, 16
    table = jnp.asarray(np.random.default_rng(0).normal(size=(V, D)), jnp.float32)
    sharded = jax.device_put(table, NamedSharding(mesh8, tables.row_sharded_spec()))
    ids = jnp.asarray([1, 8, 63, 40], jnp.int32)

    @jax.jit
    def f(t, i):
        return tables.lookup(t, i)

    np.testing.assert_allclose(np.asarray(f(sharded, ids)), np.asarray(table[ids]))


def test_sharded_top_k_matches_dense():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec
    from recboard_tpu.parallel import make_mesh, topk

    mesh = make_mesh(8)
    rng = np.random.default_rng(11)
    B, V, k = 16, 64, 10
    scores = jnp.asarray(rng.normal(size=(B, V)), jnp.float32)
    # inject ties to pin tie-breaking to lowest-index-wins
    scores = scores.at[:, 7].set(scores[:, 3])
    sharded = jax.device_put(scores, NamedSharding(mesh, PartitionSpec(None, "model")))
    v, i = jax.jit(lambda s: topk.sharded_top_k(mesh, s, k))(sharded)
    v_ref, i_ref = jax.lax.top_k(scores, k)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_rank_top_k_row_sharded():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec
    from recboard_tpu.parallel import make_mesh, tables, topk

    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    B, V, D, k = 8, 48, 16, 5
    q = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    ts = jax.device_put(t, NamedSharding(mesh, tables.row_sharded_spec()))
    v, i = jax.jit(lambda q, t: topk.rank_top_k_row_sharded(mesh, q, t, k))(q, ts)
    s_ref = q @ t.T
    v_ref, i_ref = jax.lax.top_k(s_ref, k)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_col_sharded_lookup_matches_take(mesh8):
    """Column sharding (TP analogue): lookup is collective-free; the
    combined output matches plain take, and combine=False stays
    feature-sharded for a downstream column-parallel matmul."""
    V, D = 40, 32  # D divisible by the 4 model shards
    table = jnp.asarray(np.random.default_rng(1).normal(size=(V, D)), jnp.float32)
    ids = jnp.asarray([3, 7, 39, 0, 0, 21], jnp.int32)
    sharded = jax.device_put(
        table, NamedSharding(mesh8, tables.col_sharded_spec())
    )
    got = tables.lookup_col_sharded(mesh8, sharded, ids, combine=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(table[ids]), rtol=1e-6)

    kept = tables.lookup_col_sharded(mesh8, sharded, ids, combine=False)
    assert tuple(kept.sharding.spec) == (None, "model")
    np.testing.assert_allclose(np.asarray(kept), np.asarray(table[ids]), rtol=1e-6)


def test_col_sharded_lookup_grad_duplicate_ids(mesh8):
    V, D = 24, 32
    table = jnp.asarray(np.random.default_rng(2).normal(size=(V, D)), jnp.float32)
    ids = jnp.asarray([1, 1, 1, 9], jnp.int32)
    sharded = jax.device_put(
        table, NamedSharding(mesh8, tables.col_sharded_spec())
    )

    def loss_sharded(t):
        out = tables.lookup_col_sharded(mesh8, t, ids)
        return jnp.sum(out * jnp.arange(out.size).reshape(out.shape))

    def loss_plain(t):
        out = t[ids]
        return jnp.sum(out * jnp.arange(out.size).reshape(out.shape))

    g1 = jax.grad(loss_sharded)(sharded)
    g2 = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_row_sharded_rs_exchange_matches_take(mesh8):
    """The all-gather-ids + local-gather + reduce_scatter exchange:
    position-sharded ids in, position-sharded complete rows out."""
    V, D = 64, 16
    B = 16  # divisible by the 4 model shards
    table = jnp.asarray(np.random.default_rng(3).normal(size=(V, D)), jnp.float32)
    rng = np.random.default_rng(4)
    ids_np = rng.integers(0, V, (B,)).astype(np.int32)
    ids_np[3] = ids_np[7] = ids_np[11]  # duplicates crossing shard chunks
    sharded_t = jax.device_put(
        table, NamedSharding(mesh8, tables.row_sharded_spec())
    )
    ids = jax.device_put(
        jnp.asarray(ids_np), NamedSharding(mesh8, PartitionSpec("model"))
    )
    got = tables.lookup_row_sharded_rs(mesh8, sharded_t, ids)
    assert tuple(got.sharding.spec) == ("model", None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(table)[ids_np], rtol=1e-6
    )

    # gradient correctness with duplicates across position chunks
    def loss_rs(t):
        out = tables.lookup_row_sharded_rs(mesh8, t, ids)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_plain(t):
        out = t[jnp.asarray(ids_np)]
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    g1 = jax.grad(loss_rs)(sharded_t)
    g2 = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)
