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
