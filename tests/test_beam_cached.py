"""Cached-memory beam decode ≡ the uncached reference loop.

The serving path (TIGER.recommend_from_full) projects the
cross-attention memory K/V once per query (seq2seq.precompute_cross_kv
+ decode_beams) instead of re-projecting a num_beams×-duplicated
encoder state at every decode step. Same arithmetic, so the selected
items must be IDENTICAL and scores equal to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recboard_tpu.sem.seq2seq import (
    Seq2SeqTransformer, beam_search, beam_search_cached,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    V, D = 40, 32
    m = Seq2SeqTransformer(
        vocab_size=V, dim=D, num_heads=2, num_encoder_layers=2,
        num_decoder_layers=2, ffn_dim=64, dropout=0.1, pad_id=0, head_dim=16,
    )
    inp = jnp.asarray(rng.integers(1, V, (4, 12)), jnp.int32)
    dec = jnp.asarray(rng.integers(1, V, (4, 5)), jnp.int32)
    params = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inp, dec,
    )["params"]
    # tiny 2-level trie: any first token → per-token node → one terminal
    num_nodes = 1 + V + 1
    allowed = np.zeros((num_nodes, V), bool)
    allowed[:, 1:] = True
    next_node = np.zeros((num_nodes, V), np.int32)
    next_node[0, :] = 1 + np.arange(V)
    next_node[1:1 + V, :] = 1 + V
    node_item = np.full(num_nodes, -1, np.int32)
    node_item[1 + V] = 7
    trie = (jnp.asarray(allowed), jnp.asarray(next_node),
            jnp.asarray(node_item))
    return m, params, inp, trie


def _run(m, params, inp, trie, cached):
    def f(p):
        enc_out, enc_mask = m.apply({"params": p}, inp, method="encode")
        kw = dict(num_beams=3, max_steps=4, start_id=1, pad_id=0)
        if cached:
            kv = m.apply({"params": p}, enc_out, method="precompute_cross_kv")
            return beam_search_cached(
                lambda d: m.apply({"params": p}, d, kv, enc_mask,
                                  method="decode_beams"),
                inp.shape[0], *trie, **kw,
            )
        return beam_search(
            lambda d, eo, em: m.apply({"params": p}, d, eo, em,
                                      method="decode"),
            enc_out, enc_mask, *trie, **kw,
        )

    return jax.jit(f)(params)


def test_cached_beam_matches_uncached(setup):
    m, params, inp, trie = setup
    i_ref, s_ref = _run(m, params, inp, trie, cached=False)
    i_new, s_new = _run(m, params, inp, trie, cached=True)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_new))
    np.testing.assert_allclose(
        np.asarray(s_ref), np.asarray(s_new), atol=1e-5
    )


def test_decode_beams_matches_decode_logits(setup):
    # beyond beam selection: raw logits from the cached path equal the
    # full decode() on beam-folded inputs
    m, params, inp, trie = setup
    rng = np.random.default_rng(1)
    K = 3
    dec = jnp.asarray(rng.integers(0, 40, (inp.shape[0] * K, 5)), jnp.int32)
    enc_out, enc_mask = m.apply({"params": params}, inp, method="encode")
    ref = m.apply(
        {"params": params}, dec,
        jnp.repeat(enc_out, K, axis=0), jnp.repeat(enc_mask, K, axis=0),
        method="decode",
    )
    kv = m.apply({"params": params}, enc_out, method="precompute_cross_kv")
    got = m.apply(
        {"params": params}, dec, kv, enc_mask, method="decode_beams"
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-5)


def test_precompute_refuses_remat():
    m = Seq2SeqTransformer(
        vocab_size=10, dim=8, num_heads=2, num_encoder_layers=1,
        num_decoder_layers=1, ffn_dim=16, pad_id=0, head_dim=4, remat=True,
    )
    inp = jnp.ones((2, 4), jnp.int32)
    dec = jnp.ones((2, 3), jnp.int32)
    params = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inp, dec,
    )["params"]
    enc_out, _ = m.apply({"params": params}, inp, method="encode")
    with pytest.raises(ValueError, match="remat"):
        m.apply({"params": params}, enc_out, method="precompute_cross_kv")
