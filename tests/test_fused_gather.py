"""The fused positive-gather paths must match the explicit-gather math.

SASRec folds the per-position positive embedding
gather into the input-sequence gather via the shift-by-one identity of
`(time_)seq_train_yielding_pos_(1, -1)` + `lpad_` (valid positions are
a contiguous suffix). These tests pin loss AND gradients against the
straightforward formulation on batches with real ragged padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest

from recboard_tpu import criterions
from recboard_tpu.data import synthetic
from recboard_tpu.models.zoo import SASRec


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fused"))
    return synthetic.synthetic_next_item(
        root=root, name="Fused_001_LOU", num_users=64, num_items=200,
        avg_len=12.0, seed=3,
    )


def _batch(model, maxlen=16, batch_size=32):
    pipe = model.sure_trainpipe(maxlen=maxlen, batch_size=batch_size)
    batch = next(iter(pipe))
    return {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(k, str)}


def _max_grad_err(g1, g2):
    err = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), g1, g2)
    return max(jax.tree_util.tree_leaves(err))


@pytest.mark.parametrize("loss", ["BCE", "BPR"])
def test_sasrec_fused_pos_gather_matches_explicit(ds, loss):
    model = SASRec(dataset=ds, maxlen=16, loss=loss)
    batch = _batch(model)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch, method=model.fit)
    rngs = {"dropout": jax.random.PRNGKey(7)}

    def loss_new(p):
        out, _ = model.apply(p, batch, method=model.fit, rngs=rngs)
        return out

    def loss_ref(p):
        def ref_fit(mdl, data):
            user_embds, item_embds = mdl.encode(data, deterministic=False)
            seqs = data[mdl.ISeq]
            weights = (seqs != mdl.PADDING_VALUE).astype(jnp.float32)
            pos = item_embds[data[mdl.IPos]]
            neg = item_embds[data[mdl.INeg]]
            pl = jnp.einsum("bld,bld->bl", user_embds, pos)
            nl = jnp.einsum("bld,bld->bl", user_embds, neg)
            if mdl.loss == "BCE":
                return criterions.bce_with_logits(
                    pl, jnp.ones_like(pl), weights=weights
                ) + criterions.bce_with_logits(
                    nl, jnp.zeros_like(nl), weights=weights
                )
            return criterions.bpr_with_logits(pl, nl, weights=weights)

        return model.apply(p, batch, method=ref_fit, rngs=rngs)

    l1, g1 = jax.value_and_grad(loss_new)(params)
    l2, g2 = jax.value_and_grad(loss_ref)(params)
    assert abs(float(l1) - float(l2)) < 1e-6
    assert _max_grad_err(g1, g2) < 1e-5
