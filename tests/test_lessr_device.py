"""LESSR on-device graph derivation must match the host lessr_graph_
builder tensor-for-tensor, and LESSR must train through the Coach from
a plain device sampler (the enabler for reference-scale LESSR runs —
the per-batch host graph builder made XL epochs tunnel-bound)."""

import jax
import jax.numpy as jnp
import numpy as np


def _host_graph_rows(model, maxlen, batch_size):
    pipe = model.sure_trainpipe(maxlen, batch_size)
    pipe.set_seed(0)
    return next(iter(pipe))


def test_derive_session_graphs_matches_host_builder(tiny_dataset):
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.models.zoo import lessr as L

    model = REGISTRY["LESSR"](tiny_dataset, maxlen=6, embedding_dim=16,
                              num_layers=2, dropout_rate=0.0)
    batch = _host_graph_rows(model, 6, 32)
    iseq = jnp.asarray(batch[model.ISeq])
    got = jax.jit(
        lambda x: L.derive_session_graphs(x, model.PADDING_VALUE)
    )(iseq)

    np.testing.assert_array_equal(
        np.asarray(got[L.NodeItems]), np.asarray(batch[L.NodeItems]),
        err_msg="node items differ",
    )
    np.testing.assert_array_equal(
        np.asarray(got[L.NodeMask]).astype(bool),
        np.asarray(batch[L.NodeMask]).astype(bool),
    )
    np.testing.assert_array_equal(
        np.asarray(got[L.LastNode]), np.asarray(batch[L.LastNode])
    )
    np.testing.assert_array_equal(
        np.asarray(got[L.EOPDeg]), np.asarray(batch[L.EOPDeg])
    )
    # in-neighbor slots beyond the degree are padding on both sides —
    # compare only the live slots
    deg = np.asarray(batch[L.EOPDeg])
    ours, host = np.asarray(got[L.EOPNbr]), np.asarray(batch[L.EOPNbr])
    B, Ln, S = ours.shape
    live = np.arange(S)[None, None, :] < deg[..., None]
    np.testing.assert_array_equal(ours[live], host[live])
    np.testing.assert_array_equal(
        np.asarray(got[L.ShortMask]).astype(bool),
        np.asarray(batch[L.ShortMask]).astype(bool),
    )


def test_lessr_trains_from_device_sampler(tiny_dataset, tmp_path):
    from recboard_tpu.data.device import DeviceRollSeqSampler
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.parser import Parser

    model = REGISTRY["LESSR"](tiny_dataset, maxlen=6, embedding_dim=16,
                              num_layers=2, dropout_rate=0.0)
    sampler = DeviceRollSeqSampler(
        tiny_dataset, maxlen=6, batch_size=16, num_pads=model.NUM_PADS,
        pad_value=model.PADDING_VALUE, pad_side="left",
        window_includes_target=False,
    )
    p = Parser()
    p.set_defaults(description="LESSR", root="x", dataset="tiny", epochs=4,
                   batch_size=16, lr=5e-3, eval_freq=10, log2file=False,
                   log2console=False, log_path=str(tmp_path / "l"),
                   checkpoint_path=str(tmp_path / "i"),
                   monitors=["LOSS"], which4best="LOSS", seed=0)
    coach = Coach(dataset=tiny_dataset, trainpipe=sampler, validpipe=None,
                  testpipe=None, model=model, cfg=p.compile([]))
    for epoch in range(4):
        coach.train(epoch)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
