"""GRU4Rec forward-numerics crosscheck vs torch.nn.GRU.

The reference runs cuDNN `nn.GRU` (GRU4Rec/main.py:32); our encoder is a
flax `nn.RNN(GRUCell)` lowered to `lax.scan`. Gate conventions agree
(r/z/n with the reset gate applied to the recurrent n-branch) but the
parameter packing differs — torch packs [r;z;n] rows into weight_ih/hh,
flax keeps six Dense submodules (i-gates biased, h-gates unbiased except
hn). This test transplants our flax params into a real torch GRU and
requires the two encodes to agree, pinning both the gate math and the
packing map.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _pack_torch_gru(gru_params, hidden):
    """flax GRUCell params -> (weight_ih, bias_ih, weight_hh, bias_hh)."""
    c = gru_params["cell"]
    f = lambda a: torch.as_tensor(np.asarray(a).copy(), dtype=torch.float64)
    weight_ih = torch.cat([f(c["ir"]["kernel"]).T, f(c["iz"]["kernel"]).T,
                           f(c["in"]["kernel"]).T])
    bias_ih = torch.cat([f(c["ir"]["bias"]), f(c["iz"]["bias"]),
                         f(c["in"]["bias"])])
    weight_hh = torch.cat([f(c["hr"]["kernel"]).T, f(c["hz"]["kernel"]).T,
                           f(c["hn"]["kernel"]).T])
    bias_hh = torch.cat([torch.zeros(hidden, dtype=torch.float64),
                         torch.zeros(hidden, dtype=torch.float64),
                         f(c["hn"]["bias"])])
    return weight_ih, bias_ih, weight_hh, bias_hh


def test_gru4rec_torch_transplant(tiny_dataset):
    import jax

    from recboard_tpu.models.zoo import GRU4Rec
    from test_models_smoke import _first_batch

    hidden = 12
    model = GRU4Rec(tiny_dataset, maxlen=10, embedding_dim=8,
                    hidden_size=hidden, num_blocks=2,
                    emb_dropout_rate=0.0, hidden_dropout_rate=0.0)
    batch = _first_batch(model.sure_trainpipe(10, 8))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
    )["params"]
    jax_q, jax_items = model.apply({"params": params}, batch, method="encode")

    p = jax.tree.map(np.asarray, params)
    seqs = torch.as_tensor(np.asarray(batch[model.ISeq]).copy())
    emb = torch.as_tensor(p["item_embeddings"]["embedding"].copy(),
                          dtype=torch.float64)
    x = emb[seqs]
    for i in range(2):
        g = torch.nn.GRU(x.shape[-1], hidden, batch_first=True).double()
        w_ih, b_ih, w_hh, b_hh = _pack_torch_gru(p[f"gru_{i}"], hidden)
        with torch.no_grad():
            g.weight_ih_l0.copy_(w_ih)
            g.bias_ih_l0.copy_(b_ih)
            g.weight_hh_l0.copy_(w_hh)
            g.bias_hh_l0.copy_(b_hh)
        x, _ = g(x)
    x = x @ torch.as_tensor(p["dense"]["kernel"].copy(), dtype=torch.float64)
    x = x + torch.as_tensor(p["dense"]["bias"].copy(), dtype=torch.float64)
    lengths = (seqs != 0).sum(-1).clamp(min=1)
    q = x[torch.arange(len(seqs)), lengths - 1]

    np.testing.assert_allclose(
        np.asarray(jax_q), q.detach().numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(jax_items), emb[model.NUM_PADS:].numpy(), atol=1e-6, rtol=0
    )
