"""NARM forward-numerics crosscheck vs torch (NARM/main.py:30-185).

Reuses the pinned flax-GRUCell -> torch.nn.GRU packing map from
test_crosscheck_gru and implements the reference's attention fusion
exactly: the torch GRU runs over the FULL right-padded sequence (the
reference never masks the recurrence) while alpha at pad positions
vanishes because v_t is bias-free and its input is masked — the test
certifies our seq_lengths-masked RNN is equivalent where it is read.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_crosscheck_gru import _pack_torch_gru


def test_narm_torch_transplant(tiny_dataset):
    import jax

    from recboard_tpu.models.zoo import NARM
    from test_models_smoke import _first_batch

    hidden = 12
    model = NARM(tiny_dataset, maxlen=10, embedding_dim=8, hidden_size=hidden,
                 num_blocks=2, emb_dropout_rate=0.0, hidden_dropout_rate=0.0,
                 ct_dropout_rate=0.0)
    batch = _first_batch(model.sure_trainpipe(10, 8))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
    )["params"]
    jax_q, jax_items = model.apply({"params": params}, batch, method="encode")

    p = jax.tree.map(np.asarray, params)
    t = lambda a: torch.as_tensor(np.asarray(a).copy(), dtype=torch.float64)
    seqs = torch.as_tensor(np.asarray(batch[model.ISeq]).copy())
    x = t(p["item_embeddings"]["embedding"])[seqs]
    for i in range(2):
        g = torch.nn.GRU(x.shape[-1], hidden, batch_first=True).double()
        w_ih, b_ih, w_hh, b_hh = _pack_torch_gru(p[f"gru_{i}"], hidden)
        with torch.no_grad():
            g.weight_ih_l0.copy_(w_ih)
            g.bias_ih_l0.copy_(b_ih)
            g.weight_hh_l0.copy_(w_hh)
            g.bias_hh_l0.copy_(b_hh)
        x, _ = g(x)
    mask = (seqs != 0).unsqueeze(-1).double()
    lengths = (seqs != 0).sum(-1).clamp(min=1)
    ht = x[torch.arange(len(seqs)), lengths - 1].unsqueeze(1)  # (B, 1, H)
    q1 = x @ t(p["a_1"]["kernel"])
    q2 = ht @ t(p["a_2"]["kernel"])
    alpha = (mask * torch.sigmoid(q1 + q2)) @ t(p["v_t"]["kernel"])
    c_local = (alpha * x).sum(1)
    c_t = torch.cat([c_local, ht[:, 0, :]], dim=1)
    q = c_t @ t(p["b"]["kernel"])

    np.testing.assert_allclose(
        np.asarray(jax_q), q.detach().numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(jax_items),
        np.asarray(p["item_embeddings"]["embedding"])[model.NUM_PADS:],
        atol=0, rtol=0,
    )
