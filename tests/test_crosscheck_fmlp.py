"""FMLP-Rec forward-numerics crosscheck vs reference-math torch
(FMLP-Rec/main.py:38-151 + FMLP-Rec/modules.py:41-84): rFFT → learnable
complex filter → irFFT → LN residual, then 4x erf-GELU MLP + LN
residual. Covers the FFT-filter family's numerics (ortho-normalized
torch.fft vs jnp.fft, complex weight packing as (..., 2) float pairs).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _torch_fmlp_encode(params, seqs, *, maxlen, num_blocks, embedding_dim,
                       num_pads):
    t = lambda a: torch.as_tensor(np.asarray(a), dtype=torch.float64)
    L, D = maxlen, embedding_dim

    def layer_norm(z, p, eps=1e-12):
        mu = z.mean(-1, keepdim=True)
        var = z.var(-1, unbiased=False, keepdim=True)
        return (z - mu) / torch.sqrt(var + eps) * t(p["scale"]) + t(p["bias"])

    def linear(z, p):
        return z @ t(p["kernel"]) + t(p["bias"])

    seqs_t = torch.as_tensor(np.asarray(seqs).copy())
    emb = t(params["item_embeddings"]["embedding"])
    pos = t(params["position_embeddings"]["embedding"])
    x = layer_norm(emb[seqs_t] + pos[None], params["in_ln"])

    for i in range(num_blocks):
        filt = params[f"filters_{i}"]
        inter = params[f"intermediates_{i}"]
        w = t(filt["complex_weight"])  # (1, L//2+1, D, 2)
        weight = torch.view_as_complex(w.contiguous())
        freq = torch.fft.rfft(x, dim=1, norm="ortho") * weight
        out = torch.fft.irfft(freq, n=L, dim=1, norm="ortho")
        x = layer_norm(out + x, filt["LayerNorm_0"])
        h = linear(x, inter["Dense_0"])
        h = h * 0.5 * (1.0 + torch.erf(h / (2.0 ** 0.5)))
        h = linear(h, inter["Dense_1"])
        x = layer_norm(h + x, inter["LayerNorm_0"])

    return x[:, -1, :].numpy(), emb[num_pads:].numpy()


def test_fmlp_torch_transplant(tiny_dataset):
    import jax

    from recboard_tpu.models.zoo import FMLPRec
    from test_models_smoke import _first_batch

    kw = dict(maxlen=10, num_blocks=2, embedding_dim=16)
    model = FMLPRec(tiny_dataset, **kw)
    batch = _first_batch(model.sure_trainpipe(10, 8))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
    )["params"]

    jax_q, jax_items = model.apply({"params": params}, batch, method="encode")
    th_q, th_items = _torch_fmlp_encode(
        jax.tree.map(np.asarray, params), batch[model.ISeq],
        num_pads=model.NUM_PADS, **kw,
    )

    np.testing.assert_allclose(np.asarray(jax_q), th_q, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jax_items), th_items, atol=2e-5, rtol=1e-4)
