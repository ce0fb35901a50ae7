"""BSARec forward-numerics crosscheck vs an independent PyTorch
implementation of the reference math (BSARec/main.py:42-200 +
BSARec/modules.py:147-205).

BSARec is the top-quality sequential model in BASELINE.md, and the one
model whose pad handling is numerically load-bearing: the reference
masks attention with an additive -1e4 (BSARec/main.py:133-141), so a
fully-padded query row degrades to a plain softmax over raw scores
rather than zeros, and that value leaks into *valid* positions through
the next block's FFT branch (FrequencyLayer mixes along time). The
torch side below implements exactly the reference equations; our flax
params are transplanted into it and the encodes must agree on a real
left-padded pipe batch (which contains fully-padded prefix rows).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _torch_bsarec_encode(params, seqs, *, maxlen, num_heads, num_blocks,
                         embedding_dim, c, alpha, num_pads):
    """Reference-math BSARec forward in torch, from transplanted params."""
    t = lambda a: torch.as_tensor(np.asarray(a), dtype=torch.float64)
    L, H, D = maxlen, num_heads, embedding_dim
    hd = D // H

    seqs_t = torch.as_tensor(np.asarray(seqs).copy())
    emb = t(params["item_embeddings"]["embedding"])
    pos = t(params["position_embeddings"]["embedding"])

    def layer_norm(z, p, eps=1e-12):
        mu = z.mean(-1, keepdim=True)
        var = z.var(-1, unbiased=False, keepdim=True)
        return (z - mu) / torch.sqrt(var + eps) * t(p["scale"]) + t(p["bias"])

    def linear(z, p):
        return z @ t(p["kernel"]) + t(p["bias"])

    # additive mask: tril(valid keys) -> 0, else -1e4 (BSARec/main.py:133-141)
    valid = (seqs_t != 0).unsqueeze(1).unsqueeze(2).expand(-1, -1, L, -1)
    mask = torch.where(torch.tril(valid), 0.0, -1.0e4).to(torch.float64)

    x = emb[seqs_t] + pos[None]
    x = layer_norm(x, params["in_ln"])

    keep = c // 2 + 1
    for i in range(num_blocks):
        blk = params[f"block_{i}"]
        # dsp: low-pass rFFT filter (BSARec/modules.py:147-172)
        fl = blk["FrequencyLayer_0"]
        freq = torch.fft.rfft(x, dim=1, norm="ortho")
        freq[:, keep:, :] = 0
        low = torch.fft.irfft(freq, n=L, dim=1, norm="ortho")
        high = x - low
        dsp = low + (t(fl["sqrt_beta"]) ** 2) * high
        dsp = layer_norm(dsp + x, fl["LayerNorm_0"])
        # gsp: softmax MHA with the additive mask (BSARec/modules.py:80-144)
        at = blk["BSAAttention_0"]
        B = x.shape[0]
        q = linear(x, at["query"]).reshape(B, L, H, hd).permute(0, 2, 1, 3)
        k = linear(x, at["key"]).reshape(B, L, H, hd).permute(0, 2, 1, 3)
        v = linear(x, at["value"]).reshape(B, L, H, hd).permute(0, 2, 1, 3)
        scores = q @ k.transpose(-1, -2) / (hd ** 0.5) + mask
        probs = torch.softmax(scores, dim=-1)
        ctx = (probs @ v).permute(0, 2, 1, 3).reshape(B, L, D)
        gsp = layer_norm(linear(ctx, at["dense"]) + x, at["LayerNorm_0"])

        h = alpha * dsp + (1 - alpha) * gsp
        # FFN: 4x GELU (erf) + LN residual (BSARec/modules.py:27-77)
        f = linear(h, blk["Dense_0"])
        f = f * 0.5 * (1.0 + torch.erf(f / (2.0 ** 0.5)))
        f = linear(f, blk["Dense_1"])
        x = layer_norm(f + h, blk["LayerNorm_0"])

    return x[:, -1, :].numpy(), emb[num_pads:].numpy()


def test_bsarec_torch_transplant(tiny_dataset):
    import jax

    from recboard_tpu.models.zoo import BSARec
    from test_models_smoke import _first_batch

    kw = dict(maxlen=10, num_blocks=2, num_heads=2, embedding_dim=16,
              c=3, alpha=0.7)
    model = BSARec(tiny_dataset, **kw)
    batch = _first_batch(model.sure_trainpipe(10, 8))
    seqs = np.asarray(batch[model.ISeq])
    # left-padded pipe rows must include fully-padded prefixes (that is
    # the regime where the additive -1e4 semantics differ from hard
    # masking); tiny_dataset sequences are shorter than maxlen=10
    assert (seqs == 0).any(), "expected padded rows to exercise the mask"
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
    )["params"]

    jax_q, jax_items = model.apply({"params": params}, batch, method="encode")
    th_q, th_items = _torch_bsarec_encode(
        jax.tree.map(np.asarray, params), seqs,
        num_pads=model.NUM_PADS, **kw,
    )

    np.testing.assert_allclose(np.asarray(jax_q), th_q, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jax_items), th_items, atol=2e-5, rtol=1e-4)

    scores = model.apply({"params": params}, batch, None,
                         method="recommend_from_full")
    np.testing.assert_allclose(
        np.asarray(scores), th_q @ th_items.T, atol=2e-5, rtol=1e-4
    )
