"""STOSA forward-numerics crosscheck vs reference-math torch
(STOSA/main.py:43-240 + STOSA/modules.py:26-262).

Implements the reference equations directly — INCLUDING its
`maen_hidden_states` typo (modules.py:257: the mean stream is never
propagated across layers, the recorded mean is the embedding-layer
input) and its SHARED LayerNorm between the mean and cov residual
streams inside DistSelfAttention (modules.py:141,181-187) — then
transplants our flax params and pins encode + full-catalog scores
(which also validates the matmul decomposition of W2 against the
broadcast form).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _torch_stosa(params, seqs, *, maxlen, num_heads, num_blocks, embedding_dim,
                 num_pads):
    import torch.nn.functional as F

    t = lambda a: torch.as_tensor(np.asarray(a), dtype=torch.float64)
    L, H, D = maxlen, num_heads, embedding_dim
    hd = D // H

    def layer_norm(z, p, eps=1e-12):
        mu = z.mean(-1, keepdim=True)
        var = z.var(-1, unbiased=False, keepdim=True)
        return (z - mu) / torch.sqrt(var + eps) * t(p["scale"]) + t(p["bias"])

    def linear(z, p):
        return z @ t(p["kernel"]) + t(p["bias"])

    def heads(x):
        B = x.shape[0]
        return x.reshape(B, L, H, hd).permute(0, 2, 1, 3)

    def w2_matmul(m1, c1, m2, c2):
        ret = (-2 * m1 @ m2.transpose(-1, -2)
               + (m1 ** 2).sum(-1, keepdim=True)
               + (m2 ** 2).sum(-1, keepdim=True).transpose(-1, -2))
        s1 = torch.sqrt(torch.clamp(c1, min=1e-24))
        s2 = torch.sqrt(torch.clamp(c2, min=1e-24))
        cov = (-2 * s1 @ s2.transpose(-1, -2)
               + c1.sum(-1, keepdim=True)
               + c2.sum(-1, keepdim=True).transpose(-1, -2))
        return ret + cov

    seqs_t = torch.as_tensor(np.asarray(seqs).copy())
    pos = torch.arange(L)

    mean_x = t(params["item_mean_embds"]["embedding"])[seqs_t] + \
        t(params["pos_mean_embds"]["embedding"])[pos][None]
    mean_x = F.elu(layer_norm(mean_x, params["embd_ln"]))
    cov_x = t(params["item_cov_embds"]["embedding"])[seqs_t] + \
        t(params["pos_cov_embds"]["embedding"])[pos][None]
    cov_x = F.elu(layer_norm(cov_x, params["embd_ln"])) + 1

    valid = (seqs_t != 0).unsqueeze(1).unsqueeze(2) & torch.tril(
        torch.ones(L, L, dtype=torch.bool))
    mask = (1.0 - valid.to(torch.float64)) * (-(2.0 ** 32) + 1)

    mean_h, cov_h = mean_x, cov_x
    for i in range(num_blocks):
        blk = params[f"layer_{i}"]
        at = blk["DistSelfAttention_0"]
        mq, mk, mv = (heads(linear(mean_h, at[k]))
                      for k in ("mean_query", "mean_key", "mean_value"))
        cq, ck, cv = (heads(F.elu(linear(cov_h, at[k])) + 1)
                      for k in ("cov_query", "cov_key", "cov_value"))
        scores = -w2_matmul(mq, cq, mk, ck) / (hd ** 0.5) + mask
        probs = torch.softmax(scores, dim=-1)
        B = mean_h.shape[0]
        mean_ctx = (probs @ mv).permute(0, 2, 1, 3).reshape(B, L, D)
        cov_ctx = ((probs ** 2) @ cv).permute(0, 2, 1, 3).reshape(B, L, D)
        # ONE shared LayerNorm for both residual streams
        ma = layer_norm(linear(mean_ctx, at["mean_dense"]) + mean_h, at["ln"])
        ca = layer_norm(linear(cov_ctx, at["cov_dense"]) + cov_h, at["ln"])

        def intermediate(z, p):
            h = F.elu(linear(z, p["Dense_0"]))
            h = linear(h, p["Dense_1"])
            return layer_norm(h + z, p["LayerNorm_0"])

        # reference typo: mean output DISCARDED (maen_hidden_states);
        # only the cov stream propagates
        _ = intermediate(ma, blk["DistIntermediate_0"])
        cov_h = F.elu(intermediate(ca, blk["DistIntermediate_1"])) + 1

    mean_items = t(params["item_mean_embds"]["embedding"])[num_pads:]
    cov_items = t(params["item_cov_embds"]["embedding"])[num_pads:]
    # recorded mean is the layer INPUT (embedding output) under the typo
    return (mean_h.numpy(), cov_h.numpy(), mean_items.numpy(),
            cov_items.numpy(), w2_matmul)


def test_stosa_torch_transplant(tiny_dataset):
    import jax

    from recboard_tpu.models.zoo import STOSA
    from test_models_smoke import _first_batch

    kw = dict(maxlen=10, num_blocks=2, num_heads=2, embedding_dim=16)
    model = STOSA(tiny_dataset, **kw)
    batch = _first_batch(model.sure_trainpipe(10, 8))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
    )["params"]

    jm, jc, jmi, jci = model.apply({"params": params}, batch, method="encode")
    tm, tc, tmi, tci, w2 = _torch_stosa(
        jax.tree.map(np.asarray, params), batch[model.ISeq],
        num_pads=model.NUM_PADS, **kw,
    )

    np.testing.assert_allclose(np.asarray(jm), tm, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jc), tc, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jmi), tmi, atol=0, rtol=0)

    # full scoring: matmul decomposition == reference broadcast distance
    scores = model.apply({"params": params}, batch, None,
                         method="recommend_from_full")
    import torch.nn.functional as F
    th_scores = -w2(
        torch.as_tensor(tm[:, -1:, :]), torch.as_tensor(tc[:, -1:, :]),
        torch.as_tensor(tmi)[None], (F.elu(torch.as_tensor(tci)) + 1)[None],
    )[:, 0, :].numpy()
    np.testing.assert_allclose(np.asarray(scores), th_scores, atol=3e-5, rtol=1e-4)
