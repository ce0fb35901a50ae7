"""HSTU forward-numerics crosscheck vs an independent PyTorch
implementation of the reference math (HSTU/modules.py:19-206).

Stronger than the metric-level SASRec crosscheck: the torch side is
written directly from the reference equations (pointwise SiLU attention,
bucketed time+position bias, L2-normalized outputs), our flax params are
transplanted into it, and the two encodes must agree to float tolerance
on a real pipe batch. Any head-layout / split-order / bias-formula
transcription bug in models/zoo/hstu.py shows up as a large diff here.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _torch_hstu_encode(params, seqs, times, *, maxlen, num_heads, num_blocks,
                       embedding_dim, linear_hidden_dim, attention_dim,
                       num_buckets, num_pads):
    """Reference-math HSTU forward in torch, from transplanted params."""
    t = lambda a: torch.as_tensor(np.asarray(a), dtype=torch.float64)
    L, H = maxlen, num_heads
    D, Dv, Da = embedding_dim, linear_hidden_dim, attention_dim

    seqs_t = torch.as_tensor(np.asarray(seqs).copy())
    times_t = torch.as_tensor(np.asarray(times).copy(), dtype=torch.float64)
    emb = t(params["item_embeddings"]["embedding"])
    pos = t(params["pos_embeddings"]["embedding"])

    pad = (seqs_t == 0).unsqueeze(-1)
    x = emb[seqs_t] * (D ** 0.5) + pos[None]
    x = x.masked_fill(pad, 0.0)

    # stacked relative time+position bias (HSTU/modules.py:59-129)
    ts_w = t(params["rel_bias"]["timestamp_weights"])   # (NB, num_buckets+1)
    pos_w = t(params["rel_bias"]["position_weights"])   # (NB, 2L-1)
    ext = torch.cat([times_t, times_t[:, L - 1: L]], dim=1)
    diff = ext[:, 1:, None] - ext[:, None, :-1]          # (B, L, L)
    bucket = torch.clamp(
        torch.floor(torch.log(torch.clamp(diff.abs(), min=1.0)) / 0.301),
        0, num_buckets,
    ).long()
    m = torch.arange(L)[:, None]
    n = torch.arange(L)[None, :]
    causal = torch.tril(torch.ones(L, L, dtype=torch.float64))

    def layer_norm(z, scale, bias, eps=1e-6):
        mu = z.mean(-1, keepdim=True)
        var = z.var(-1, unbiased=False, keepdim=True)
        return (z - mu) / torch.sqrt(var + eps) * scale + bias

    for i in range(num_blocks):
        blk = params[f"hstu_{i}"]
        bias = pos_w[i][n - m + L - 1][None] + ts_w[i][bucket]  # (B, L, L)
        z = layer_norm(x, t(blk["LayerNorm_0"]["scale"]), t(blk["LayerNorm_0"]["bias"]))
        z = torch.nn.functional.silu(z @ t(blk["uvqk_linear"]["kernel"]))
        u, v, q, k = torch.split(z, [Dv * H, Dv * H, Da * H, Da * H], dim=-1)
        B = z.shape[0]
        q = q.reshape(B, L, H, Da)
        k = k.reshape(B, L, H, Da)
        v = v.reshape(B, L, H, Dv)
        qk = torch.einsum("bmhd,bnhd->bhmn", q, k)
        attn = torch.nn.functional.silu(qk + bias[:, None]) / L
        attn = attn * causal[None, None]
        z = torch.einsum("bhmn,bnhd->bmhd", attn, v).reshape(B, L, H * Dv)
        z = layer_norm(z, t(blk["attn_ln"]["scale"]), t(blk["attn_ln"]["bias"]))
        z = z * u
        x = z @ t(blk["output_linear"]["kernel"]) + t(blk["output_linear"]["bias"]) + x

    user = x / torch.sqrt((x * x).sum(-1, keepdim=True) + 1e-12)
    table = emb[num_pads:]
    items = table / torch.sqrt((table * table).sum(-1, keepdim=True) + 1e-12)
    return user.numpy(), items.numpy()


def test_hstu_torch_transplant(tiny_dataset):
    import jax

    from recboard_tpu.models.zoo import HSTU
    from test_models_smoke import _first_batch

    kw = dict(maxlen=10, num_blocks=2, num_heads=2, embedding_dim=16,
              linear_hidden_dim=8, attention_dim=4, num_buckets=100)
    model = HSTU(tiny_dataset, num_negs=8, **kw)
    batch = _first_batch(model.sure_trainpipe(10, 8))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sampling": jax.random.PRNGKey(2)},
        batch,
    )["params"]

    jax_user, jax_items = model.apply({"params": params}, batch, method="encode")
    th_user, th_items = _torch_hstu_encode(
        jax.tree.map(np.asarray, params),
        batch[model.ISeq], batch[model.Time],
        num_pads=model.NUM_PADS, **kw,
    )

    np.testing.assert_allclose(np.asarray(jax_user), th_user, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jax_items), th_items, atol=2e-5, rtol=1e-4)

    # scoring path: recommend_from_full == last-position user · item table
    scores = model.apply({"params": params}, batch, None,
                         method="recommend_from_full")
    np.testing.assert_allclose(
        np.asarray(scores), th_user[:, -1] @ th_items.T, atol=2e-5, rtol=1e-4
    )
