"""BERT4Rec forward-numerics crosscheck vs torch.nn.TransformerEncoder.

The reference encoder IS ``nn.TransformerEncoder(nn.TransformerEncoderLayer(
d_model, nhead, dim_feedforward=4*d, dropout, activation="gelu",
batch_first=True))`` (BERT4Rec/main.py:71-81). Our flax params are
transplanted into that exact torch stack and the encodes must agree at
every valid (non-pad) position on a real eval-pipe batch (right-appended
MASK token, left padding).

Pins: exact (erf) gelu, LN eps 1e-5, dropout placements (prob + output +
FFN-intermediate — off at eval but the module structure must line up for
the transplant to even be possible), qkv packing order. Fully-padded
query rows are excluded: torch emits NaN there (softmax over an all-masked
row) while we emit zeros; neither is ever read by loss or eval.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _torch_encoder(params, *, num_blocks, embedding_dim, num_heads):
    import torch.nn as nn

    D = embedding_dim
    t = lambda a: torch.as_tensor(np.asarray(a), dtype=torch.float32)

    layer = nn.TransformerEncoderLayer(
        d_model=D, nhead=num_heads, dim_feedforward=4 * D, dropout=0.0,
        activation="gelu", batch_first=True,
    )
    enc = nn.TransformerEncoder(layer, num_layers=num_blocks)
    for i, tl in enumerate(enc.layers):
        blk = params[f"encoder_{i}"]
        qkv = np.asarray(blk["qkv"]["kernel"])  # (D, 3, D)
        tl.self_attn.in_proj_weight.data = torch.cat(
            [t(qkv[:, j, :]).T for j in range(3)]
        )
        tl.self_attn.in_proj_bias.data = torch.cat(
            [t(np.asarray(blk["qkv"]["bias"])[j]) for j in range(3)]
        )
        tl.self_attn.out_proj.weight.data = t(blk["out_proj"]["kernel"]).T
        tl.self_attn.out_proj.bias.data = t(blk["out_proj"]["bias"])
        tl.linear1.weight.data = t(blk["Dense_0"]["kernel"]).T
        tl.linear1.bias.data = t(blk["Dense_0"]["bias"])
        tl.linear2.weight.data = t(blk["Dense_1"]["kernel"]).T
        tl.linear2.bias.data = t(blk["Dense_1"]["bias"])
        tl.norm1.weight.data = t(blk["LayerNorm_0"]["scale"])
        tl.norm1.bias.data = t(blk["LayerNorm_0"]["bias"])
        tl.norm2.weight.data = t(blk["LayerNorm_1"]["scale"])
        tl.norm2.bias.data = t(blk["LayerNorm_1"]["bias"])
    enc.eval()
    return enc


def test_bert4rec_torch_transplant(tiny_dataset):
    import jax
    import jax.numpy as jnp

    from recboard_tpu.models.zoo import BERT4Rec
    from test_models_smoke import _first_batch

    kw = dict(maxlen=10, num_blocks=2, num_heads=2, embedding_dim=16)
    model = BERT4Rec(tiny_dataset, **kw)
    batch = _first_batch(model.sure_validpipe(10, "full", batch_size=8))
    seqs = np.asarray(batch[model.ISeq])
    assert (seqs == 0).any(), "expected left-padded rows"
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sampling": jax.random.PRNGKey(2)},
        batch,
    )["params"]
    p = jax.tree.map(np.asarray, params)

    jax_hidden = model.apply(
        {"params": params}, jnp.asarray(seqs), method="encode"
    )

    emb = torch.as_tensor(p["item_embeddings"]["embedding"].copy())
    pos = torch.as_tensor(p["position_embeddings"]["embedding"].copy())
    seqs_t = torch.as_tensor(seqs.copy())
    x = emb[seqs_t] + pos[None]
    ln_w = torch.as_tensor(p["layernorm"]["scale"].copy())
    ln_b = torch.as_tensor(p["layernorm"]["bias"].copy())
    mu = x.mean(-1, keepdim=True)
    var = x.var(-1, unbiased=False, keepdim=True)
    x = (x - mu) / torch.sqrt(var + 1e-5) * ln_w + ln_b

    enc = _torch_encoder(p, num_blocks=2, embedding_dim=16, num_heads=2)
    with torch.no_grad():
        th_hidden = enc(x, src_key_padding_mask=(seqs_t == 0)).numpy()

    valid = seqs != 0  # (B, L) — fully-padded rows are NaN on the torch side
    np.testing.assert_allclose(
        np.asarray(jax_hidden)[valid], th_hidden[valid], atol=3e-5, rtol=1e-4
    )

    # scoring: fc over the rightmost (MASK) position, pads/mask sliced off
    scores = model.apply({"params": params}, batch, None,
                         method="recommend_from_full")
    last = th_hidden[:, -1, :]
    th_scores = (
        last @ p["fc"]["kernel"] + p["fc"]["bias"]
    )[:, model.NUM_PADS:]
    np.testing.assert_allclose(np.asarray(scores), th_scores, atol=3e-5, rtol=1e-4)
