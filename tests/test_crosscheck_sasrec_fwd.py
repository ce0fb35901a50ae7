"""SASRec forward-numerics crosscheck vs torch.nn.MultiheadAttention.

Stricter than tools/crosscheck_sasrec.py (metric-level): the torch side
here is built exactly like the reference (SASRec/main.py:53-193 — real
``nn.MultiheadAttention`` with ONLY the causal ``attnMask``, per-block
pad re-zeroing, conv1d FFN), our flax params are transplanted into it,
and the full (B, L, D) encodes must agree to float tolerance on a real
left-padded pipe batch.

The load-bearing subtlety this pins: the reference does NOT mask pad
*keys* — pad positions are zeroed before each block, so their k/v
projections are the projection biases, and valid queries attend to them
with nonzero weight. A key-padding mask here (the "obvious" transformer
convention) is a reference-parity bug.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _build_torch_sasrec(params, *, maxlen, num_heads, num_blocks, embedding_dim):
    import torch.nn as nn

    D, H = embedding_dim, num_heads
    t = lambda a: torch.as_tensor(np.asarray(a), dtype=torch.float32)

    blocks = []
    for i in range(num_blocks):
        blk = params[f"blocks_{i}"]
        attn_ln = nn.LayerNorm(D, eps=1e-8)
        attn_ln.weight.data = t(blk["LayerNorm_0"]["scale"])
        attn_ln.bias.data = t(blk["LayerNorm_0"]["bias"])
        mha = nn.MultiheadAttention(D, H, dropout=0.0, batch_first=True)
        mha.in_proj_weight.data = torch.cat(
            [t(blk[k]["kernel"]).T for k in ("q_proj", "k_proj", "v_proj")]
        )
        mha.in_proj_bias.data = torch.cat(
            [t(blk[k]["bias"]) for k in ("q_proj", "k_proj", "v_proj")]
        )
        mha.out_proj.weight.data = t(blk["out_proj"]["kernel"]).T
        mha.out_proj.bias.data = t(blk["out_proj"]["bias"])
        fwd_ln = nn.LayerNorm(D, eps=1e-8)
        fwd_ln.weight.data = t(blk["LayerNorm_1"]["scale"])
        fwd_ln.bias.data = t(blk["LayerNorm_1"]["bias"])
        ffn = blk["PointWiseFFN_0"]
        conv1 = nn.Conv1d(D, D, kernel_size=1)
        conv1.weight.data = t(ffn["Dense_0"]["kernel"]).T[..., None]
        conv1.bias.data = t(ffn["Dense_0"]["bias"])
        conv2 = nn.Conv1d(D, D, kernel_size=1)
        conv2.weight.data = t(ffn["Dense_1"]["kernel"]).T[..., None]
        conv2.bias.data = t(ffn["Dense_1"]["bias"])
        blocks.append((attn_ln, mha, fwd_ln, conv1, conv2))

    last_ln = nn.LayerNorm(D, eps=1e-8)
    last_ln.weight.data = t(params["last_ln"]["scale"])
    last_ln.bias.data = t(params["last_ln"]["bias"])

    emb = t(params["item_embeddings"]["embedding"])
    pos = t(params["position_embeddings"]["embedding"])
    attn_mask = torch.ones(maxlen, maxlen, dtype=torch.bool).triu(1)

    @torch.no_grad()
    def encode(seqs_np):
        seqs_t = torch.as_tensor(np.asarray(seqs_np).copy())
        pad = (seqs_t == 0).unsqueeze(-1)
        x = emb[seqs_t] * (D ** 0.5) + pos[None]
        x = x.masked_fill(pad, 0.0)
        for attn_ln, mha, fwd_ln, conv1, conv2 in blocks:
            q = attn_ln(x)
            x = mha(q, x, x, attn_mask=attn_mask, need_weights=False)[0] + x
            h = fwd_ln(x)
            f = conv2(torch.relu(conv1(h.transpose(-1, -2)))).transpose(-1, -2)
            x = (f + h).masked_fill(pad, 0.0)
        return last_ln(x).numpy()

    return encode, emb.numpy()


def test_sasrec_torch_mha_transplant(tiny_dataset):
    import jax

    from recboard_tpu.models.zoo import SASRec
    from test_models_smoke import _first_batch

    kw = dict(maxlen=10, num_blocks=2, num_heads=2, embedding_dim=16)
    model = SASRec(tiny_dataset, **kw)
    batch = _first_batch(model.sure_trainpipe(10, 8))
    seqs = np.asarray(batch[model.ISeq])
    assert (seqs == 0).any(), "expected left-padded rows"
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
    )["params"]

    jax_user, jax_items = model.apply({"params": params}, batch, method="encode")
    encode, emb = _build_torch_sasrec(jax.tree.map(np.asarray, params), **kw)
    th_user = encode(seqs)

    np.testing.assert_allclose(np.asarray(jax_user), th_user, atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jax_items), emb[model.NUM_PADS:], atol=0, rtol=0
    )

    scores = model.apply({"params": params}, batch, None,
                         method="recommend_from_full")
    np.testing.assert_allclose(
        np.asarray(scores), th_user[:, -1] @ emb[model.NUM_PADS:].T,
        atol=3e-5, rtol=1e-4,
    )
