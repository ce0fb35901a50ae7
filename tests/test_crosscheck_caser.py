"""Caser forward-numerics crosscheck vs real torch Conv2d stacks
(Caser/main.py:35-190).

Our TPU path replaces the (B, 1, L, D) image convolutions with an
einsum (vertical) and static strided-window dot-generals (horizontal);
this transplant pins those against actual ``nn.Conv2d`` semantics —
the conv-weight (C, 1, k, D) ↔ (C, k·D) reshape ordering is exactly
where silent transposition bugs hide.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _torch_caser_encode(params, users, seqs, *, maxlen, embedding_dim,
                        num_vert, num_horiz):
    import torch.nn as nn
    import torch.nn.functional as F

    t = lambda a: torch.as_tensor(np.asarray(a).copy(), dtype=torch.float32)
    D = embedding_dim

    emb = t(params["item_embeddings"]["embedding"])
    emb[0] = 0.0  # padding_idx row
    uemb = t(params["user_embeddings"]["embedding"])

    vert = nn.Conv2d(1, num_vert, kernel_size=(maxlen, 1))
    vert.weight.data = t(params["vert_kernel"]).reshape(num_vert, 1, maxlen, 1)
    vert.bias.data = t(params["vert_bias"])
    horizs = []
    for k in range(1, maxlen + 1):
        c = nn.Conv2d(1, num_horiz, kernel_size=(k, D))
        c.weight.data = t(params[f"horiz_kernel_{k}"]).reshape(num_horiz, 1, k, D)
        c.bias.data = t(params[f"horiz_bias_{k}"])
        horizs.append(c)
    fc1 = nn.Linear(num_vert * D + num_horiz * maxlen, D)
    fc1.weight.data = t(params["fc1"]["kernel"]).T
    fc1.bias.data = t(params["fc1"]["bias"])
    pool = nn.AdaptiveMaxPool1d((1,))

    with torch.no_grad():
        x = emb[torch.as_tensor(np.asarray(seqs).copy())].unsqueeze(1)  # (B,1,L,D)
        u = uemb[torch.as_tensor(np.asarray(users).copy()).reshape(-1)]
        vf = vert(x).flatten(1)
        hf = torch.cat(
            [pool(F.relu(c(x).squeeze(3))).squeeze(2) for c in horizs], dim=1
        )
        feats = F.relu(fc1(torch.cat((vf, hf), dim=1)))
        q = torch.cat([feats, u], dim=1)
        scores = q @ t(params["W2"]["embedding"]).T + t(params["b2"]["embedding"])[:, 0][None]
    return q.numpy(), scores.numpy()


def test_caser_torch_transplant(tiny_dataset):
    import jax

    from recboard_tpu.models.zoo import Caser
    from test_models_smoke import _first_batch

    kw = dict(maxlen=8, embedding_dim=16, num_vert=3, num_horiz=5)
    model = Caser(tiny_dataset, num_poss=2, num_negs=2, **kw)
    batch = _first_batch(model.sure_trainpipe(8, 8))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
    )["params"]

    jax_q = model.apply({"params": params}, batch, method="encode")
    jax_scores = model.apply({"params": params}, batch, None,
                             method="recommend_from_full")
    th_q, th_scores = _torch_caser_encode(
        jax.tree.map(np.asarray, params),
        batch[model.User], batch[model.ISeq], **kw,
    )
    np.testing.assert_allclose(np.asarray(jax_q), th_q, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jax_scores), th_scores, atol=2e-5, rtol=1e-4)
