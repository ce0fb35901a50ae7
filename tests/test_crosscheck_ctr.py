"""CTR crosschecks vs torch: exact BatchNorm semantics + DCN transplant.

1. TorchBatchNorm vs torch.nn.BatchNorm1d: train-mode outputs AND the
   running-stat updates must match bit-for-bit semantics — torch stores
   the UNBIASED batch variance in running_var (n/(n-1) before the EMA)
   while normalizing with the biased one; eval mode must then agree.
2. DCN (batch_norm=True) forward transplant: CrossNet + DNN with BN in
   eval mode against a torch transcription of the reference
   (DCN/main.py:35-160), with our evolved running stats transplanted.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_torch_batchnorm_semantics():
    import jax
    import jax.numpy as jnp

    from recboard_tpu.models.modules import TorchBatchNorm

    bn = TorchBatchNorm()
    x1 = np.random.default_rng(0).normal(2.0, 3.0, (64, 8)).astype(np.float32)
    x2 = np.random.default_rng(1).normal(-1.0, 0.5, (64, 8)).astype(np.float32)

    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x1),
                        use_running_average=False)
    params, stats = variables["params"], variables["batch_stats"]

    tbn = torch.nn.BatchNorm1d(8)
    tbn.train()
    t1 = tbn(torch.as_tensor(x1.copy()))
    t2 = tbn(torch.as_tensor(x2.copy()))

    out1, upd = bn.apply({"params": params, "batch_stats": stats},
                         jnp.asarray(x1), use_running_average=False,
                         mutable=["batch_stats"])
    out2, upd = bn.apply({"params": params, **upd},
                         jnp.asarray(x2), use_running_average=False,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out1), t1.detach().numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out2), t2.detach().numpy(),
                               atol=1e-5, rtol=1e-5)
    # running stats after two updates — incl. the unbiased-var EMA
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["var"]),
                               tbn.running_var.numpy(), atol=1e-5, rtol=1e-5)

    # eval mode agrees through the stored stats
    tbn.eval()
    te = tbn(torch.as_tensor(x1.copy()))
    oe = bn.apply({"params": params, **upd}, jnp.asarray(x1),
                  use_running_average=True)
    np.testing.assert_allclose(np.asarray(oe), te.detach().numpy(),
                               atol=1e-5, rtol=1e-5)


def test_dcn_bn_torch_transplant(tmp_path):
    import jax
    import jax.numpy as jnp

    from recboard_tpu.data.synthetic import CTR_FIELDS_CFG, make_synthetic_ctr_dataset
    from recboard_tpu.data.datasets import PredictionRecDataSet
    from recboard_tpu.models.zoo import REGISTRY

    make_synthetic_ctr_dataset(str(tmp_path), "SynCTR", seed=3)
    ds = PredictionRecDataSet(str(tmp_path), "SynCTR", cfg=CTR_FIELDS_CFG)
    model = REGISTRY["DCN"](ds, embedding_dim=4, hidden_dims=(16, 8),
                            hidden_dropout_rate=0.0, batch_norm=True)
    batch = next(iter(model.sure_trainpipe(64)))
    batch = {f: jnp.asarray(v) for f, v in batch.items()
             if isinstance(v, np.ndarray)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sampling": jax.random.PRNGKey(2)}, batch,
    )
    params, stats = variables["params"], {"batch_stats": variables["batch_stats"]}
    # evolve running stats with two train-mode forwards
    for _ in range(2):
        _, new_stats = model.apply(
            {"params": params, **stats}, batch, method="fit",
            rngs={"dropout": jax.random.PRNGKey(3),
                  "sampling": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        stats = dict(new_stats)

    jax_scores = model.apply({"params": params, **stats}, batch, None,
                             method="recommend_from_pool")

    # torch transcription of the reference forward in EVAL mode
    p = jax.tree.map(np.asarray, params)
    bs = jax.tree.map(np.asarray, stats["batch_stats"])
    t = lambda a: torch.as_tensor(np.asarray(a).copy(), dtype=torch.float32)
    embs = []
    for field in model.input_fields:
        v = np.asarray(batch[field])
        pf = p["embeddings"][f"embeddings_{field.name}"]
        if "embedding" in pf:
            e = np.asarray(pf["embedding"])[v]
        else:
            e = v[..., None].astype(np.float32) @ np.asarray(pf["kernel"])
        embs.append(e.reshape(len(v), -1))
    x0 = torch.as_tensor(np.concatenate(embs, axis=1))
    xi = x0
    for i in range(3):
        w = t(p[f"cross_w_{i}"]["kernel"])
        xi = (xi @ w) * x0 + t(p[f"cross_b_{i}"])
    h = x0
    for i, key in enumerate(["dnn_layers_0", "dnn_layers_1"]):
        h = h @ t(p[key]["kernel"]) + t(p[key]["bias"])
        nb = bs[f"dnn_norms_{i}"]
        pb = p[f"dnn_norms_{i}"]
        h = (h - t(nb["mean"])) / torch.sqrt(t(nb["var"]) + 1e-5) \
            * t(pb["scale"]) + t(pb["bias"])
        h = torch.relu(h)
    logits = torch.cat([h, xi], dim=1) @ t(p["fc"]["kernel"]) + t(p["fc"]["bias"])
    th_scores = torch.sigmoid(logits[:, 0]).numpy()

    np.testing.assert_allclose(np.asarray(jax_scores), th_scores,
                               atol=2e-5, rtol=1e-4)
