"""CTR path: PredictionRecDataSet schema, DeepFM/DCN training, AUC eval
through the Coach (DeepFM/README.md monitors AUC/LOGLOSS)."""

import os

import numpy as np
import pytest

from recboard_tpu.data.synthetic import CTR_FIELDS_CFG, make_synthetic_ctr_dataset
from recboard_tpu.data.datasets import PredictionRecDataSet
from recboard_tpu.data.tags import DENSE, LABEL, SPARSE


@pytest.fixture(scope="module")
def ctr_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ctr"))
    make_synthetic_ctr_dataset(root, "SynCTR", seed=3)
    return PredictionRecDataSet(root, "SynCTR", cfg=CTR_FIELDS_CFG)


def test_schema(ctr_dataset):
    ds = ctr_dataset
    label = ds.fields[LABEL]
    assert label is not None
    sparse = ds.fields.match(SPARSE)
    assert {f.name for f in sparse} >= {"User", "Item", "Cat"}
    dense = ds.fields.match(DENSE)
    assert [f.name for f in dense] == ["Price"]
    price = ds.train().columns()[dense[0]]
    assert 0.0 <= price.min() and price.max() <= 1.0  # minmax normalized


@pytest.mark.parametrize("name", ["DeepFM", "DCN"])
def test_ctr_model_trains_and_aucs(ctr_dataset, name, tmp_path):
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.parser import Parser

    p = Parser()
    p.set_defaults(
        description=name,
        root=str(tmp_path),
        dataset="SynCTR",
        tasktag="PREDICTION",
        ranking="pool",
        epochs=6,
        batch_size=256,
        lr=1e-2,
        eval_freq=1,
        log2file=False,
        log2console=False,
        log_path=os.path.join(str(tmp_path), "logs"),
        checkpoint_path=os.path.join(str(tmp_path), "infos"),
        monitors=["LOSS", "AUC", "LOGLOSS"],
        which4best="AUC",
        seed=0,
    )
    cfg = p.compile([])
    model = REGISTRY[name](
        ctr_dataset, embedding_dim=8, hidden_dims=(32, 16), hidden_dropout_rate=0.0
    )
    coach = Coach(
        dataset=ctr_dataset,
        trainpipe=model.sure_trainpipe(cfg.batch_size),
        validpipe=model.sure_validpipe(batch_size=512),
        testpipe=model.sure_testpipe(batch_size=512),
        model=model,
        cfg=cfg,
    )
    best = coach.fit()
    assert best.get("AUC", 0) > 0.62  # learnable structure → well above chance
    assert best.get("LOGLOSS", 10) < 0.75


@pytest.mark.parametrize("name", ["DeepFM", "DCN"])
def test_ctr_batch_norm_trains_and_checkpoints(ctr_dataset, name, tmp_path):
    """batch_norm=True (the reference's Criteo/Frappe BARS configs):
    BatchNorm running stats thread through the Coach as a mutable
    collection, update during training, drive eval, and survive the
    save/load roundtrip."""
    import jax

    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.parser import Parser

    p = Parser()
    p.set_defaults(
        description=name, root=str(tmp_path), dataset="SynCTR",
        tasktag="PREDICTION", ranking="pool", epochs=4, batch_size=256,
        lr=1e-2, eval_freq=2, log2file=False, log2console=False,
        log_path=os.path.join(str(tmp_path), "logs"),
        checkpoint_path=os.path.join(str(tmp_path), "infos"),
        monitors=["LOSS", "AUC", "LOGLOSS"], which4best="AUC", seed=0,
    )
    cfg = p.compile([])
    model = REGISTRY[name](
        ctr_dataset, embedding_dim=8, hidden_dims=(32, 16),
        hidden_dropout_rate=0.0, batch_norm=True,
    )
    coach = Coach(
        dataset=ctr_dataset,
        trainpipe=model.sure_trainpipe(cfg.batch_size),
        validpipe=model.sure_validpipe(batch_size=512),
        testpipe=model.sure_testpipe(batch_size=512),
        model=model,
        cfg=cfg,
    )
    best = coach.fit()
    assert best.get("AUC", 0) > 0.6

    stats = coach.state.stats
    assert "batch_stats" in stats and jax.tree.leaves(stats["batch_stats"])
    # running stats actually moved off their init (mean 0 / var 1)
    means = jax.tree.leaves(
        {k: v for k, v in stats["batch_stats"].items()}
    )
    assert any(float(abs(np.asarray(m)).max()) > 1e-3 for m in means)

    # save/load roundtrip preserves the running stats
    coach.save("bn_test.pkl")
    before = jax.tree.map(np.asarray, stats)
    coach.state = None
    coach.load(filename="bn_test.pkl")
    after = jax.tree.map(np.asarray, coach.state.stats)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_ctr_coach_embedding_decay_and_plateau(ctr_dataset, tmp_path):
    """CTRCoach: embeddings decay by embedding_decay while other params
    decay by weight_decay (DeepFM/main.py:187-199), and the plateau
    scheduler drops the lr when the best metric stalls."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.models.zoo.ctr import CTRCoach
    from recboard_tpu.parser import Parser

    p = Parser()
    p.set_defaults(
        description="DeepFM", root=str(tmp_path), dataset="SynCTR",
        tasktag="PREDICTION", ranking="pool", epochs=2, batch_size=256,
        lr=1e-2, eval_freq=1, log2file=False, log2console=False,
        log_path=str(tmp_path / "logs"), checkpoint_path=str(tmp_path / "infos"),
        monitors=["LOSS", "AUC"], which4best="AUC", seed=0,
        embedding_decay=0.5, weight_decay=0.0,
        lr_scheduler={"which": "plateau", "patience": 1, "factor": 0.5},
    )
    cfg = p.compile([])
    model = REGISTRY["DeepFM"](ctr_dataset, embedding_dim=8, hidden_dims=(16,),
                               hidden_dropout_rate=0.0)
    assert getattr(type(model), "COACH", None) is CTRCoach
    coach = CTRCoach(
        dataset=ctr_dataset,
        trainpipe=model.sure_trainpipe(cfg.batch_size),
        validpipe=model.sure_validpipe(batch_size=512),
        testpipe=None, model=model, cfg=cfg,
    )
    coach.train(0)

    # per-group decay: zero grads -> only embedding params shrink
    params = coach.state.params
    zeros = jax.tree.map(jnp.zeros_like, params)
    ups, _ = coach.optimizer.update(zeros, coach.optimizer.init(params), params)

    def flat(tree):
        return {
            "/".join(str(getattr(k, "key", k)) for k in path): leaf
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
        }

    f_up, f_p = flat(ups), flat(params)
    for name, u in f_up.items():
        if "embeddings" in name and "kernel" not in name:
            # decayed: update ≈ -lr * ed * param (through adam scaling it
            # is simply nonzero and opposite-signed where param != 0)
            nz = np.abs(np.asarray(f_p[name])) > 1e-8
            if nz.any():
                assert np.abs(np.asarray(u)[nz]).max() > 0
        elif "embeddings" not in name:
            np.testing.assert_allclose(np.asarray(u), 0.0, atol=1e-12)

    # plateau: force a stall and check the lr halves + step recompiles
    coach._stopping_steps = 1
    lr_before = coach._current_lr
    coach.train(1)
    assert coach._current_lr == pytest.approx(lr_before * 0.5)

    # improvement resets the drop tracker so a LATER plateau reaching
    # the same stall count drops again (torch ReduceLROnPlateau resets
    # num_bad_epochs on improvement)
    coach._stopping_steps = 0
    coach.train(1)
    assert coach._last_lr_drop == -1
    coach._stopping_steps = 1
    lr_mid = coach._current_lr
    coach.train(1)
    assert coach._current_lr == pytest.approx(lr_mid * 0.5)

    # min_lr clamps the decay (BARS configs set min_lr: 1e-6)
    coach.cfg.lr_scheduler["min_lr"] = coach._current_lr
    coach._stopping_steps = 0
    coach.train(1)
    coach._stopping_steps = 1
    lr_floor = coach._current_lr
    coach.train(1)
    assert coach._current_lr == lr_floor


def _adam_update_scale(optimizer, params):
    """|update| of a constant-gradient adam step ≈ the effective lr."""
    import jax
    import jax.numpy as jnp

    grads = jax.tree.map(jnp.ones_like, params)
    ups, _ = optimizer.update(grads, optimizer.init(params), params)
    return float(np.abs(np.asarray(jax.tree.leaves(ups)[0])).max())


def test_ctr_plateau_without_embedding_decay(ctr_dataset, tmp_path):
    """The plateau drop must take effect even when embedding_decay is
    unset (set_optimizer falls back to the base Coach): the rebuilt
    optimizer's effective lr is the decayed one, not cfg.lr."""
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.models.zoo.ctr import CTRCoach
    from recboard_tpu.parser import Parser

    p = Parser()
    p.set_defaults(
        description="DCN", root=str(tmp_path), dataset="SynCTR",
        tasktag="PREDICTION", ranking="pool", epochs=2, batch_size=256,
        lr=1e-2, eval_freq=1, log2file=False, log2console=False,
        log_path=str(tmp_path / "logs"), checkpoint_path=str(tmp_path / "infos"),
        monitors=["LOSS", "AUC"], which4best="AUC", seed=0,
        lr_scheduler={"which": "plateau", "patience": 1, "factor": 0.5},
    )
    cfg = p.compile([])
    model = REGISTRY["DCN"](ctr_dataset, embedding_dim=4, hidden_dims=(8,))
    coach = CTRCoach(
        dataset=ctr_dataset,
        trainpipe=model.sure_trainpipe(cfg.batch_size),
        validpipe=model.sure_validpipe(batch_size=512),
        testpipe=None, model=model, cfg=cfg,
    )
    coach.train(0)
    before = _adam_update_scale(coach.optimizer, coach.state.params)
    coach._stopping_steps = 1
    coach.train(1)
    after = _adam_update_scale(coach.optimizer, coach.state.params)
    assert after == pytest.approx(before * 0.5, rel=1e-3)
    assert float(coach.cfg.lr) == pytest.approx(1e-2)  # cfg.lr untouched
