"""Minimum end-to-end slice (SURVEY.md §7): MF-BPR trains on the
synthetic dataset, beats a random ranker, and emits the reference's
output artifacts (results.json / SUMMARY.md / monitors.pkl)."""

import json
import os

import pytest

from recboard_tpu.launcher import Coach
from recboard_tpu.models.zoo import MFBPR
from recboard_tpu.parser import Parser


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    from recboard_tpu.data import synthetic

    root = str(tmp_path_factory.mktemp("e2e"))
    # MF-learnable structure: strong user-group affinity, no markov
    synthetic.make_synthetic_dataset(
        root, "E2E_000_LOU", num_users=120, num_items=60, avg_len=10.0, seed=11,
        markov_strength=0.05, group_strength=0.85,
    )
    from recboard_tpu.data.datasets import NextItemRecDataSet

    ds = NextItemRecDataSet(root, "E2E_000_LOU")

    p = Parser()
    p.set_defaults(
        description="MF-BPR",
        root=root,
        dataset="E2E_000_LOU",
        epochs=9,
        batch_size=64,
        lr=8e-2,
        weight_decay=1e-4,
        eval_freq=3,
        log2file=False,
        log2console=False,
        log_path=os.path.join(root, "logs"),
        checkpoint_path=os.path.join(root, "infos"),
        monitors=["LOSS", "HitRate@5", "HitRate@10", "NDCG@10"],
        which4best="NDCG@10",
        seed=1,
    )
    cfg = p.compile([])
    model = MFBPR(ds, embedding_dim=32)
    coach = Coach(
        dataset=ds,
        trainpipe=model.sure_trainpipe(cfg.batch_size),
        validpipe=model.sure_validpipe(cfg.ranking),
        testpipe=model.sure_testpipe(cfg.ranking),
        model=model,
        cfg=cfg,
    )
    best = coach.fit()
    return ds, cfg, coach, best


def test_training_learns(run):
    ds, cfg, coach, best = run
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert losses[-1] < losses[0]
    # random ranker HR@10 ≈ 10/60; the model must beat 1.5x random
    assert best["HITRATE@10"] > 1.5 * (10 / 60)


def test_artifacts_written(run):
    ds, cfg, coach, best = run
    results = json.load(open(os.path.join(cfg.LOG_PATH, "results.json")))
    assert results["params"]["seed"] == 1
    assert "best" in results["metrics"] and "valid" in results["metrics"]
    assert os.path.isfile(os.path.join(cfg.LOG_PATH, cfg.SUMMARY_FILENAME))
    assert os.path.isfile(os.path.join(cfg.LOG_PATH, cfg.MONITOR_FILENAME))
    assert os.path.isfile(os.path.join(cfg.CHECKPOINT_PATH, cfg.BEST_FILENAME))


def test_checkpoint_resume(run):
    ds, cfg, coach, best = run
    # fresh coach resumes from the saved checkpoint
    model = MFBPR(ds, embedding_dim=32)
    cfg2 = dict(cfg)
    from recboard_tpu.parser import Config

    cfg2 = Config(cfg2)
    cfg2["resume"] = True
    coach2 = Coach(
        dataset=ds,
        trainpipe=model.sure_trainpipe(cfg.batch_size),
        validpipe=None,
        testpipe=None,
        model=model,
        cfg=cfg2,
    )
    epoch = coach2.resume()
    assert epoch == 9  # all epochs done
    assert coach2.state is not None


def test_checkpoint_rng_impl_mismatch_reseeds(run):
    """A checkpoint written under a different jax_default_prng_impl has a
    differently-shaped raw key (threefry: 2 uint32 words, rbg: 4); resume
    must reseed from cfg.seed instead of crashing in fold_in/split."""
    import numpy as np

    from recboard_tpu import utils
    from recboard_tpu.parser import Config

    ds, cfg, coach, best = run
    file_ = os.path.join(cfg.CHECKPOINT_PATH, cfg.CHECKPOINT_FILENAME)
    payload = utils.import_pickle(file_)
    native_width = np.asarray(payload["rng"]).shape[-1]
    foreign_width = 4 if native_width == 2 else 2
    payload["rng"] = np.zeros((foreign_width,), dtype=np.uint32)
    utils.export_pickle(payload, file_)
    try:
        model = MFBPR(ds, embedding_dim=32)
        cfg2 = Config(dict(cfg))
        cfg2["resume"] = True
        coach2 = Coach(
            dataset=ds,
            trainpipe=model.sure_trainpipe(cfg.batch_size),
            validpipe=None,
            testpipe=None,
            model=model,
            cfg=cfg2,
        )
        assert coach2.resume() == 9
        import jax

        assert coach2._rng.shape == jax.random.PRNGKey(0).shape
    finally:
        payload["rng"] = np.zeros((native_width,), dtype=np.uint32)
        utils.export_pickle(payload, file_)


def test_checkpoint_orbax_roundtrip(run, tmp_path):
    """--checkpoint-backend orbax: save via AsyncCheckpointer, resume
    restores params/opt_state/history/rng like the pickle backend."""
    import numpy as np

    ds, cfg, coach, best = run
    from recboard_tpu.parser import Config

    cfg2 = Config(dict(cfg))
    cfg2["checkpoint_backend"] = "orbax"
    cfg2["CHECKPOINT_PATH"] = str(tmp_path / "orbax_infos")

    model = MFBPR(ds, embedding_dim=32)
    coach2 = Coach(
        dataset=ds,
        trainpipe=model.sure_trainpipe(cfg.batch_size),
        validpipe=None,
        testpipe=None,
        model=model,
        cfg=cfg2,
    )
    # seed from the trained coach so we roundtrip non-trivial state
    coach2.state = coach.state
    coach2.history = {k: list(v) for k, v in coach.history.items()}
    coach2._best, coach2._best_epoch, coach2._stopping_steps = (
        coach._best, coach._best_epoch, coach._stopping_steps,
    )
    coach2.save_checkpoint(epoch=4)
    coach2._join_checkpoint_writer()

    model3 = MFBPR(ds, embedding_dim=32)
    cfg3 = Config(dict(cfg2))
    cfg3["resume"] = True
    coach3 = Coach(
        dataset=ds,
        trainpipe=model3.sure_trainpipe(cfg.batch_size),
        validpipe=None,
        testpipe=None,
        model=model3,
        cfg=cfg3,
    )
    assert coach3.resume() == 5
    for a, b in zip(
        jax.tree.leaves(coach.state.params), jax.tree.leaves(coach3.state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # optimizer moments survive a fresh-process resume (CHECKPOINT_MODULES)
    for a, b in zip(
        jax.tree.leaves(coach.state.opt_state),
        jax.tree.leaves(coach3.state.opt_state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert coach3._best == coach._best
    assert coach3.history["train"] == coach.history["train"]


import jax  # noqa: E402  (used by the orbax roundtrip test)
