"""End-to-end sharded training on the 8-device CPU mesh: the Coach
with num_model_shards>1 row-shards embedding tables (the recommender
TP/EP analogue) while batches ride the data axis — SURVEY.md §2.1
'parallelism strategies to build'."""

import jax
import numpy as np
import pytest


def test_coach_model_sharded_training(tiny_dataset, tmp_path):
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import MFBPR
    from recboard_tpu.parser import Parser

    assert len(jax.devices()) == 8
    p = Parser()
    p.set_defaults(
        description="MF-BPR", root="x", dataset="tiny", epochs=3, batch_size=32,
        lr=5e-2, eval_freq=3, log2file=False, log2console=False,
        log_path=str(tmp_path / "l"), checkpoint_path=str(tmp_path / "i"),
        monitors=["LOSS", "NDCG@10"], which4best="NDCG@10",
        num_model_shards=4,
    )
    cfg = p.compile([])
    model = MFBPR(tiny_dataset, embedding_dim=32)
    coach = Coach(
        dataset=tiny_dataset,
        trainpipe=model.sure_trainpipe(cfg.batch_size),
        validpipe=model.sure_validpipe(cfg.ranking),
        testpipe=None,
        model=model,
        cfg=cfg,
    )
    assert dict(coach.mesh.shape) == {"data": 2, "model": 4}
    for epoch in range(3):
        coach.train(epoch)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert losses[-1] < losses[0]

    # embedding tables actually live row-sharded over the model axis
    emb = coach.state.params["user_embeddings"]["embedding"]
    sharding = emb.sharding
    spec = getattr(sharding, "spec", None)
    assert spec is not None and tuple(spec) == ("model", None), spec
    assert len(emb.sharding.device_set) == 8 or len(emb.sharding.device_set) == 4

    # evaluation works against sharded params
    coach.evaluate(2, mode="valid")
    summary = coach._flush("valid", 2)
    assert "NDCG@10" in summary


def test_graft_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location("ge", "/root/repo/__graft_entry__.py")
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    ge.dryrun_multichip(8)  # raises on failure
