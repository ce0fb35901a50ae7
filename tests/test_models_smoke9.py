"""Smoke tests: UniSRec multi-dataset transferable training + eval."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def two_datasets(tmp_path_factory):
    from recboard_tpu.data import synthetic
    from recboard_tpu.data.datasets import NextItemRecDataSet

    root = str(tmp_path_factory.mktemp("uni"))
    synthetic.make_synthetic_dataset(root, "A_000_LOU", num_users=40, num_items=25,
                                     avg_len=8.0, seed=1)
    synthetic.make_synthetic_dataset(root, "B_000_LOU", num_users=30, num_items=35,
                                     avg_len=8.0, seed=2)
    return {
        "A": NextItemRecDataSet(root, "A_000_LOU"),
        "B": NextItemRecDataSet(root, "B_000_LOU"),
    }


def test_unisrec_multi_dataset(two_datasets, tmp_path):
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import UniSRec
    from recboard_tpu.parser import Parser

    rng = np.random.default_rng(0)
    tfeats = {
        name: rng.normal(size=(ds.fields["ITEM", "ID"].count, 12)).astype(np.float32)
        for name, ds in two_datasets.items()
    }
    model = UniSRec(
        two_datasets["A"],
        datasets=two_datasets,
        tfeats=tfeats,
        maxlen=8,
        embedding_dim=16,
        num_blocks=1,
        num_heads=2,
        num_moe_experts=2,
        hidden_dropout_rate=0.0,
        attn_dropout_rate=0.0,
        adaptor_dropout_rate=0.0,
    )
    p = Parser()
    p.set_defaults(
        description="UniSRec", root="x", dataset="A", epochs=2, batch_size=16,
        lr=2e-3, eval_freq=2, log2file=False, log2console=False,
        log_path=str(tmp_path / "l"), checkpoint_path=str(tmp_path / "i"),
        monitors=["LOSS", "HitRate@10", "NDCG@10"], which4best="NDCG@10",
    )
    cfg = p.compile([])
    coach = Coach(
        dataset=two_datasets["A"],
        trainpipe=model.sure_trainpipe(8, 16),
        validpipe=model.sure_validpipe(8, "full", batch_size=32),
        testpipe=model.sure_testpipe(8, "full", batch_size=32),
        model=model,
        cfg=cfg,
    )
    best = coach.fit()
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert losses[-1] < losses[0]
    # per-dataset namespaced metrics recorded
    valid = coach.history["valid"][-1]
    assert any(k.startswith("A$") for k in valid)
    assert any(k.startswith("B$") for k in valid)
    assert "NDCG@10" in valid
