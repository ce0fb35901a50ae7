"""Smoke test: ETEGRec joint tokenizer+generator with alternating
cycles and per-cycle code refresh."""

import numpy as np
import pytest


def test_codes_with_check_digit():
    from recboard_tpu.models.zoo.etegrec import codes_with_check_digit

    codes = np.array([[0, 1], [0, 1], [2, 3]])
    out = codes_with_check_digit(codes)
    assert out.shape == (3, 3)
    assert out[0].tolist() == [0, 1, 0]
    assert out[1].tolist() == [0, 1, 1]  # collision resolved by rank
    assert out[2].tolist() == [2, 3, 0]


def test_etegrec_cycles(tiny_dataset, tmp_path):
    from recboard_tpu.models.zoo import ETEGRec, ETEGRecCoach
    from recboard_tpu.parser import Parser

    I = tiny_dataset.fields["ITEM", "ID"].count
    feats = np.random.default_rng(0).normal(size=(I, 16)).astype(np.float32)
    model = ETEGRec(
        tiny_dataset, item_features=feats, maxlen=6, num_codebooks=2,
        num_codewords=8, codebook_dim=8, hidden_dims=(16,), embedding_dim=32,
        num_heads=2, num_layers=1, num_decoder_layers=1, ffn_dim=64,
        dropout_rate=0.0, num_beams=4,
    )
    p = Parser()
    p.set_defaults(
        description="ETEGRec", root="x", dataset="tiny", epochs=4, batch_size=16,
        lr=1e-3, eval_freq=10, log2file=False, log2console=False,
        log_path=str(tmp_path / "l"), checkpoint_path=str(tmp_path / "i"),
        monitors=["LOSS", "HitRate@10", "NDCG@10"], which4best="NDCG@10",
    )
    cfg = p.compile([])
    coach = ETEGRecCoach(
        dataset=tiny_dataset,
        trainpipe=model.sure_trainpipe(6, 16),
        validpipe=model.sure_validpipe(6, "full", batch_size=16),
        testpipe=None,
        model=model,
        cfg=cfg,
    )
    for epoch in range(4):
        coach.train(epoch)
        # reference phase rule: id phase every cycle-th epoch
        assert coach._train_id == (epoch % 2 == 0)
    losses = [h["LOSS"] for h in coach.history["train"]]
    # compare within the rec phase (the id phase trains the VQ loss)
    assert losses[3] < losses[1]
    # codes were refreshed and cover all items (+check digit column)
    assert coach._item_code.shape == (I + 1, 3)
    assert (coach._item_code[0] == -1).all()  # PAD row
    # per-phase masking: the semantic table NEVER trains, and both
    # phase optimizer states exist
    assert set(coach.state.opt_state) == {"rec", "id"}
    sem = np.asarray(coach.state.params["semantic_embedding"])
    np.testing.assert_array_equal(sem[1:], feats)
    # constrained generation + ranking metrics
    coach.evaluate(3, mode="valid")
    summary = coach._flush("valid", 3)
    assert "NDCG@10" in summary and 0.0 <= summary["NDCG@10"] <= 1.0


def test_etegrec_warm_gating_and_finetune(tiny_dataset, tmp_path):
    """warm_epoch gates the cross losses off (id phase loss = pure VQ),
    and post_training runs the code-loss finetune from the best
    checkpoint (train_etegrec.py:491-516, 583-624)."""
    from recboard_tpu.models.zoo import ETEGRec, ETEGRecCoach
    from recboard_tpu.parser import Parser

    I = tiny_dataset.fields["ITEM", "ID"].count
    feats = np.random.default_rng(0).normal(size=(I, 16)).astype(np.float32)
    model = ETEGRec(
        tiny_dataset, item_features=feats, maxlen=6, num_codebooks=2,
        num_codewords=8, codebook_dim=8, hidden_dims=(16,), embedding_dim=32,
        num_heads=2, num_layers=1, num_decoder_layers=1, ffn_dim=64,
        dropout_rate=0.0, num_beams=4,
    )
    p = Parser()
    p.set_defaults(
        description="ETEGRec", root="x", dataset="tiny", epochs=2,
        batch_size=16, lr=1e-3, lr_rec=1e-3, lr_id=1e-4, warm_epoch=1,
        cycle=2, finetune_epochs=1, finetune_lr=5e-4, warmup_steps=4,
        eval_freq=1, log2file=False, log2console=False,
        log_path=str(tmp_path / "l"), checkpoint_path=str(tmp_path / "i"),
        monitors=["LOSS", "NDCG@10"], which4best="NDCG@10",
    )
    cfg = p.compile([])
    coach = ETEGRecCoach(
        dataset=tiny_dataset,
        trainpipe=model.sure_trainpipe(6, 16),
        validpipe=model.sure_validpipe(6, "full", batch_size=16),
        testpipe=model.sure_testpipe(6, "full", batch_size=16),
        model=model,
        cfg=cfg,
    )
    coach.train(0)
    assert coach._train_id and not coach._warmed  # epoch 0 < warm_epoch
    coach.train(1)
    assert not coach._train_id and coach._warmed
    # finetune phase: runs without error, trains rec-only at finetune_lr
    coach.save(best=True)
    coach.post_training()
    assert not getattr(coach, "_finetuning", True)
    # finetuned epochs landed in the train history beyond cfg.epochs
    assert any(h["epoch"] >= 2 for h in coach.history["train"])


def test_diger_joint(tiny_dataset, tmp_path):
    from recboard_tpu.models.zoo import DIGER, DIGERCoach
    from recboard_tpu.parser import Parser

    I = tiny_dataset.fields["ITEM", "ID"].count
    feats = np.random.default_rng(1).normal(size=(I, 16)).astype(np.float32)
    model = DIGER(
        tiny_dataset, item_features=feats, maxlen=6, num_codebooks=2,
        num_codewords=8, codebook_dim=8, hidden_dims=(16,), embedding_dim=32,
        num_heads=2, num_layers=1, num_decoder_layers=1, ffn_dim=64,
        dropout_rate=0.0, num_beams=4,
    )
    p = Parser()
    p.set_defaults(
        description="DIGER", root="x", dataset="tiny", epochs=3, batch_size=16,
        lr=1e-3, eval_freq=10, log2file=False, log2console=False,
        log_path=str(tmp_path / "l"), checkpoint_path=str(tmp_path / "i"),
        monitors=["LOSS", "NDCG@10"], which4best="NDCG@10",
    )
    cfg = p.compile([])
    coach = DIGERCoach(
        dataset=tiny_dataset,
        trainpipe=model.sure_trainpipe(6, 16),
        validpipe=model.sure_validpipe(6, "full", batch_size=16),
        testpipe=None,
        model=model,
        cfg=cfg,
    )
    for epoch in range(3):
        coach.train(epoch)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert losses[-1] < losses[0]
    coach.evaluate(2, mode="valid")
    summary = coach._flush("valid", 2)
    assert "NDCG@10" in summary


def test_etegrec_stage_a_transplant(tiny_dataset, tmp_path):
    """--rqvae_path warm-starts the joint tokenizer from a stage-A RQVAE
    payload (reference model_id.load_state_dict, train_etegrec.py:
    169-170): encoder + codebook tensors must land in the joint params."""
    import jax
    import jax.numpy as jnp

    from recboard_tpu import utils
    from recboard_tpu.models.zoo import ETEGRec, ETEGRecCoach, RQVAE
    from recboard_tpu.parser import Parser

    I = tiny_dataset.fields["ITEM", "ID"].count
    feats = np.random.default_rng(0).normal(size=(I, 16)).astype(np.float32)
    rqvae = RQVAE(
        tiny_dataset, item_features=feats, num_codebooks=2, num_codewords=8,
        codebook_dim=8, hidden_dims=(16,),
    )
    rq_params = rqvae.init(
        {"params": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        {rqvae.Item: jnp.arange(4)},
        method="fit",
    )["params"]
    ckpt = tmp_path / "stage_a.pkl"
    utils.export_pickle({"params": jax.tree.map(np.asarray, rq_params)}, str(ckpt))

    model = ETEGRec(
        tiny_dataset, item_features=feats, maxlen=6, num_codebooks=2,
        num_codewords=8, codebook_dim=8, hidden_dims=(16,), embedding_dim=32,
        num_heads=2, num_layers=1, num_decoder_layers=1, ffn_dim=64,
        dropout_rate=0.0, num_beams=4,
    )
    p = Parser()
    p.set_defaults(
        description="ETEGRec", root="x", dataset="tiny", epochs=1,
        # epoch 0 is an id epoch (cycle rule) — lr_id=0 keeps the
        # transplanted tokenizer byte-stable through it
        batch_size=16, lr=1e-3, lr_id=0.0, rqvae_path=str(ckpt), eval_freq=10,
        log2file=False, log2console=False,
        log_path=str(tmp_path / "l"), checkpoint_path=str(tmp_path / "i"),
        monitors=["LOSS", "NDCG@10"], which4best="NDCG@10",
    )
    cfg = p.compile([])
    coach = ETEGRecCoach(
        dataset=tiny_dataset,
        trainpipe=model.sure_trainpipe(6, 16),
        validpipe=None, testpipe=None, model=model, cfg=cfg,
    )
    coach.train(0)  # triggers init + transplant
    for l in range(2):
        np.testing.assert_allclose(
            np.asarray(coach.state.params["rq"][f"codebook_{l}"]),
            np.asarray(rq_params["quantizer"][f"codebook_{l}"]),
        )
    enc_keys = [k for k in rq_params if k.startswith("enc_layers")]
    assert enc_keys, "stage-A payload lost its encoder layers"
    for k in enc_keys:
        np.testing.assert_allclose(
            np.asarray(coach.state.params[k]["kernel"]),
            np.asarray(rq_params[k]["kernel"]),
        )
