"""Modality/side-input preparation tools: the visual feature encoder,
the collaborative-feature dump (LETTER prep), and the CLI runner's
derived side inputs (sid_vocab → converter, single-corpus UniSRec)."""

import os

import numpy as np
import pytest


def test_visual_encoder_hash_backend(tiny_dataset, tmp_path):
    """VisualFeatureEncoder (hash backend) produces a well-formed
    (N, F) pickle with no image files present (URL/id fallback), and an
    MM model trains from it through the CLI
    (encode_amazon2023_context.ipynb parity)."""
    from recboard_tpu import utils
    from recboard_tpu.sem.encode import VisualFeatureEncoder

    I = tiny_dataset.fields["ITEM", "ID"].count
    enc = VisualFeatureEncoder(
        tiny_dataset.root, tiny_dataset.dataset, backend="hash",
        feature_dim=24, output_file="visual_hash_test.pkl",
    )
    out = enc.run()
    feats = np.asarray(utils.import_pickle(out), np.float32)
    assert feats.shape == (I, 24)
    assert np.isfinite(feats).all()
    # deterministic across invocations
    out2 = enc.run()
    np.testing.assert_array_equal(
        feats, np.asarray(utils.import_pickle(out2))
    )

    # an MM model consumes the encoder-produced pickle end to end
    from recboard_tpu import run as run_mod

    best = run_mod.main([
        "--model", "FREEDOM", "--root", tiny_dataset.root,
        "--dataset", tiny_dataset.dataset,
        "--vfile", "visual_hash_test.pkl",
        "--tfile", "visual_hash_test.pkl",
        "--epochs", "2", "--lr", "0.01", "--batch-size", "32",
        "--eval-freq", "10",
        "--log-path", str(tmp_path / "logs"),
        "--checkpoint-path", str(tmp_path / "infos"),
        "--log2file", "false", "--log2console", "false",
    ])
    assert "NDCG@10" in best


def test_encode_collab_features_tool(tiny_dataset, tmp_path):
    """tools/encode_collab_features.py dumps a finished run's item
    table (minus pads) as the LETTER collab pickle, and the LETTER
    tokenizer consumes it (LETTER/encode_collab_features.py parity)."""
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ))
    import encode_collab_features as ecf

    from recboard_tpu import run as run_mod
    from recboard_tpu import utils

    run_mod.main([
        "--model", "SASRec", "--root", tiny_dataset.root,
        "--dataset", tiny_dataset.dataset,
        "--epochs", "2", "--lr", "0.01", "--maxlen", "8",
        "--batch-size", "32", "--embedding-dim", "16",
        "--log-path", str(tmp_path / "logs"),
        "--checkpoint-path", str(tmp_path / "infos"),
    ])
    run_dirs = sorted(
        (tmp_path / "logs" / "SASRec" / tiny_dataset.dataset).iterdir()
    )
    out = ecf.main(["--run", str(run_dirs[-1]),
                    "--output", str(tmp_path / "collab.pkl")])
    I = tiny_dataset.fields["ITEM", "ID"].count
    feats = np.asarray(utils.import_pickle(out), np.float32)
    assert feats.shape == (I, 16)

    # LETTER aligns against it (collab_features wired through the CLI)
    from recboard_tpu.models.zoo import REGISTRY

    sem = np.random.default_rng(0).normal(size=(I, 12)).astype(np.float32)
    model = REGISTRY["LETTER"](
        tiny_dataset, item_features=sem, collab_features=feats,
        hidden_dims=(16,), codebook_dim=8, num_codebooks=2,
        num_codewords=6, num_diversity_clusters=3,
    )
    assert model.cf_weight > 0 and model.collab_features is not None


def test_tiger_launches_from_sid_vocab(tiny_dataset, tmp_path):
    """run.py builds TIGER's converter from --sid_vocab_file (the
    reference t5 config key), closing the two-stage loop through the
    generic CLI."""
    from recboard_tpu import run as run_mod
    from recboard_tpu.sem.converter import SemIDConverter
    from recboard_tpu.sem.kmeans import residual_kmeans_sids

    I = tiny_dataset.fields["ITEM", "ID"].count
    feats = np.random.default_rng(0).normal(size=(I, 12)).astype(np.float32)
    codes = residual_kmeans_sids(feats, num_codebooks=2, num_codewords=6,
                                 iters=4)
    vocab = str(tmp_path / "sid_vocab.json")
    SemIDConverter.from_codes(codes).save(vocab)
    best = run_mod.main([
        "--model", "TIGER", "--root", tiny_dataset.root,
        "--dataset", tiny_dataset.dataset,
        "--sid_vocab_file", vocab,
        "--epochs", "1", "--lr", "0.003", "--maxlen", "8",
        "--batch-size", "32", "--embedding_dim", "32", "--num_heads", "2",
        "--num_encoder_layers", "1", "--num_decoder_layers", "1",
        "--ffn_dim", "64", "--num_beams", "4", "--eval-freq", "10",
        "--log-path", str(tmp_path / "logs"),
        "--checkpoint-path", str(tmp_path / "infos"),
        "--log2file", "false", "--log2console", "false",
    ])
    assert "NDCG@10" in best


def test_unisrec_single_corpus_cli(tiny_dataset, tmp_path):
    """UniSRec launches single-corpus through the CLI: --tfile supplies
    the text features and the datasets dict degenerates to this one."""
    from recboard_tpu import run as run_mod
    from recboard_tpu import utils

    I = tiny_dataset.fields["ITEM", "ID"].count
    feats = np.random.default_rng(0).normal(size=(I, 12)).astype(np.float32)
    utils.export_pickle(
        feats, os.path.join(tiny_dataset.path, "tiny_text.pkl")
    )
    best = run_mod.main([
        "--model", "UniSRec", "--root", tiny_dataset.root,
        "--dataset", tiny_dataset.dataset, "--tfile", "tiny_text.pkl",
        "--epochs", "1", "--lr", "0.01", "--maxlen", "8",
        "--batch-size", "32", "--embedding-dim", "16", "--num-heads", "2",
        "--eval-freq", "10",
        "--log-path", str(tmp_path / "logs"),
        "--checkpoint-path", str(tmp_path / "infos"),
        "--log2file", "false", "--log2console", "false",
    ])
    assert "NDCG@10" in best
