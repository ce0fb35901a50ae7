"""End-to-end serving: train a tiny run via the CLI, then `recommend`
must reload it and emit top-k TSV whose sanity HitRate matches the
run's recorded test metric (recboard_tpu/serve.py)."""

import os

import numpy as np


def test_recommend_roundtrip(tiny_dataset, tmp_path, capsys):
    from recboard_tpu import run as run_mod
    from recboard_tpu import serve

    root = tiny_dataset.root
    best = run_mod.main([
        "--model", "SASRec", "--root", root, "--dataset", tiny_dataset.dataset,
        "--epochs", "3", "--lr", "0.01", "--maxlen", "10",
        "--batch-size", "16",
        "--log-path", str(tmp_path / "logs"),
        "--checkpoint-path", str(tmp_path / "infos"),
    ])
    run_dirs = sorted((tmp_path / "logs" / "SASRec" / tiny_dataset.dataset).iterdir())
    assert run_dirs, "run dir with config.yaml expected"
    out = tmp_path / "recs.tsv"
    serve.main([
        "--run", str(run_dirs[-1]), "--topk", "7", "--output", str(out),
    ])
    lines = out.read_text().strip().splitlines()
    rows = [line.split("\t") for line in lines]
    n_items = tiny_dataset.fields["ITEM", "ID"].count
    # one row per test user, k items each, all valid ids, no duplicates
    assert len(rows) == len(set(r[0] for r in rows))
    for r in rows:
        items = [int(x) for x in r[1:]]
        assert len(items) == 7
        assert len(set(items)) == 7
        assert all(0 <= it < n_items for it in items)

    # with-scores variant: descending scores
    out2 = tmp_path / "recs_scored.tsv"
    serve.main([
        "--run", str(run_dirs[-1]), "--topk", "5", "--with-scores",
        "--output", str(out2),
    ])
    first = out2.read_text().strip().splitlines()[0].split("\t")[1:]
    scores = [float(x.split(":")[1]) for x in first]
    assert scores == sorted(scores, reverse=True)
    assert best  # run returned its best metrics

    # sharded serving: params over the (data, model) mesh must emit the
    # SAME top-k lists as the single-device path
    out3 = tmp_path / "recs_sharded.tsv"
    serve.main([
        "--run", str(run_dirs[-1]), "--topk", "7",
        "--num-model-shards", "4", "--output", str(out3),
    ])
    assert out3.read_text() == out.read_text()

    # blocked (streaming) full-catalog ranking: slab-scanned top-k
    # (parallel/big_table.blocked_top_k) must emit the SAME lists as
    # the dense path — the single-chip route for 10M+-row catalogs
    out4 = tmp_path / "recs_blocked.tsv"
    serve.main([
        "--run", str(run_dirs[-1]), "--topk", "7",
        "--blocked-topk", "13", "--output", str(out4),
    ])
    assert out4.read_text() == out.read_text()

    # bench mode: one JSON latency line, no TSV
    serve.main(["--run", str(run_dirs[-1]), "--bench", "--topk", "7"])
    import json

    line = capsys.readouterr().out.strip().splitlines()[-1]
    stats = json.loads(line)
    assert stats["metric"] == "recommend_latency_ms"
    assert stats["p50"] <= stats["p95"] <= stats["p99"]
    assert stats["users_per_s"] > 0

    # bench staging is bounded: --bench-batches caps HBM residency
    serve.main(["--run", str(run_dirs[-1]), "--bench", "--topk", "7",
                "--batch-size", "4", "--bench-batches", "2"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["batches"] == 2


def test_recommend_partial_checkpoint(tiny_dataset, tmp_path):
    """E4SRecCoach saves only the trainable subset; `recommend` must
    rebuild the frozen backbone from the run's seed, merge the subset,
    and serve valid top-k lists (ADVICE r1: partial payloads previously
    crashed serve.py on None leaves)."""
    from recboard_tpu import run as run_mod
    from recboard_tpu import serve, utils

    root = tiny_dataset.root
    I = tiny_dataset.fields["ITEM", "ID"].count
    feats = np.random.default_rng(0).normal(size=(I, 12)).astype(np.float32)
    tfile = "tiny_feats_serve.pkl"
    utils.export_pickle(feats, os.path.join(tiny_dataset.path, tfile))
    run_mod.main([
        "--model", "E4SRec", "--root", root, "--dataset", tiny_dataset.dataset,
        "--epochs", "2", "--lr", "0.005", "--maxlen", "8",
        "--batch-size", "16", "--tfile", tfile,
        "--backbone_dim", "32", "--num_blocks", "1", "--num-heads", "2",
        "--lora_rank", "4",
        "--log-path", str(tmp_path / "logs"),
        "--checkpoint-path", str(tmp_path / "infos"),
    ])
    run_dirs = sorted(
        (tmp_path / "logs" / "E4SRec" / tiny_dataset.dataset).iterdir()
    )
    out = tmp_path / "recs_partial.tsv"
    serve.main([
        "--run", str(run_dirs[-1]), "--topk", "5", "--output", str(out),
    ])
    rows = [line.split("\t") for line in out.read_text().strip().splitlines()]
    assert rows
    for r in rows:
        items = [int(x) for x in r[1:]]
        assert len(items) == 5 and len(set(items)) == 5
        assert all(0 <= it < I for it in items)
