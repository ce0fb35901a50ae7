"""Raw-Amazon → Processed → training drill (the real-data path).

Reference flow: preprocess_amazon2023_context.ipynb — extract reviews
jsonl → k-core filter → LOU split → (encode item text). This exercises
the whole chain on an in-repo 20-user fixture so real-data parity is a
data-drop away: `python -m recboard_tpu make <name> reviews.jsonl.gz
--format amazon2023 --meta-file meta.jsonl.gz` then a training run.
"""

import gzip
import json
import os
import shutil

import numpy as np

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _gz(src, dst):
    with open(src, "rb") as fh, gzip.open(dst, "wb") as out:
        shutil.copyfileobj(fh, out)
    return dst


def test_make_from_amazon2023_and_train(tmp_path):
    reviews = _gz(os.path.join(FIX, "amazon2023_reviews_tiny.jsonl"),
                  str(tmp_path / "reviews.jsonl.gz"))
    meta = _gz(os.path.join(FIX, "amazon2023_meta_tiny.jsonl"),
               str(tmp_path / "meta.jsonl.gz"))
    root = str(tmp_path / "data")

    from recboard_tpu import cli

    cli.main([
        "make", "TinyAmazon_220_LOU", reviews,
        "--format", "amazon2023", "--meta-file", meta,
        "--root", root, "--kcore4user", "2", "--kcore4item", "2",
    ])

    path = os.path.join(root, "Processed", "TinyAmazon_220_LOU")
    meta_json = json.load(open(os.path.join(path, "meta.json")))
    assert meta_json["num_users"] == 20      # all users survive 2-core
    assert meta_json["num_items"] > 0
    assert meta_json["splitting"] == "LOU"

    # item.txt carries the metadata columns keyed by the DENSE ids the
    # models consume; the sanitizer must have flattened the embedded tab
    with open(os.path.join(path, "item.txt")) as fh:
        header = fh.readline().rstrip("\n").split("\t")
        assert header[0] == "ITEM:ID"
        assert {"TITLE", "CATEGORIES", "BRAND"} <= set(header[1:])
        rows = [ln.rstrip("\n").split("\t") for ln in fh]
    assert len(rows) == meta_json["num_items"]
    titled = [r for r in rows if len(r) > 1 and r[header.index("TITLE")]]
    assert titled and all("\t" not in r[header.index("TITLE")] for r in titled)
    assert any("Tiny Product" in r[header.index("TITLE")] for r in titled)

    # the junk review (no item id) must not have leaked in
    train = open(os.path.join(path, "train.txt")).read()
    assert "AUSER9999" not in train

    # LOU contract: every split non-empty, valid/test one row per user
    for split in ("valid", "test"):
        with open(os.path.join(path, f"{split}.txt")) as fh:
            fh.readline()
            assert sum(1 for _ in fh) == meta_json["num_users"]

    # encode the item text (hash backend — no model weights in-image)
    # exactly as the semantic-ID pipelines would consume it
    from recboard_tpu.sem import encode

    encode.main([
        "--root", root, "--dataset", "TinyAmazon_220_LOU",
        "--modality", "text", "--backend", "hash",
        "--feature-dim", "16",
        "--output-file", "tiny_text_feats.pkl",
    ])
    from recboard_tpu import utils

    feats = np.asarray(utils.import_pickle(
        os.path.join(path, "tiny_text_feats.pkl")))
    assert feats.shape == (meta_json["num_items"], 16)
    assert np.isfinite(feats).all()

    # one real training run end-to-end on the built dataset
    import runpy
    import sys

    sys.argv = [
        "run", "--model", "MF-BPR", "--root", root,
        "--dataset", "TinyAmazon_220_LOU", "--epochs", "3",
        "--lr", "0.05", "--eval-freq", "2", "--seed", "0",
        "--log-path", str(tmp_path / "logs"),
        "--checkpoint-path", str(tmp_path / "infos"),
    ]
    runpy.run_module("recboard_tpu.run", run_name="__main__")
    run_dirs = list(
        (tmp_path / "logs" / "MF-BPR" / "TinyAmazon_220_LOU").iterdir()
    )
    results = json.load(open(os.path.join(run_dirs[0], "results.json")))
    assert "NDCG@10" in results["metrics"]["best"]


def test_make_from_amazon2014_csv(tmp_path):
    # 2014 ratings-only CSV path (data/amazon.py:76-88)
    csv = tmp_path / "ratings.csv"
    rng = np.random.default_rng(3)
    with open(csv, "w") as fh:
        for u in range(12):
            for j, it in enumerate(rng.permutation(10)[:5]):
                fh.write(f"U{u},I{it},{rng.integers(1, 6)},{1000 + j}\n")
    root = str(tmp_path / "data")
    from recboard_tpu import cli

    cli.main([
        "make", "Tiny2014_220_LOU", str(csv),
        "--format", "amazon2014", "--root", root,
        "--kcore4user", "2", "--kcore4item", "2",
    ])
    meta = json.load(open(os.path.join(
        root, "Processed", "Tiny2014_220_LOU", "meta.json")))
    assert meta["num_users"] > 0 and meta["num_interactions"] > 0
