"""Item textual-feature encoding (the semantic-feature preparation
stage of the generative pipelines).

Reference: TIGER/encode_textual_features.py (same workflow in LETTER,
R3-VAE, DIGER, CCFRec): load ``item.txt`` → build one string per item
from selected fields (``"FIELD: <cleaned>."`` lines) → encode with a
sentence encoder → ``export_pickle`` an (N_items, F) float tensor that
train_rqvae-style tokenizers consume.

Backends
--------
``hf``    A local Hugging Face checkpoint (transformers; torch-CPU or
          flax weights). Mean-pooled last hidden state — the
          SentenceTransformer default for the T5 family. Requires the
          model to already be on disk (this environment has no
          network egress; the reference assumes a ./models dir too).
``hash``  Deterministic hashed bag-of-character-ngrams with a seeded
          Gaussian random projection. No weights needed; preserves
          lexical similarity, so the RQ-VAE/k-means tokenizer
          pipelines run end-to-end offline (tests, synthetic data).

    python -m recboard_tpu.sem.encode --root ./data \
        --dataset Amazon2014Beauty_550_LOU --backend hash
"""

from __future__ import annotations

import argparse
import hashlib
import html
import os
import re
from typing import Any, List, Optional, Sequence

import numpy as np

from .. import utils

__all__ = ["TextualFeatureEncoder", "clean_text", "build_texts"]

DEFAULT_FIELDS = ("TITLE", "CATEGORIES", "BRAND")


def clean_text(value: Any) -> str:
    """Normalize raw item text (TIGER/encode_textual_features.py:110-131):
    strip HTML tags/entities, quotes, newlines, repeated whitespace."""
    import pandas as pd

    if value is None:
        return ""
    if isinstance(value, list):
        text = " ".join(str(v) for v in value)
    elif isinstance(value, dict):
        text = " ".join(f"{k}: {v}" for k, v in value.items())
    elif pd.isna(value):
        return ""
    else:
        text = str(value)
    text = html.unescape(text)
    text = re.sub(r"</?\w+[^>]*>", " ", text)
    text = re.sub(r"[\"\n\r]", " ", text)
    return re.sub(r"\s+", " ", text).strip()


def build_texts(item_df, fields: Sequence[str]) -> List[str]:
    """One ``"FIELD: value."`` line per field, newline-joined
    (TIGER/encode_textual_features.py:102-107)."""
    sub = item_df.loc[:, list(fields)]
    return [
        "\n".join(
            f"{field}: {clean_text(value)}." for field, value in zip(fields, row)
        )
        for row in sub.itertuples(index=False, name=None)
    ]


def _hash_encode(
    texts: Sequence[str], dim: int = 384, num_buckets: int = 2**18, seed: int = 0
) -> np.ndarray:
    """Hashed char-3/4/5-gram counts → seeded Gaussian projection →
    l2-normalized (N, dim). Deterministic across runs/hosts."""
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((num_buckets, dim)).astype(np.float32) / np.sqrt(dim)
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, text in enumerate(texts):
        t = text.lower()
        acc = np.zeros(dim, dtype=np.float32)
        n_grams = 0
        for n in (3, 4, 5):
            for j in range(max(0, len(t) - n + 1)):
                g = t[j : j + n]
                h = int.from_bytes(
                    hashlib.blake2b(g.encode(), digest_size=8).digest(), "little"
                )
                acc += proj[h % num_buckets]
                n_grams += 1
        if n_grams:
            acc /= np.sqrt(n_grams)
        norm = np.linalg.norm(acc)
        out[i] = acc / norm if norm > 0 else acc
    return out


def _hf_encode(
    texts: Sequence[str], model_path: str, batch_size: int = 128
) -> np.ndarray:
    """Local transformers checkpoint, mean-pooled last hidden state."""
    import torch
    from transformers import AutoModel, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_path)
    model = AutoModel.from_pretrained(model_path).eval()
    feats = []
    with torch.no_grad():
        for i in range(0, len(texts), batch_size):
            chunk = list(texts[i : i + batch_size])
            enc = tok(
                chunk, padding=True, truncation=True, max_length=512,
                return_tensors="pt",
            )
            hidden = model(**enc).last_hidden_state  # (b, T, F)
            mask = enc["attention_mask"][..., None].float()
            pooled = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1.0)
            feats.append(pooled.float().cpu().numpy())
    return np.concatenate(feats, axis=0)


class TextualFeatureEncoder:
    """item.txt → (N_items, F) feature pickle (workflow mirror of
    TIGER/encode_textual_features.py:20-157)."""

    def __init__(
        self,
        root: str,
        dataset: str,
        backend: str = "hash",
        model: str = "",
        model_dir: str = "./models",
        fields: Sequence[str] = DEFAULT_FIELDS,
        batch_size: int = 128,
        feature_dim: int = 384,
        item_file: str = "item.txt",
        output_file: Optional[str] = None,
        seed: int = 0,
    ):
        self.root = root
        self.dataset = dataset
        self.backend = backend
        self.model = model
        self.model_dir = model_dir
        self.fields = tuple(fields)
        self.batch_size = batch_size
        self.feature_dim = feature_dim
        self.item_file = item_file
        self.output_file = output_file
        self.seed = seed

    @property
    def dataset_path(self) -> str:
        return os.path.join(self.root, "Processed", self.dataset)

    def load_items(self):
        import pandas as pd

        return pd.read_csv(
            os.path.join(self.dataset_path, self.item_file), sep="\t"
        )

    def resolve_output_file(self, fields: Sequence[str]) -> str:
        if self.output_file is not None:
            if os.path.isabs(self.output_file):
                return self.output_file
            return os.path.join(self.dataset_path, self.output_file)
        tag = self.model.replace("/", "_").replace("\\", "_") or self.backend
        field_part = "_".join(f.lower() for f in fields)
        return os.path.join(
            self.dataset_path, f"{tag}_{field_part}.pkl".lower()
        )

    def run(self) -> str:
        item_df = self.load_items()
        missing = [f for f in self.fields if f not in item_df.columns]
        if missing:
            raise ValueError(f"missing item fields: {missing}.")
        texts = build_texts(item_df, self.fields)
        if self.backend == "hf":
            path = (
                os.path.join(self.model_dir, self.model)
                if self.model_dir
                else self.model
            )
            feats = _hf_encode(texts, path, self.batch_size)
        elif self.backend == "hash":
            feats = _hash_encode(texts, dim=self.feature_dim, seed=self.seed)
        else:
            raise ValueError(f"unknown backend {self.backend!r}")
        if feats.shape[0] != len(item_df):
            raise RuntimeError("encoded feature count does not match item count.")
        out = self.resolve_output_file(self.fields)
        utils.export_pickle(feats.astype(np.float32), out)
        utils.infoLogger(
            f"[encode] >>> {feats.shape} features -> {out}"
        )
        return out


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Encode item textual/visual features."
    )
    ap.add_argument("--root", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--modality", default="text", choices=("text", "visual"))
    ap.add_argument("--backend", default="hash", choices=("hash", "hf"))
    ap.add_argument("--model", default="")
    ap.add_argument("--model-dir", default="./models")
    ap.add_argument("--fields", default=",".join(DEFAULT_FIELDS))
    ap.add_argument("--image-dir", default="item_images/large")
    ap.add_argument("--feature-dim", type=int, default=384)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--output-file", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    if args.modality == "visual":
        VisualFeatureEncoder(
            args.root,
            args.dataset,
            backend=args.backend,
            model=args.model,
            model_dir=args.model_dir,
            image_dir=args.image_dir,
            batch_size=args.batch_size,
            feature_dim=args.feature_dim,
            output_file=args.output_file,
            seed=args.seed,
        ).run()
        return
    TextualFeatureEncoder(
        args.root,
        args.dataset,
        backend=args.backend,
        model=args.model,
        model_dir=args.model_dir,
        fields=tuple(f for f in args.fields.split(",") if f),
        batch_size=args.batch_size,
        feature_dim=args.feature_dim,
        output_file=args.output_file,
        seed=args.seed,
    ).run()


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------- visual
class VisualFeatureEncoder:
    """Item images → (N_items, F) visual feature pickle — the visual
    half of the reference's modality prep
    (encode_amazon2023_context.ipynb `encode_visual_modality`): load
    ``item_images/<size>/<item_id>.jpg`` per item, encode with a local
    ViT checkpoint (AutoImageProcessor + AutoModel, CLS/pooled output),
    and fill MISSING images with the mean feature of the present ones
    (the notebook's vMasks/mean substitution). Output naming follows
    the notebook: ``visual_<model>.pkl`` in the dataset dir — the
    ``--vfile`` the MM family consumes.

    Backends: ``hf`` (local vision checkpoint, no egress) and ``hash``
    (deterministic projection of raw image bytes / IMAGE_URL strings —
    an offline stand-in so MMGCN/LATTICE/FREEDOM/BM3/MGCN run end to
    end without weights; NOT semantically meaningful)."""

    def __init__(
        self,
        root: str,
        dataset: str,
        backend: str = "hash",
        model: str = "",
        model_dir: str = "./models",
        image_dir: str = "item_images/large",
        batch_size: int = 64,
        feature_dim: int = 384,
        item_file: str = "item.txt",
        output_file: Optional[str] = None,
        seed: int = 0,
    ):
        self.root = root
        self.dataset = dataset
        self.backend = backend
        self.model = model
        self.model_dir = model_dir
        self.image_dir = image_dir
        self.batch_size = batch_size
        self.feature_dim = feature_dim
        self.item_file = item_file
        self.output_file = output_file
        self.seed = seed

    @property
    def dataset_path(self) -> str:
        return os.path.join(self.root, "Processed", self.dataset)

    def _image_path(self, item_id) -> str:
        return os.path.join(self.dataset_path, self.image_dir, f"{item_id}.jpg")

    def resolve_output_file(self) -> str:
        if self.output_file is not None:
            if os.path.isabs(self.output_file):
                return self.output_file
            return os.path.join(self.dataset_path, self.output_file)
        tag = self.model.replace("/", "_").replace("\\", "_") or self.backend
        return os.path.join(self.dataset_path, f"visual_{tag}.pkl".lower())

    def _hf_encode_images(self, item_ids) -> np.ndarray:
        import torch
        from PIL import Image
        from transformers import AutoImageProcessor, AutoModel

        path = (
            os.path.join(self.model_dir, self.model)
            if self.model_dir else self.model
        )
        processor = AutoImageProcessor.from_pretrained(
            path, local_files_only=True
        )
        encoder = AutoModel.from_pretrained(path, local_files_only=True).eval()
        feats, masks = [], []
        with torch.no_grad():
            for i in range(0, len(item_ids), self.batch_size):
                chunk = item_ids[i : i + self.batch_size]
                imgs, has = [], []
                for iid in chunk:
                    p = self._image_path(iid)
                    if os.path.isfile(p):
                        imgs.append(Image.open(p).convert("RGB"))
                        has.append(True)
                    else:
                        imgs.append(Image.new("RGB", (224, 224)))
                        has.append(False)
                pixels = processor(images=imgs, return_tensors="pt")[
                    "pixel_values"
                ]
                out = encoder(pixel_values=pixels)
                pooled = getattr(out, "pooler_output", None)
                if pooled is None:
                    pooled = out.last_hidden_state[:, 0]  # CLS
                feats.append(pooled.float().cpu().numpy())
                masks += has
        feats = np.concatenate(feats, axis=0)
        masks = np.asarray(masks, bool)
        if masks.any():  # missing images → mean of present features
            feats[~masks] = feats[masks].mean(axis=0)
        return feats

    def _hash_encode_images(self, item_ids, item_df) -> np.ndarray:
        """Deterministic projection of raw image bytes (first 4 KiB +
        size), falling back to the IMAGE_URL string; a no-weights
        stand-in that keeps the MM pipelines runnable offline."""
        urls = (
            item_df["IMAGE_URL"].astype(str).tolist()
            if "IMAGE_URL" in item_df.columns
            else [""] * len(item_ids)
        )
        keys = []
        for iid, url in zip(item_ids, urls):
            p = self._image_path(iid)
            if os.path.isfile(p):
                with open(p, "rb") as fh:
                    head = fh.read(4096)
                keys.append(head.hex() + f"|{os.path.getsize(p)}")
            else:
                keys.append(f"url:{url}|id:{iid}")
        return _hash_encode(keys, dim=self.feature_dim, seed=self.seed + 1)

    def run(self) -> str:
        import pandas as pd

        item_df = pd.read_csv(
            os.path.join(self.dataset_path, self.item_file), sep="\t"
        )
        id_col = item_df.columns[0]
        item_ids = item_df[id_col].tolist()
        if self.backend == "hf":
            feats = self._hf_encode_images(item_ids)
        elif self.backend == "hash":
            feats = self._hash_encode_images(item_ids, item_df)
        else:
            raise ValueError(f"unknown backend {self.backend!r}")
        out = self.resolve_output_file()
        utils.export_pickle(feats.astype(np.float32), out)
        utils.infoLogger(f"[encode] >>> {feats.shape} visual features -> {out}")
        return out
