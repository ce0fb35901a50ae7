"""Amazon raw-data extraction (offline prep).

freerec parity: ``data.preprocessing.amazon2023.extract_from_amazon2023``
and ``data.utils.download_from_url`` (SURVEY.md §1 utils row;
encode_amazon2023_context.ipynb cell 2). This environment has no
network egress, so downloads are a guarded no-op with instructions;
extraction handles the public Amazon-2023 review `.jsonl(.gz)` format
(fields: user_id / parent_asin / rating / timestamp) and the 2014
ratings CSV, producing the raw TSV `recboard_tpu make` consumes.
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Dict, Iterable, Optional, Tuple

from .. import utils

__all__ = ["download_from_url", "extract_from_amazon2023", "extract_from_amazon2014"]


def download_from_url(url: str, dest: str) -> str:
    """Guarded downloader — this image has zero egress."""
    if os.path.isfile(dest):
        return dest
    raise RuntimeError(
        f"cannot download {url}: this environment has no network access. "
        f"Place the file at {dest} and rerun."
    )


def _open(path: str):
    return gzip.open(path, "rt") if path.endswith(".gz") else open(path)


def extract_from_amazon2023(
    review_file: str,
    out_file: str,
    meta_file: Optional[str] = None,
    min_rating: float = 0.0,
) -> str:
    """Amazon-2023 review JSONL → raw interactions TSV
    (user\titem\trating\ttimestamp); optional item metadata side file →
    `<out>.item.tsv` with title/category/brand columns (the fields the
    semantic-feature encoders consume, TIGER/encode_textual_features.py)."""
    with _open(review_file) as fh, open(out_file, "w") as out:
        out.write("user\titem\trating\ttimestamp\n")
        for line in fh:
            row = json.loads(line)
            user = row.get("user_id")
            item = row.get("parent_asin") or row.get("asin")
            rating = float(row.get("rating", 0.0))
            ts = int(row.get("timestamp", 0))
            if user is None or item is None or rating < min_rating:
                continue
            out.write(f"{user}\t{item}\t{rating}\t{ts}\n")
    if meta_file:
        item_out = out_file + ".item.tsv"
        with _open(meta_file) as fh, open(item_out, "w") as out:
            out.write("ITEM\tTITLE\tCATEGORIES\tBRAND\n")
            for line in fh:
                row = json.loads(line)
                item = row.get("parent_asin") or row.get("asin")
                if item is None:
                    continue
                title = (row.get("title") or "").replace("\t", " ")
                cats = " / ".join(row.get("categories") or [])
                brand = (row.get("details") or {}).get("Brand", "")
                out.write(f"{item}\t{title}\t{cats}\t{brand}\n")
    utils.infoLogger(f"[amazon] >>> wrote {out_file}")
    return out_file


def extract_from_amazon2014(ratings_csv: str, out_file: str) -> str:
    """Amazon-2014 `ratings_only` CSV (user,item,rating,timestamp) →
    raw interactions TSV."""
    with _open(ratings_csv) as fh, open(out_file, "w") as out:
        out.write("user\titem\trating\ttimestamp\n")
        for line in fh:
            parts = line.strip().split(",")
            if len(parts) < 4:
                continue
            user, item, rating, ts = parts[:4]
            out.write(f"{user}\t{item}\t{rating}\t{ts}\n")
    utils.infoLogger(f"[amazon] >>> wrote {out_file}")
    return out_file
