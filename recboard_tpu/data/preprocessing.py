"""Dataset building — the `freerec make` CLI equivalent.

Reference behavior (SURVEY.md §3.5, build commands in
benchmark/*/meta.json): raw interactions → k-core filter → dense 0-based
reindex → split LOU (leave-one-out: last item test, second-last valid)
or ROU (per-user ratio split) → write
``Processed/<Name>_<code>_<split>/{train,valid,test,item}.txt``.

Run as: ``python -m recboard_tpu.data.preprocessing make <raw.tsv> ...``
or via `recboard_tpu.cli`.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from .. import utils

__all__ = ["kcore_filter", "reindex", "split_lou", "split_rou", "make_dataset"]

HEADER = {"user": "USER:ID", "item": "ITEM:ID", "rating": "RATING", "ts": "TIMESTAMP"}


def kcore_filter(
    users: np.ndarray,
    items: np.ndarray,
    kcore4user: int = 5,
    kcore4item: int = 5,
    extra: Optional[Dict[str, np.ndarray]] = None,
) -> Tuple[np.ndarray, np.ndarray, Dict[str, np.ndarray]]:
    """Iteratively drop users/items with fewer than k interactions until
    a fixed point (the `_550_` in Amazon2014Beauty_550_LOU = 5-core users,
    5-core items, 0 rating threshold)."""
    extra = extra or {}
    mask = np.ones(len(users), dtype=bool)
    while True:
        u, i = users[mask], items[mask]
        ucnt = np.bincount(u, minlength=int(users.max()) + 1)
        icnt = np.bincount(i, minlength=int(items.max()) + 1)
        bad = (ucnt[u] < kcore4user) | (icnt[i] < kcore4item)
        if not bad.any():
            break
        idx = np.flatnonzero(mask)
        mask[idx[bad]] = False
        if not mask.any():
            raise ValueError("k-core filtering removed every interaction")
    keep = np.flatnonzero(mask)
    return users[keep], items[keep], {k: v[keep] for k, v in extra.items()}


def reindex(values: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Dense 0-based ids ordered by first appearance; returns
    (new_ids, old_unique_sorted_by_new_id)."""
    uniq, inverse = np.unique(values, return_inverse=True)
    # np.unique orders by value; remap to first-appearance order
    first_pos = np.full(len(uniq), len(values), dtype=np.int64)
    np.minimum.at(first_pos, inverse, np.arange(len(values)))
    order = np.argsort(first_pos, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    return rank[inverse].astype(np.int32), uniq[order]


def _sort_by_user_time(
    users: np.ndarray, timestamps: Optional[np.ndarray]
) -> np.ndarray:
    if timestamps is None:
        return np.argsort(users, kind="stable")
    order = np.argsort(timestamps, kind="stable")
    return order[np.argsort(users[order], kind="stable")]


def split_lou(users: np.ndarray) -> np.ndarray:
    """Per-user leave-one-out on (user, time)-sorted rows: last → test(2),
    second-last → valid(1), rest → train(0). Users with <3 interactions
    keep everything in train."""
    n = len(users)
    split = np.zeros(n, dtype=np.int8)
    counts = np.bincount(users)
    # index of each row within its user group (rows sorted by user)
    starts = np.concatenate(([0], np.cumsum(counts)))[users]
    pos = np.arange(n) - starts
    cnt = counts[users]
    split[(pos == cnt - 1) & (cnt >= 3)] = 2
    split[(pos == cnt - 2) & (cnt >= 3)] = 1
    return split


def split_rou(users: np.ndarray, ratios: Sequence[int] = (8, 1, 1)) -> np.ndarray:
    """Per-user ratio split by time order (ROU, e.g. 8:1:1 —
    preprocess_amazon2023_context.ipynb final cell)."""
    n = len(users)
    split = np.zeros(n, dtype=np.int8)
    counts = np.bincount(users)
    starts = np.concatenate(([0], np.cumsum(counts)))[users]
    pos = np.arange(n) - starts
    cnt = counts[users]
    total = float(sum(ratios))
    train_end = np.ceil(cnt * ratios[0] / total).astype(np.int64)
    valid_end = train_end + np.maximum(
        np.floor(cnt * ratios[1] / total).astype(np.int64), (cnt >= 3).astype(np.int64)
    )
    split[(pos >= train_end) & (pos < valid_end)] = 1
    split[pos >= valid_end] = 2
    return split


def make_dataset(
    dest_root: str,
    name: str,
    users: np.ndarray,
    items: np.ndarray,
    ratings: Optional[np.ndarray] = None,
    timestamps: Optional[np.ndarray] = None,
    kcore4user: int = 5,
    kcore4item: int = 5,
    star4pos: float = 0,
    splitting: str = "LOU",
    ratios: Sequence[int] = (8, 1, 1),
    item_attrs: Optional[Dict[int, Dict[str, str]]] = None,
    build_command: Optional[str] = None,
) -> str:
    """Build Processed/<name>/ from raw interaction arrays. Returns path."""
    users = np.asarray(users)
    items = np.asarray(items)
    extra: Dict[str, np.ndarray] = {}
    if ratings is not None:
        ratings = np.asarray(ratings, dtype=np.float32)
        keep = ratings >= star4pos
        users, items, ratings = users[keep], items[keep], ratings[keep]
        if timestamps is not None:
            timestamps = np.asarray(timestamps)[keep]
        extra["rating"] = ratings
    if timestamps is not None:
        extra["ts"] = np.asarray(timestamps, dtype=np.int64)

    users, items, extra = kcore_filter(users, items, kcore4user, kcore4item, extra)
    users, old_users = reindex(users)
    items, old_items = reindex(items)

    order = _sort_by_user_time(users, extra.get("ts"))
    users, items = users[order], items[order]
    extra = {k: v[order] for k, v in extra.items()}

    if splitting.upper() == "LOU":
        split = split_lou(users)
    elif splitting.upper() == "ROU":
        split = split_rou(users, ratios)
    else:
        raise ValueError(f"unknown splitting {splitting!r}")

    path = os.path.join(dest_root, "Processed", name)
    utils.mkdirs(path)
    cols = [("user", users), ("item", items)]
    if "rating" in extra:
        cols.append(("rating", extra["rating"]))
    if "ts" in extra:
        cols.append(("ts", extra["ts"]))
    header = "\t".join(HEADER[c] for c, _ in cols)
    for code, split_name in ((0, "train"), (1, "valid"), (2, "test")):
        mask = split == code
        with open(os.path.join(path, f"{split_name}.txt"), "w") as fh:
            fh.write(header + "\n")
            arrays = [v[mask] for _, v in cols]
            for row in zip(*arrays):
                fh.write(
                    "\t".join(
                        f"{v:.1f}" if isinstance(v, np.floating) else str(int(v))
                        for v in row
                    )
                    + "\n"
                )

    # item.txt: ITEM:ID + optional attribute columns, keyed by *old* id
    attr_names = sorted(
        {k for attrs in (item_attrs or {}).values() for k in attrs}
    )
    with open(os.path.join(path, "item.txt"), "w") as fh:
        fh.write("\t".join(["ITEM:ID"] + attr_names) + "\n")
        for new_id, old_id in enumerate(old_items):
            attrs = (item_attrs or {}).get(int(old_id), {})
            fh.write(
                "\t".join([str(new_id)] + [str(attrs.get(a, "")) for a in attr_names])
                + "\n"
            )

    num_users = int(users.max()) + 1 if len(users) else 0
    num_items = int(items.max()) + 1 if len(items) else 0
    meta = {
        "dataset": name,
        "num_users": num_users,
        "num_items": num_items,
        "num_interactions": int(len(users)),
        "avg_seq_len": round(len(users) / max(num_users, 1), 2),
        "density": round(len(users) / max(num_users * num_items, 1), 8),
        "build_command": build_command
        or (
            f"recboard_tpu make {name} --kcore4user {kcore4user} "
            f"--kcore4item {kcore4item} --splitting {splitting}"
        ),
        "splitting": splitting.upper(),
        "sort_by": [["NDCG@10", "desc"]],
        "core_metrics": ["HitRate@10", "HitRate@20", "NDCG@10", "NDCG@20"],
    }
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh, indent=2)
    return path


def make_from_tsv(
    raw_file: str,
    dest_root: str,
    name: str,
    item_attrs_file: Optional[str] = None,
    **kwargs,
) -> str:
    """Build from a raw TSV with columns user, item[, rating[,
    timestamp]]; user/item may be arbitrary strings (Amazon asins).

    ``item_attrs_file``: optional side TSV whose first column is the
    RAW item id and whose remaining header columns are attribute names
    (the ``<out>.item.tsv`` that ``data.amazon.extract_from_amazon2023``
    emits: ITEM/TITLE/CATEGORIES/BRAND) — merged into the processed
    ``item.txt`` so the semantic encoders (sem/encode.py) can consume
    the text, mirroring the reference's extract → k-core → split →
    encode flow (preprocess_amazon2023_context.ipynb)."""
    users_raw, items_raw, ratings_l, ts_l = [], [], [], []
    with open(raw_file) as fh:
        fh.readline()  # header
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2:
                continue
            users_raw.append(parts[0])
            items_raw.append(parts[1])
            if len(parts) > 2:
                ratings_l.append(float(parts[2]))
            if len(parts) > 3:
                ts_l.append(int(float(parts[3])))
    users, _ = reindex(np.asarray(users_raw))
    items, old_items = reindex(np.asarray(items_raw))
    ratings = np.asarray(ratings_l, np.float32) if ratings_l else None
    ts = np.asarray(ts_l, np.int64) if ts_l else None
    item_attrs = None
    if item_attrs_file is not None:
        by_raw: Dict[str, Dict[str, str]] = {}
        with open(item_attrs_file) as fh:
            header = fh.readline().rstrip("\n").split("\t")
            attr_names = header[1:]
            for line in fh:
                parts = line.rstrip("\n").split("\t")
                if not parts or not parts[0]:
                    continue
                by_raw[parts[0]] = dict(zip(attr_names, parts[1:]))
        # key by THIS function's dense id — make_dataset re-keys again
        # after k-core via its own reindex's old ids
        item_attrs = {
            int(dense): by_raw[str(raw)]
            for dense, raw in enumerate(old_items)
            if str(raw) in by_raw
        }
    return make_dataset(
        dest_root, name, users.astype(np.int64), items.astype(np.int64),
        ratings, ts, item_attrs=item_attrs, **kwargs,
    )
