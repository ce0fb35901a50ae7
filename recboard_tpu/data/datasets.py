"""Tabular dataset layer over the freerec on-disk protocol.

Protocol (SURVEY.md §1 L1): ``<root>/Processed/<name>/{train,valid,test}
.txt`` TSVs with a header row naming tagged columns (e.g. ``USER:ID``,
``ITEM:ID``, ``TIMESTAMP``) plus an ``item.txt`` attribute table read via
``pd.read_csv(..., sep="\t")`` (TIGER/encode_textual_features.py:90-91).
Dataset directory names encode the build recipe, e.g.
``Amazon2014Beauty_550_LOU`` (5-core users/items, leave-one-out).

API parity: ``RecDataSet(root, dataset, tasktag)`` with views
``.train()/.valid()/.test()``, ``.fields[TAG,...]``, ``.to_rows()``,
``.to_seqs()``, ``.listmap``, ``dataset[User, Item]``,
``.to_normalized_adj(normalization=...)`` — call sites
HSTU/sampler.py:14-44, LightGCN/main.py:47-49, SASRec/main.py:263-269.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .. import utils
from .fields import Field, FieldTuple
from .tags import (
    DENSE,
    FEATURE,
    ID,
    ITEM,
    LABEL,
    RATING,
    SPARSE,
    TIMESTAMP,
    USER,
    FieldTag,
    TaskTag,
)

__all__ = [
    "RecDataSet",
    "NextItemRecDataSet",
    "PredictionRecDataSet",
    "DataSetView",
]

_TAGGED_HEADER_MAP = {
    "USER:ID": ("User", (USER, ID)),
    "ITEM:ID": ("Item", (ITEM, ID)),
    "USER": ("User", (USER, ID)),
    "ITEM": ("Item", (ITEM, ID)),
    "RATING": ("Rating", (RATING,)),
    "TIMESTAMP": ("Timestamp", (TIMESTAMP,)),
    "LABEL": ("Label", (LABEL,)),
}


def _parse_header(column: str) -> Tuple[str, Tuple[FieldTag, ...]]:
    key = column.strip().upper()
    if key in _TAGGED_HEADER_MAP:
        return _TAGGED_HEADER_MAP[key]
    if ":" in key:
        name, *tags = key.split(":")
        parsed = []
        for tag in tags:
            try:
                parsed.append(FieldTag(tag))
            except ValueError:
                pass
        return column.strip().split(":")[0], tuple(parsed) or (FEATURE,)
    return column.strip(), (FEATURE,)


def _column_dtype(tags: Tuple[FieldTag, ...]) -> np.dtype:
    if RATING in tags or LABEL in tags or DENSE in tags:
        return np.dtype(np.float32)
    if TIMESTAMP in tags:
        return np.dtype(np.int64)
    return np.dtype(np.int32)


class RecDataSet:
    """A processed dataset: tagged fields + three interaction splits."""

    TASKTAG: TaskTag = TaskTag.GENERAL

    def __init__(
        self,
        root: str,
        dataset: Optional[str] = None,
        tasktag: Optional[str | TaskTag] = None,
        cfg: Optional[Sequence[Dict[str, Any]]] = None,
    ) -> None:
        if dataset is None:
            root, dataset = os.path.dirname(root), os.path.basename(root)
        self.root = root
        self.dataset = dataset
        self.tasktag = TaskTag(tasktag) if tasktag else self.TASKTAG
        self.path = os.path.join(root, "Processed", dataset)
        if not os.path.isdir(self.path):
            # allow `root` to point directly at the processed dir
            alt = os.path.join(root, dataset)
            if os.path.isdir(alt):
                self.path = alt
            else:
                raise FileNotFoundError(f"no processed dataset at {self.path}")

        self._splits: Dict[str, Dict[Field, np.ndarray]] = {}
        self._fields = self._load(cfg)
        self._mode = "train"
        self._seqs_cache: Dict[Tuple, List] = {}

    # ------------------------------------------------------------- loading
    def _load(self, cfg) -> FieldTuple:
        fields: List[Field] = []
        field_by_name: Dict[str, Field] = {}
        raw: Dict[str, Dict[str, np.ndarray]] = {}
        for split in ("train", "valid", "test"):
            file_ = os.path.join(self.path, f"{split}.txt")
            with open(file_) as fh:
                header = fh.readline().rstrip("\n").split("\t")
            columns = [_parse_header(c) for c in header]
            arrays = self._read_columns(file_, columns)
            raw[split] = {}
            for (name, tags), vals in zip(columns, arrays):
                raw[split][name] = vals
                if name not in field_by_name:
                    field_by_name[name] = Field(name, tags, dtype=vals.dtype)

        # vocab counts from max id over all splits (ids are dense 0-based
        # after `make`'s reindex — SURVEY.md §3.5)
        for name, field in list(field_by_name.items()):
            if field.match(ID) or field.match(SPARSE):
                hi = max(int(raw[s][name].max()) for s in raw if name in raw[s])
                field_by_name[name] = field.with_count(hi + 1)
        meta = self.meta
        if "num_users" in meta and "User" in field_by_name:
            field_by_name["User"] = field_by_name["User"].with_count(
                int(meta["num_users"])
            )
        if "num_items" in meta and "Item" in field_by_name:
            field_by_name["Item"] = field_by_name["Item"].with_count(
                int(meta["num_items"])
            )

        fields = list(field_by_name.values())
        for split in raw:
            self._splits[split] = {
                field_by_name[name]: vals for name, vals in raw[split].items()
            }
        return FieldTuple(fields)

    def _read_columns(self, file_: str, columns) -> List[np.ndarray]:
        """Column arrays for one TSV; the common (USER, ITEM[, RATING]
        [, TIMESTAMP]) layout goes through the native C++ parser."""
        names_tags = [(n, t) for n, t in columns]
        standard = (
            len(names_tags) >= 2
            and names_tags[0][0] == "User"
            and names_tags[1][0] == "Item"
            and len(names_tags) <= 4
        )
        if standard:
            from .. import native

            parsed = native.parse_interactions(file_)
            if parsed is not None:
                users, items, col3, col4 = parsed
                extras = [col3, col4]
                out = [users.astype(np.int32), items.astype(np.int32)]
                for i, (name, tags) in enumerate(names_tags[2:]):
                    out.append(extras[i].astype(_column_dtype(tags)))
                return out
        with open(file_) as fh:
            fh.readline()
            data: List[List[str]] = [[] for _ in columns]
            for line in fh:
                parts = line.rstrip("\n").split("\t")
                for i, val in enumerate(parts):
                    data[i].append(val)
        return [
            np.asarray(vals, dtype=_column_dtype(tags))
            for (name, tags), vals in zip(columns, data)
        ]

    @property
    def meta(self) -> Dict[str, Any]:
        file_ = os.path.join(self.path, "meta.json")
        if os.path.isfile(file_):
            with open(file_) as fh:
                return json.load(fh)
        return {}

    # ------------------------------------------------------------- schema
    @property
    def fields(self) -> FieldTuple:
        return self._fields

    def __getitem__(self, fields) -> Dict[Field, np.ndarray]:
        """Columns of the *active split* for the given fields
        (reference: ``dataset[User, Item]``, HSTU/sampler.py:23)."""
        if isinstance(fields, Field):
            fields = (fields,)
        cols = self._splits[self._mode]
        return {f: cols[f] for f in fields}

    def column_abs_max(self, field: Field) -> float:
        """max |value| of a column over ALL splits — a *static* dataset
        statistic models may bake into compiled programs (e.g. HSTU
        derives the largest reachable time-bucket id from the timestamp
        range and shrinks its one-hot bias contraction to it)."""
        hi = 0.0
        for split in self._splits.values():
            if field in split and split[field].size:
                hi = max(hi, float(np.abs(split[field]).max()))
        return hi

    # -------------------------------------------------------------- views
    def train(self) -> "DataSetView":
        return DataSetView(self, "train")

    def valid(self) -> "DataSetView":
        return DataSetView(self, "valid")

    def test(self) -> "DataSetView":
        return DataSetView(self, "test")

    # ------------------------------------------------------------- helpers
    @staticmethod
    def listmap(fn, *iterables) -> List:
        return utils.listmap(fn, *iterables)

    def to_rows(self, columns: Dict[Field, Sequence]) -> List[Dict[Field, Any]]:
        fields = list(columns)
        n = len(columns[fields[0]])
        return [{f: columns[f][i] for f in fields} for i in range(n)]

    def summary(self) -> str:
        User = self.fields[USER, ID]
        Item = self.fields[ITEM, ID]
        sizes = {s: len(next(iter(cols.values()))) for s, cols in self._splits.items()}
        total = sum(sizes.values())
        lines = [
            f"[{self.dataset}] users={User.count} items={Item.count} "
            f"interactions={total} "
            f"(train={sizes.get('train', 0)}, valid={sizes.get('valid', 0)}, "
            f"test={sizes.get('test', 0)})"
        ]
        return utils.infoLogger("\n".join(lines))


class DataSetView:
    """A split-scoped view; the origin of every datapipe chain."""

    def __init__(self, dataset: RecDataSet, split: str):
        self.dataset = dataset
        self.split = split

    # schema passthrough
    @property
    def fields(self) -> FieldTuple:
        return self.dataset.fields

    @property
    def path(self) -> str:
        return self.dataset.path

    def train(self) -> "DataSetView":
        return DataSetView(self.dataset, "train")

    def valid(self) -> "DataSetView":
        return DataSetView(self.dataset, "valid")

    def test(self) -> "DataSetView":
        return DataSetView(self.dataset, "test")

    @staticmethod
    def listmap(fn, *iterables) -> List:
        return utils.listmap(fn, *iterables)

    def __getitem__(self, fields) -> Dict[Field, np.ndarray]:
        if isinstance(fields, Field):
            fields = (fields,)
        cols = self.dataset._splits[self.split]
        return {f: cols[f] for f in fields}

    def columns(self) -> Dict[Field, np.ndarray]:
        return dict(self.dataset._splits[self.split])

    def __len__(self) -> int:
        cols = self.dataset._splits[self.split]
        return len(next(iter(cols.values())))

    def to_rows(self, columns: Dict[Field, Sequence]) -> List[Dict[Field, Any]]:
        return self.dataset.to_rows(columns)

    # --------------------------------------------------- sequence grouping
    def to_seqs(self, maxlen: Optional[int] = None) -> List[Dict[Field, Any]]:
        """One row per user: {User: u, ISeq: (items...)} in interaction
        (file) order — matches `dataset.train().to_seqs()` used to build
        seen-item sets (HSTU/sampler.py:79-82)."""
        User = self.fields[USER, ID]
        Item = self.fields[ITEM, ID]
        ISeq = Item.fork(FieldTag.SEQUENCE)
        seqs = self.user_seqs(maxlen)
        users = list(range(User.count))
        return self.to_rows({User: users, ISeq: seqs})

    def user_seqs(self, maxlen: Optional[int] = None) -> List[Tuple[int, ...]]:
        key = (self.split, "items", maxlen)
        cache = self.dataset._seqs_cache
        if key not in cache:
            cache[key] = self._group(self.fields[ITEM, ID], maxlen)
        return cache[key]

    def user_time_seqs(self, maxlen: Optional[int] = None) -> List[Tuple[int, ...]]:
        key = (self.split, "times", maxlen)
        cache = self.dataset._seqs_cache
        if key not in cache:
            cache[key] = self._group(self.fields[TIMESTAMP], maxlen)
        return cache[key]

    def _group(self, col_field: Field, maxlen: Optional[int]) -> List[Tuple]:
        User = self.fields[USER, ID]
        cols = self.dataset._splits[self.split]
        users = cols[User]
        values = cols[col_field]
        # stable grouping preserving file order within each user
        order = np.argsort(users, kind="stable")
        sorted_users = users[order]
        sorted_vals = values[order]
        bounds = np.searchsorted(sorted_users, np.arange(User.count + 1))
        out: List[Tuple] = []
        for u in range(User.count):
            seq = sorted_vals[bounds[u] : bounds[u + 1]]
            if maxlen is not None:
                seq = seq[-maxlen:]
            out.append(tuple(seq.tolist()))
        return out

    # ------------------------------------------------------------- graphs
    def to_bigraph_edges(self) -> Tuple[np.ndarray, np.ndarray]:
        """(user_ids, item_ids) interaction edge lists for this split."""
        User = self.fields[USER, ID]
        Item = self.fields[ITEM, ID]
        cols = self.dataset._splits[self.split]
        return cols[User], cols[Item]

    def to_normalized_adj(self, normalization: str = "sym"):
        """Normalized (U+I)x(U+I) bipartite adjacency in COO form for
        K-hop propagation (reference buffer `Adj`, LightGCN/main.py:47-49).
        Returns a `graph.SparseAdj` (segment-sum SpMM ready)."""
        from .. import graph

        User = self.fields[USER, ID]
        Item = self.fields[ITEM, ID]
        users, items = self.to_bigraph_edges()
        return graph.bipartite_normalized_adj(
            users, items, User.count, Item.count, normalization=normalization
        )

    # Datapipe sources are attached by data.pipes (registered lazily to
    # avoid an import cycle); see pipes.register_view_sources().
    def __getattr__(self, name: str):
        from . import pipes  # noqa: WPS433 — lazy to break the cycle

        source = pipes.VIEW_SOURCES.get(name)
        if source is None:
            raise AttributeError(name)

        def bound(*args, **kwargs):
            return source(self, *args, **kwargs)

        return bound


class NextItemRecDataSet(RecDataSet):
    TASKTAG = TaskTag.NEXTITEM


class PredictionRecDataSet(RecDataSet):
    """CTR/CVR dataset with a per-field YAML schema (`fields:` block with
    tags/dtype/fill_null/normalizer — DeepFM/main.py:281-288)."""

    TASKTAG = TaskTag.PREDICTION

    def __init__(self, root, dataset=None, tasktag=None, cfg=None):
        self._field_cfg = list(cfg) if cfg else None
        super().__init__(root, dataset, tasktag or self.TASKTAG)

    def _load(self, cfg=None) -> FieldTuple:
        cfg = cfg or self._field_cfg
        if cfg is None:
            return super()._load(None)
        # explicit schema: read columns by name, apply fill/normalize
        fields: List[Field] = []
        self._splits = {}
        raw: Dict[str, Dict[str, List[str]]] = {}
        wanted_names = {spec["name"].lower(): spec["name"] for spec in cfg}
        for split in ("train", "valid", "test"):
            file_ = os.path.join(self.path, f"{split}.txt")
            with open(file_) as fh:
                # header base names matched case-insensitively against the
                # schema ("USER:ID" column ↔ fields entry name "User")
                header = [
                    wanted_names.get(
                        h.split(":")[0].lower(), h.split(":")[0]
                    )
                    for h in fh.readline().rstrip().split("\t")
                ]
                cols: Dict[str, List[str]] = {h: [] for h in header}
                for line in fh:
                    for h, v in zip(header, line.rstrip("\n").split("\t")):
                        cols[h].append(v)
            raw[split] = cols

        arrays: Dict[str, Dict[str, np.ndarray]] = {s: {} for s in raw}
        for spec in cfg:
            name = spec["name"]
            tags = tuple(FieldTag(t) for t in spec.get("tags", ["FEATURE"]))
            is_dense = DENSE in tags or spec.get("dtype", "int") == "float"
            fill = spec.get("fill_null", "0" if not is_dense else "0.0")
            series = {
                s: [v if v != "" else str(fill) for v in raw[s].get(name, [])]
                for s in raw
            }
            if is_dense:
                arrs = {
                    s: np.asarray(vals, dtype=np.float32) for s, vals in series.items()
                }
                norm = spec.get("normalizer")
                if norm == "minmax":
                    lo = min(a.min() for a in arrs.values() if a.size)
                    hi = max(a.max() for a in arrs.values() if a.size)
                    arrs = {s: (a - lo) / max(hi - lo, 1e-8) for s, a in arrs.items()}
                elif norm == "log":
                    arrs = {s: np.log1p(np.maximum(a, 0.0)) for s, a in arrs.items()}
                field = Field(name, tags + (DENSE,), dtype=np.float32)
            elif LABEL in tags:
                arrs = {
                    s: np.asarray(vals, dtype=np.float32) for s, vals in series.items()
                }
                field = Field(name, tags, dtype=np.float32)
            else:
                # sparse categorical: global vocab over all splits
                vocab: Dict[str, int] = {}
                for s in ("train", "valid", "test"):
                    for v in series[s]:
                        if v not in vocab:
                            vocab[v] = len(vocab)
                arrs = {
                    s: np.asarray([vocab[v] for v in series[s]], dtype=np.int32)
                    for s in series
                }
                field = Field(name, tags + (SPARSE,), count=len(vocab))
            fields.append(field)
            for s in arrs:
                arrays[s][name] = arrs[s]

        field_by_name = {f.name: f for f in fields}
        for s in arrays:
            self._splits[s] = {field_by_name[n]: a for n, a in arrays[s].items()}
        return FieldTuple(fields)
