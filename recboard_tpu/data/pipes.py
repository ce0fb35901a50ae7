"""Composable sampling-pipe DSL.

freerec parity (SURVEY.md §2.2): the reference builds training/eval
streams from chained datapipes registered functionally on torchdata
(`@dp.functional_datapipe`, HSTU/sampler.py:47). This module reproduces
the DSL surface — sources (`choiced_user_ids_source`,
`shuffled_seqs_source`, `shuffled_roll_seqs_source`, ...), samplers
(`gen_train_sampling_pos_/neg_`, `seq_train_yielding_pos_`,
`seq_train_sampling_neg_`, `valid_sampling_`, `test_sampling_`) and
transforms (`add_`, `lpad_/rpad_`, `lprune_`, `map_`, `mark_`,
`batch_`, `tensor_`) — over plain NumPy generators. Batches are
``Dict[Field, np.ndarray]`` keyed by Field objects plus the special
``Size`` field (reference: `data[self.Size]`, DeepFM/main.py:272).

TPU-first notes: the terminal ``tensor_`` produces NumPy arrays; the
Coach overlaps host→device transfer with compute via
``prefetch_to_device``. For hot training loops, models can instead use
on-device sampling (see models/*), which keeps negative drawing inside
the jitted step as HSTU does on GPU (HSTU/main.py:157-162). Multi-host
input sharding (each host samples its slice — DDP's implicit data
sharding) is provided by ``shard_``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from .fields import Field, FieldTuple
from .tags import (
    ID,
    ITEM,
    NEGATIVE,
    POSITIVE,
    SEEN,
    SEQUENCE,
    SIZE,
    TIMESTAMP,
    UNSEEN,
    USER,
)

__all__ = [
    "DataPipe",
    "RandomShuffledSource",
    "OrderedSource",
    "SampleMultiplexer",
    "Size",
    "functional_datapipe",
    "VIEW_SOURCES",
]

Size = Field("Size", (SIZE,))
Row = Dict[Field, Any]

# name -> unbound source constructor attached to DataSetView.__getattr__
VIEW_SOURCES: Dict[str, Callable] = {}

NUM_POOL_NEGATIVES = 100  # pool ranking = 1 positive + 100 negatives (MF-BPR/main.py:108)


def view_source(name: str):
    def register(fn):
        VIEW_SOURCES[name] = fn
        return fn

    return register


def functional_datapipe(name: str):
    """Register a pipe class as a chainable method, mirroring
    torchdata's functional registration (HSTU/sampler.py:47)."""

    def register(cls):
        def method(self, *args, **kwargs):
            return cls(self, *args, **kwargs)

        setattr(DataPipe, name, method)
        cls.__functional_name__ = name
        return cls

    return register


class DataPipe:
    """Base pipe: iterable of rows with schema access and seeding."""

    def __init__(self, source: Optional["DataPipe"] = None):
        self.source = source
        self._seed: Optional[int] = None
        self._epoch = 0

    # ---------------------------------------------------------- plumbing
    @property
    def dataset(self):
        return self.source.dataset

    @property
    def fields(self) -> FieldTuple:
        return self.dataset.fields

    @property
    def User(self) -> Field:
        return self.fields[USER, ID]

    @property
    def Item(self) -> Field:
        return self.fields[ITEM, ID]

    # deterministic per-epoch RNG threading: Coach calls set_epoch before
    # each pass; every stochastic pipe derives its stream from
    # (seed, epoch, stage-id) so 5-seed runs are reproducible.
    def set_seed(self, seed: int) -> "DataPipe":
        self._seed = seed
        if self.source is not None:
            self.source.set_seed(seed + 1)
        return self

    def set_epoch(self, epoch: int) -> "DataPipe":
        self._epoch = epoch
        if self.source is not None:
            self.source.set_epoch(epoch)
        return self

    def rng(self) -> np.random.Generator:
        seed = self._seed if self._seed is not None else 0
        return np.random.default_rng((seed, self._epoch))

    def __iter__(self) -> Iterator[Row]:
        yield from self.source


class _ViewPipe(DataPipe):
    """Root of a chain: holds the DataSetView."""

    def __init__(self, view):
        super().__init__(None)
        self.view = view

    @property
    def dataset(self):
        return self.view.dataset


# ============================================================== sources
@view_source("choiced_user_ids_source")
class ChoicedUserIdsSource(_ViewPipe):
    """One epoch = #users random user draws (MF-BPR/main.py:63)."""

    def __iter__(self) -> Iterator[Row]:
        User = self.User
        rng = self.rng()
        for u in rng.integers(0, User.count, size=User.count):
            yield {User: int(u)}


@view_source("ordered_user_ids_source")
class OrderedUserIdsSource(_ViewPipe):
    """Deterministic user order, for eval (BERT4Rec/main.py:112-129)."""

    def __iter__(self) -> Iterator[Row]:
        User = self.User
        for u in range(User.count):
            yield {User: u}


@view_source("shuffled_seqs_source")
class ShuffledSeqsSource(_ViewPipe):
    """One (user, full seq[-maxlen:]) row per user, shuffled
    (SASRec/main.py:146)."""

    def __init__(self, view, maxlen: Optional[int] = None):
        super().__init__(view)
        self.maxlen = maxlen

    def __iter__(self) -> Iterator[Row]:
        User, ISeq = self.User, self.Item.fork(SEQUENCE)
        seqs = self.view.user_seqs(self.maxlen)
        order = self.rng().permutation(len(seqs))
        for u in order:
            yield {User: int(u), ISeq: seqs[u]}


@view_source("ordered_seqs_source")
class OrderedSeqsSource(ShuffledSeqsSource):
    def __iter__(self) -> Iterator[Row]:
        User, ISeq = self.User, self.Item.fork(SEQUENCE)
        seqs = self.view.user_seqs(self.maxlen)
        for u in range(len(seqs)):
            yield {User: u, ISeq: seqs[u]}


@view_source("shuffled_roll_seqs_source")
class ShuffledRollSeqsSource(_ViewPipe):
    """Rolling prefix windows over each user sequence (session-style
    augmentation — GRU4Rec/Caser/STAMP trainpipes, LESSR/main.py:103):
    for a sequence s, yields s[:minlen], s[:minlen+1], ..., s (capped at
    maxlen by keeping the *last* maxlen items)."""

    def __init__(
        self,
        view,
        minlen: int = 2,
        maxlen: Optional[int] = None,
        keep_at_least_itself: bool = True,
    ):
        super().__init__(view)
        self.minlen = minlen
        self.maxlen = maxlen
        self.keep_at_least_itself = keep_at_least_itself

    def __iter__(self) -> Iterator[Row]:
        User, ISeq = self.User, self.Item.fork(SEQUENCE)
        seqs = self.view.user_seqs(None)
        rows: List[Row] = []
        for u, seq in enumerate(seqs):
            if len(seq) >= self.minlen:
                for end in range(self.minlen, len(seq) + 1):
                    window = seq[:end]
                    if self.maxlen is not None:
                        window = window[-self.maxlen :]
                    rows.append({User: u, ISeq: window})
            elif self.keep_at_least_itself and len(seq) > 0:
                rows.append({User: u, ISeq: seq})
        order = self.rng().permutation(len(rows))
        for i in order:
            yield rows[i]


@view_source("shuffled_pairs_source")
class ShuffledPairsSource(_ViewPipe):
    """Shuffled (user, item) interaction pairs; the item travels as a
    1-tuple so batches collate to (B, 1) (UltraGCN/SimpleX trainpipes)."""

    def __iter__(self) -> Iterator[Row]:
        User, Item = self.User, self.Item
        cols = self.view.columns()
        users = cols[User]
        items = cols[Item]
        order = self.rng().permutation(len(users))
        for i in order:
            yield {User: int(users[i]), Item: (int(items[i]),)}


@view_source("shuffled_inter_source")
class ShuffledInterSource(_ViewPipe):
    """Shuffled raw interaction rows (CTR — DeepFM/main.py:185)."""

    def __iter__(self) -> Iterator[Row]:
        cols = self.view.columns()
        n = len(self.view)
        order = self.rng().permutation(n)
        fields = list(cols)
        for i in order:
            yield {f: cols[f][i] for f in fields}


@view_source("ordered_inter_source")
class OrderedInterSource(_ViewPipe):
    def __iter__(self) -> Iterator[Row]:
        cols = self.view.columns()
        fields = list(cols)
        for i in range(len(self.view)):
            yield {f: cols[f][i] for f in fields}


class RandomShuffledSource(DataPipe):
    """Explicit row-list source, shuffled each epoch
    (TIGER/train_rqvae.py:152-167)."""

    def __init__(self, dataset, rows: Sequence[Row]):
        super().__init__(None)
        self._dataset = dataset
        self.rows = list(rows)

    @property
    def dataset(self):
        return getattr(self._dataset, "dataset", self._dataset)

    def __iter__(self) -> Iterator[Row]:
        order = self.rng().permutation(len(self.rows))
        for i in order:
            yield self.rows[i]


class OrderedSource(RandomShuffledSource):
    def __iter__(self) -> Iterator[Row]:
        yield from self.rows


class SampleMultiplexer(DataPipe):
    """Weighted round-robin over several pipes (multi-dataset training,
    UniSRec/main.py:176,207,235). Stops when every child is exhausted."""

    def __init__(self, pipes_to_weights: Dict[DataPipe, float]):
        super().__init__(None)
        self.pipes = list(pipes_to_weights)
        self.weights = np.asarray(
            [pipes_to_weights[p] for p in self.pipes], dtype=np.float64
        )

    def set_seed(self, seed: int) -> "SampleMultiplexer":
        self._seed = seed
        for i, p in enumerate(self.pipes):
            p.set_seed(seed + i + 1)
        return self

    def set_epoch(self, epoch: int) -> "SampleMultiplexer":
        self._epoch = epoch
        for p in self.pipes:
            p.set_epoch(epoch)
        return self

    def __iter__(self) -> Iterator[Row]:
        rng = self.rng()
        iters: List[Optional[Iterator[Row]]] = [iter(p) for p in self.pipes]
        weights = self.weights.copy()
        while any(it is not None for it in iters):
            probs = np.where([it is not None for it in iters], weights, 0.0)
            total = probs.sum()
            if total <= 0:
                break
            k = int(rng.choice(len(iters), p=probs / total))
            try:
                yield next(iters[k])  # type: ignore[arg-type]
            except StopIteration:
                iters[k] = None


# ============================================================= samplers
class _SeenLookup:
    """Per-user seen-item sets as sorted arrays (O(log n) membership)
    plus a CSR view for the native chunked sampler."""

    def __init__(self, seqs: Sequence[Sequence[int]]):
        self.sorted = [np.unique(np.asarray(s, dtype=np.int64)) for s in seqs]
        lengths = np.asarray([a.size for a in self.sorted], dtype=np.int64)
        self.indptr = np.concatenate(([0], np.cumsum(lengths)))
        self.items = (
            np.concatenate(self.sorted) if len(self.sorted) else np.zeros(0, np.int64)
        )

    def contains(self, user: int, candidates: np.ndarray) -> np.ndarray:
        arr = self.sorted[user]
        if arr.size == 0:
            return np.zeros(len(candidates), dtype=bool)
        idx = np.searchsorted(arr, candidates)
        idx = np.minimum(idx, arr.size - 1)
        return arr[idx] == candidates


def _sample_negatives(
    rng: np.random.Generator,
    count: int,
    num: int,
    seen: Optional[_SeenLookup],
    user: int,
) -> np.ndarray:
    """Uniform negatives over the catalog, rejecting seen items."""
    out = rng.integers(0, count, size=num)
    if seen is None:
        return out
    for _ in range(64):  # rejection rounds; bail out on dense users
        bad = seen.contains(user, out)
        n_bad = int(bad.sum())
        if n_bad == 0:
            break
        out[bad] = rng.integers(0, count, size=n_bad)
    return out


@functional_datapipe("gen_train_sampling_pos_")
class GenTrainPositiveSampler(DataPipe):
    """Draw one positive item from the user's train sequence
    (MF-BPR/main.py:64). Users with no interactions are skipped."""

    def __init__(self, source: DataPipe):
        super().__init__(source)
        self._seqs = None

    def _prepare(self):
        if self._seqs is None:
            self._seqs = self.dataset.train().user_seqs()

    def __iter__(self) -> Iterator[Row]:
        self._prepare()
        User, IPos = self.User, self.Item.fork(POSITIVE)
        rng = self.rng()
        for row in self.source:
            seq = self._seqs[row[User]]
            if not seq:
                continue
            row = dict(row)
            row[IPos] = (int(seq[rng.integers(0, len(seq))]),)
            yield row


@functional_datapipe("gen_train_sampling_neg_")
class GenTrainNegativeSampler(DataPipe):
    """Uniform negatives excluding the user's seen items
    (MF-BPR/main.py:65; `unseen_only` switch per SimpleX).

    Rows are buffered into chunks and sampled in one native (C++) or
    vectorized call — the host must keep a TPU chip fed (SURVEY.md §7
    hard part #5)."""

    CHUNK = 4096

    def __init__(self, source: DataPipe, num_negatives: int = 1, unseen_only: bool = True):
        super().__init__(source)
        self.num_negatives = num_negatives
        self.unseen_only = unseen_only
        self._seen: Optional[_SeenLookup] = None

    def _prepare(self):
        if self._seen is None and self.unseen_only:
            self._seen = _SeenLookup(self.dataset.train().user_seqs())

    def _sample_chunk(self, users, chunk_id: int) -> np.ndarray:
        from .. import native  # recboard_tpu.native

        count = self.Item.count
        seed = hash((self._seed or 0, self._epoch, chunk_id)) & (2**63 - 1)
        if self.unseen_only:
            return native.sample_negatives(
                np.asarray(users),
                self.num_negatives,
                self._seen.indptr,
                self._seen.items,
                count,
                seed,
            )
        rng = np.random.default_rng(seed)
        return rng.integers(0, count, size=(len(users), self.num_negatives))

    def __iter__(self) -> Iterator[Row]:
        self._prepare()
        User, INeg = self.User, self.Item.fork(NEGATIVE)
        buffer: List[Row] = []
        chunk_id = 0

        def flush():
            nonlocal chunk_id
            users = [row[User] for row in buffer]
            negs = self._sample_chunk(users, chunk_id)
            chunk_id += 1
            for row, neg in zip(buffer, negs):
                row = dict(row)
                row[INeg] = tuple(int(v) for v in neg)
                yield row
            buffer.clear()

        for row in self.source:
            buffer.append(row)
            if len(buffer) >= self.CHUNK:
                yield from flush()
        if buffer:
            yield from flush()


@functional_datapipe("seq_train_yielding_pos_")
class SeqTrainPositiveYielder(DataPipe):
    """Targets from the sequence itself: shift-by-one
    (start_idx_for_target=1, end_idx_for_input=-1 — SASRec/main.py:147)
    or last-item-only (start=-1, end=-1 — GRU4Rec)."""

    def __init__(
        self,
        source: DataPipe,
        start_idx_for_target: Optional[int] = 1,
        end_idx_for_input: Optional[int] = -1,
    ):
        super().__init__(source)
        self.start_idx_for_target = start_idx_for_target
        self.end_idx_for_input = end_idx_for_input

    def _check(self, seq) -> bool:
        return len(seq) >= 2

    def __iter__(self) -> Iterator[Row]:
        ISeq, IPos = self.Item.fork(SEQUENCE), self.Item.fork(POSITIVE)
        for row in self.source:
            seq = row[ISeq]
            if not self._check(seq):
                continue
            row = dict(row)
            row[IPos] = seq[self.start_idx_for_target :]
            row[ISeq] = seq[: self.end_idx_for_input]
            yield row


@functional_datapipe("seq_train_sampling_neg_")
class SeqTrainNegativeSampler(DataPipe):
    """Per-position negatives for sequence targets (SASRec/main.py:148):
    for each target position draws `num_negatives` unseen items; with
    num_negatives == 1 the field shape follows IPos (length L), else
    (L, num_negatives). Chunked native sampling as in
    GenTrainNegativeSampler."""

    CHUNK = 2048

    def __init__(self, source: DataPipe, num_negatives: int = 1, unseen_only: bool = True):
        super().__init__(source)
        self.num_negatives = num_negatives
        self.unseen_only = unseen_only
        self._seen: Optional[_SeenLookup] = None

    def _prepare(self):
        if self._seen is None and self.unseen_only:
            self._seen = _SeenLookup(self.dataset.train().user_seqs())

    def __iter__(self) -> Iterator[Row]:
        from .. import native

        self._prepare()
        User = self.User
        IPos, INeg = self.Item.fork(POSITIVE), self.Item.fork(NEGATIVE)
        count = self.Item.count
        buffer: List[Row] = []
        chunk_id = 0

        def flush():
            nonlocal chunk_id
            # one draw stream per (user, position)
            users_flat = np.concatenate(
                [np.full(len(row[IPos]), row[User], np.int64) for row in buffer]
            )
            seed = hash((self._seed or 0, self._epoch, chunk_id)) & (2**63 - 1)
            chunk_id += 1
            if self.unseen_only:
                negs = native.sample_negatives(
                    users_flat, self.num_negatives,
                    self._seen.indptr, self._seen.items, count, seed,
                )
            else:
                negs = np.random.default_rng(seed).integers(
                    0, count, size=(len(users_flat), self.num_negatives)
                )
            offset = 0
            for row in buffer:
                L = len(row[IPos])
                chunk = negs[offset : offset + L]
                offset += L
                row = dict(row)
                if self.num_negatives == 1:
                    row[INeg] = tuple(int(v) for v in chunk[:, 0])
                else:
                    row[INeg] = tuple(tuple(int(v) for v in r) for r in chunk)
                yield row
            buffer.clear()

        for row in self.source:
            buffer.append(row)
            if len(buffer) >= self.CHUNK:
                yield from flush()
        if buffer:
            yield from flush()


class _EvalSamplerBase(DataPipe):
    """Shared machinery of valid/test samplers (HSTU/sampler.py:66-176):
    per eval row k of a user: ISeq = seen ++ unseen[:k], positive =
    unseen[k]; `full` ranking → IUnseen=(positive,), `pool` → positive +
    NUM_POOL_NEGATIVES cached uniform negatives never seen/unseen."""

    def __init__(self, source: DataPipe, ranking: str = "full", num_negatives: int = NUM_POOL_NEGATIVES):
        super().__init__(source)
        self.ranking = ranking
        self.num_negatives = num_negatives
        self._prepared = False
        self.negItems: Dict = {}

    def _seen_unseen(self):
        raise NotImplementedError

    def _prepare(self):
        if not self._prepared:
            self.seenItems, self.unseenItems = self._seen_unseen()
            self._all_known = [
                np.union1d(
                    np.asarray(s, dtype=np.int64), np.asarray(u, dtype=np.int64)
                )
                for s, u in zip(self.seenItems, self.unseenItems)
            ]
            self._prepared = True

    def _sample_neg(self, user: int, k: int, positive: int) -> tuple:
        key = (user, k)
        if key not in self.negItems:
            rng = np.random.default_rng(
                (self._seed if self._seed is not None else 0, user, k)
            )
            known = self._all_known[user]
            count = self.Item.count
            out = rng.integers(0, count, size=self.num_negatives)
            for _ in range(64):
                idx = np.minimum(np.searchsorted(known, out), known.size - 1)
                bad = (known[idx] == out) if known.size else np.zeros(len(out), bool)
                bad |= out == positive
                if not bad.any():
                    break
                out[bad] = rng.integers(0, count, size=int(bad.sum()))
            self.negItems[key] = tuple(out.tolist())
        return self.negItems[key]

    def __iter__(self) -> Iterator[Row]:
        self._prepare()
        User, Item = self.User, self.Item
        ISeq = Item.fork(SEQUENCE)
        IUnseen, ISeen = Item.fork(UNSEEN), Item.fork(SEEN)
        pool = self.ranking == "pool"
        for row in self.source:
            user = row[User]
            seen = tuple(self.seenItems[user])
            unseen = self.unseenItems[user]
            for k, positive in enumerate(unseen):
                candidates = (
                    (positive,) + self._sample_neg(user, k, positive)
                    if pool
                    else (positive,)
                )
                yield {
                    User: user,
                    ISeq: seen + tuple(unseen[:k]),
                    IUnseen: candidates,
                    ISeen: seen,
                }


@functional_datapipe("valid_sampling_")
class ValidSampler(_EvalSamplerBase):
    """seen = train, unseen = valid (HSTU/sampler.py:74-104)."""

    def _seen_unseen(self):
        return (
            self.dataset.train().user_seqs(),
            self.dataset.valid().user_seqs(),
        )


@functional_datapipe("test_sampling_")
class TestSampler(_EvalSamplerBase):
    """seen = train ++ valid (fold valid into the prefix), unseen = test
    (HSTU/sampler.py:128-176)."""

    def _seen_unseen(self):
        train = self.dataset.train().user_seqs()
        valid = self.dataset.valid().user_seqs()
        return (
            [tuple(t) + tuple(v) for t, v in zip(train, valid)],
            self.dataset.test().user_seqs(),
        )


@view_source("shuffled_time_seqs_source")
class ShuffledTimeSeqsSource(_ViewPipe):
    """(user, item seq, timestamp seq) rows, shuffled — the HSTU time
    source (HSTU/sampler.py:14-44). Timestamps are re-based to the
    dataset minimum so they fit int32 (bucketed *differences* are
    invariant to the offset)."""

    def __init__(self, view, maxlen: Optional[int] = None):
        super().__init__(view)
        self.maxlen = maxlen

    def __iter__(self) -> Iterator[Row]:
        User, Item = self.User, self.Item
        ISeq = Item.fork(SEQUENCE)
        Time = self.fields[TIMESTAMP].fork(SEQUENCE)
        seqs = self.view.user_seqs(self.maxlen)
        times = self.view.user_time_seqs(self.maxlen)
        t0 = min((t[0] for t in times if t), default=0)
        order = self.rng().permutation(len(seqs))
        for u in order:
            ts = tuple(int(t - t0) for t in times[u])
            yield {User: int(u), ISeq: seqs[u], Time: ts}


@functional_datapipe("time_seq_train_yielding_pos_")
class TimeSeqTrainPositiveYielder(DataPipe):
    """Shift-by-one targets keeping the timestamp column aligned with
    the input slice (HSTU/sampler.py:47-62)."""

    def __init__(self, source, start_idx_for_target=1, end_idx_for_input=-1):
        super().__init__(source)
        self.start_idx_for_target = start_idx_for_target
        self.end_idx_for_input = end_idx_for_input

    def __iter__(self) -> Iterator[Row]:
        Item = self.Item
        ISeq, IPos = Item.fork(SEQUENCE), Item.fork(POSITIVE)
        Time = self.fields[TIMESTAMP].fork(SEQUENCE)
        for row in self.source:
            seq = row[ISeq]
            if len(seq) < 2:
                continue
            row = dict(row)
            row[IPos] = seq[self.start_idx_for_target :]
            row[ISeq] = seq[: self.end_idx_for_input]
            row[Time] = tuple(row[Time][: self.end_idx_for_input])
            yield row


class _TimeEvalMixin:
    """Adds the aligned timestamp column to eval rows
    (HSTU/sampler.py:66-126): Time = times(seen) ++ times(unseen[:k])."""

    def _time_seqs(self):
        raise NotImplementedError

    def __iter__(self) -> Iterator[Row]:
        self._prepare()
        User, Item = self.User, self.Item
        ISeq = Item.fork(SEQUENCE)
        Time = self.fields[TIMESTAMP].fork(SEQUENCE)
        IUnseen, ISeen = Item.fork(UNSEEN), Item.fork(SEEN)
        seen_times, unseen_times, t0 = self._time_seqs()
        pool = self.ranking == "pool"
        for row in self.source:
            user = row[User]
            seen = tuple(self.seenItems[user])
            unseen = self.unseenItems[user]
            st = tuple(int(t - t0) for t in seen_times[user])
            ut = tuple(int(t - t0) for t in unseen_times[user])
            for k, positive in enumerate(unseen):
                candidates = (
                    (positive,) + self._sample_neg(user, k, positive)
                    if pool
                    else (positive,)
                )
                yield {
                    User: user,
                    ISeq: seen + tuple(unseen[:k]),
                    Time: st + ut[:k],
                    IUnseen: candidates,
                    ISeen: seen,
                }


@functional_datapipe("time_valid_sampling_")
class TimeValidSampler(_TimeEvalMixin, ValidSampler):
    def _time_seqs(self):
        train = self.dataset.train().user_time_seqs()
        valid = self.dataset.valid().user_time_seqs()
        t0 = min((t[0] for t in train if t), default=0)
        return train, valid, t0


@functional_datapipe("time_test_sampling_")
class TimeTestSampler(_TimeEvalMixin, TestSampler):
    def _time_seqs(self):
        train = self.dataset.train().user_time_seqs()
        valid = self.dataset.valid().user_time_seqs()
        test = self.dataset.test().user_time_seqs()
        t0 = min((t[0] for t in train if t), default=0)
        seen = [tuple(a) + tuple(b) for a, b in zip(train, valid)]
        return seen, test, t0


# ============================================================ transforms
@functional_datapipe("add_")
class OffsetAdder(DataPipe):
    """Shift ids by NUM_PADS (SASRec/main.py:149)."""

    def __init__(self, source: DataPipe, offset: int, modified_fields: Iterable[Field]):
        super().__init__(source)
        self.offset = offset
        self.modified_fields = tuple(modified_fields)

    def __iter__(self) -> Iterator[Row]:
        for row in self.source:
            row = dict(row)
            for f in self.modified_fields:
                row[f] = _map_nested(row[f], lambda x: x + self.offset)
            yield row


def _map_nested(value, fn):
    if isinstance(value, tuple):
        return tuple(_map_nested(v, fn) for v in value)
    if isinstance(value, list):
        return [_map_nested(v, fn) for v in value]
    return fn(value)


def _pad(seq: tuple, maxlen: int, value, left: bool) -> tuple:
    seq = tuple(seq)
    if len(seq) >= maxlen:
        return seq[-maxlen:] if left else seq[:maxlen]
    pad = (value,) * (maxlen - len(seq))
    return pad + seq if left else seq + pad


@functional_datapipe("lpad_")
class LeftPadder(DataPipe):
    """Left-pad to maxlen (SASRec/main.py:150-154); sequences longer
    than maxlen keep their last maxlen entries."""

    def __init__(self, source, maxlen: int, modified_fields, padding_value=0):
        super().__init__(source)
        self.maxlen = maxlen
        self.modified_fields = tuple(modified_fields)
        self.padding_value = padding_value

    def __iter__(self) -> Iterator[Row]:
        for row in self.source:
            row = dict(row)
            for f in self.modified_fields:
                row[f] = _pad(row[f], self.maxlen, self.padding_value, left=True)
            yield row


@functional_datapipe("rpad_")
class RightPadder(LeftPadder):
    """Right-pad (GRU4Rec; BERT4Rec eval appends MASK via rpad_,
    BERT4Rec/main.py:124-127)."""

    def __iter__(self) -> Iterator[Row]:
        for row in self.source:
            row = dict(row)
            for f in self.modified_fields:
                row[f] = _pad(row[f], self.maxlen, self.padding_value, left=False)
            yield row


@functional_datapipe("lprune_")
class LeftPruner(DataPipe):
    """Keep the last maxlen entries (BERT4Rec/main.py:118)."""

    def __init__(self, source, maxlen: int, modified_fields):
        super().__init__(source)
        self.maxlen = maxlen
        self.modified_fields = tuple(modified_fields)

    def __iter__(self) -> Iterator[Row]:
        for row in self.source:
            row = dict(row)
            for f in self.modified_fields:
                row[f] = tuple(row[f])[-self.maxlen :]
            yield row


@functional_datapipe("rprune_")
class RightPruner(LeftPruner):
    def __iter__(self) -> Iterator[Row]:
        for row in self.source:
            row = dict(row)
            for f in self.modified_fields:
                row[f] = tuple(row[f])[: self.maxlen]
            yield row


@functional_datapipe("map_")
class Mapper(DataPipe):
    """Arbitrary per-field map (used to stringify semantic ids,
    TIGER/train_t5.py:129-131)."""

    def __init__(self, source, fn: Callable, modified_fields):
        super().__init__(source)
        self.fn = fn
        self.modified_fields = tuple(modified_fields)

    def __iter__(self) -> Iterator[Row]:
        for row in self.source:
            row = dict(row)
            for f in self.modified_fields:
                row[f] = self.fn(row[f])
            yield row


@functional_datapipe("mark_")
class Marker(DataPipe):
    """Attach constant metadata to rows (UniSRec/main.py:204)."""

    def __init__(self, source, **marks):
        super().__init__(source)
        self.marks = marks

    def __iter__(self) -> Iterator[Row]:
        for row in self.source:
            row = dict(row)
            row.update(self.marks)
            yield row


@functional_datapipe("filter_")
class Filter(DataPipe):
    def __init__(self, source, predicate: Callable[[Row], bool]):
        super().__init__(source)
        self.predicate = predicate

    def __iter__(self) -> Iterator[Row]:
        for row in self.source:
            if self.predicate(row):
                yield row


@functional_datapipe("shard_")
class HostSharder(DataPipe):
    """Multi-host input sharding: host i keeps rows i, i+n, i+2n, ...
    (replaces torch-DDP's DistributedSampler)."""

    def __init__(self, source, num_shards: Optional[int] = None, shard_id: Optional[int] = None):
        super().__init__(source)
        from ..parallel import dist

        self.num_shards = num_shards if num_shards is not None else dist.world_size()
        self.shard_id = shard_id if shard_id is not None else dist.rank()

    def __iter__(self) -> Iterator[Row]:
        for i, row in enumerate(self.source):
            if i % self.num_shards == self.shard_id:
                yield row


@functional_datapipe("batch_")
class Batcher(DataPipe):
    def __init__(self, source, batch_size: int, drop_last: bool = False):
        super().__init__(source)
        self.batch_size = batch_size
        self.drop_last = drop_last

    def __iter__(self) -> Iterator[List[Row]]:
        batch: List[Row] = []
        for row in self.source:
            batch.append(row)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch


@functional_datapipe("tensor_")
class Collator(DataPipe):
    """List[Row] → Dict[Field, np.ndarray] (+ Size). Rectangular tuple
    fields stack into arrays; ragged fields (eval ISeq/ISeen) stay as
    tuple-of-tuples for the Coach to mask/densify on device."""

    def __iter__(self) -> Iterator[Row]:
        for batch in self.source:
            yield collate(batch)


def collate(batch: List[Row]) -> Row:
    out: Row = {}
    fields = list(batch[0])
    for f in fields:
        values = [row[f] for row in batch]
        first = values[0]
        if isinstance(first, tuple):
            lens = {len(v) for v in values}
            inner_ragged = any(
                isinstance(x, tuple) for v in values for x in v
            ) and len({len(x) for v in values for x in v if isinstance(x, tuple)}) > 1
            if len(lens) == 1 and not inner_ragged:
                dtype = f.dtype if isinstance(f, Field) else None
                out[f] = np.asarray(values, dtype=dtype)
            else:
                out[f] = tuple(values)
        elif isinstance(first, (int, np.integer, float, np.floating)):
            dtype = f.dtype if isinstance(f, Field) else None
            out[f] = np.asarray(values, dtype=dtype)
        elif isinstance(first, np.ndarray):
            out[f] = np.stack(values)
        elif isinstance(first, str) and all(v == first for v in values):
            out[f] = first  # constant mark_ metadata (dataset name)
        else:
            out[f] = values
    out[Size] = len(batch)
    return out


@functional_datapipe("prefetch_")
class Prefetcher(DataPipe):
    """Background-thread prefetch of up to `buffer_size` batches, hiding
    host-side sampling latency behind device compute."""

    def __init__(self, source, buffer_size: int = 2):
        super().__init__(source)
        self.buffer_size = buffer_size

    def __iter__(self) -> Iterator[Row]:
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.buffer_size)
        sentinel = object()
        error: List[BaseException] = []

        def worker():
            try:
                for item in self.source:
                    q.put(item)
            except BaseException as exc:  # propagate into the consumer
                error.append(exc)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        if error:
            raise error[0]
