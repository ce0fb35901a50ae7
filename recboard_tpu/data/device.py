"""On-device training samplers — zero host work in the hot loop.

The generator pipes (data/pipes.py) replicate the reference protocol
exactly, but a Python host cannot feed a chip running >1M examples/s
(SURVEY.md §7 hard part #5). These samplers pack the training split
into device arrays once and draw every batch INSIDE the jitted train
step (the Coach folds `sampler.sample` into its step function), the
way HSTU already samples its negatives on device (HSTU/main.py:157-162).

Protocol parity notes (vs the generator pipes):
* user order per epoch: a jax.random permutation (same semantics as
  shuffled_seqs_source / one-epoch-per-user);
* negatives: uniform with rejection against the user's PACKED history
  (the last maxlen+1 items). Users longer than the window lose
  exclusion for their oldest items — the reference excludes all seen;
  at rec-dataset lengths (avg 8–27 « maxlen) the difference is nil.
  One resample round is applied (collision probability seen/N per
  draw, quadratically suppressed after the retry).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fields import Field
from .tags import ID, ITEM, NEGATIVE, POSITIVE, SEQUENCE, USER

__all__ = [
    "DeviceSeqSampler",
    "DeviceGenSampler",
    "DeviceRollSeqSampler",
    "DeviceLastTargetSampler",
    "DeviceFullSeqSampler",
    "DevicePairSampler",
]


class _DeviceSamplerBase:
    """Marker base the Coach recognizes; exposes steps_per_epoch and a
    jit-traceable `sample(epoch_key, step_idx) -> batch`.

    Samplers that shuffle an index space split the work into
    ``prepare(epoch_key)`` (the epoch permutation — a DEVICE SORT of
    #users/#windows keys, 20-150k elements at Beauty scale) and
    ``sample_prepared(prep, epoch_key, step_idx)``. The Coach's
    scan-chunked epoch calls prepare once per CHUNK instead of once
    per step — recomputing a 133k-element sort every step was ~90% of
    the observed XL epoch wall. ``sample`` composes the two for
    one-shot callers; the draw streams are identical either way."""

    is_device_sampler = True

    def set_seed(self, seed: int):
        self.seed = int(seed)
        return self

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)
        return self

    def epoch_key(self):
        return jax.random.fold_in(
            jax.random.PRNGKey(getattr(self, "seed", 0)),
            getattr(self, "epoch", 0),
        )

    def prepare(self, epoch_key):
        """Per-epoch constants (e.g. the shuffle permutation)."""
        return None

    def sample_prepared(self, prep, epoch_key, step_idx):
        raise NotImplementedError

    def sample(self, epoch_key, step_idx):
        return self.sample_prepared(
            self.prepare(epoch_key), epoch_key, step_idx
        )


class DeviceSeqSampler(_DeviceSamplerBase):
    """SASRec-style trainpipe on device: per epoch a permutation of
    users; per row: input = seq[-(maxlen+1):-1] (+NUM_PADS, left-pad),
    target = shift-by-one, one uniform negative per position."""

    def __init__(
        self,
        dataset,
        maxlen: int,
        batch_size: int,
        num_pads: int = 1,
        num_negatives: int = 1,
        exclude_seen: bool = True,
    ):
        self.dataset = dataset
        self.maxlen = maxlen
        self.batch_size = batch_size
        self.num_pads = num_pads
        self.num_negatives = num_negatives
        self.exclude_seen = exclude_seen

        User = dataset.fields[USER, ID]
        Item = dataset.fields[ITEM, ID]
        self.User, self.Item = User, Item
        self.ISeq = Item.fork(SEQUENCE)
        self.IPos = Item.fork(POSITIVE)
        self.INeg = Item.fork(NEGATIVE)
        self.num_items = Item.count

        seqs = dataset.train().user_seqs()
        W = maxlen + 1
        packed = np.zeros((User.count, W), dtype=np.int32)  # raw ids + 1; 0 = pad
        for u, s in enumerate(seqs):
            tail = list(s)[-W:]
            if len(tail) >= 2:
                packed[u, W - len(tail):] = np.asarray(tail) + 1
        valid_users = np.flatnonzero((packed != 0).sum(1) >= 2)
        self._packed = jnp.asarray(packed)
        self._valid_users = jnp.asarray(valid_users, jnp.int32)
        self.steps_per_epoch = max(1, len(valid_users) // batch_size)

    def prepare(self, epoch_key):
        return jax.random.permutation(epoch_key, self._valid_users.shape[0])

    def sample_prepared(self, perm, epoch_key, step_idx) -> Dict[Field, jnp.ndarray]:
        B, L = self.batch_size, self.maxlen
        n = self._valid_users.shape[0]
        # modular gather instead of dynamic_slice: works when B > n
        rows = perm[(step_idx * B + jnp.arange(B)) % n]
        users = self._valid_users[rows]
        window = self._packed[users]  # (B, L+1) raw+1, 0 pad
        inputs_raw = window[:, :-1]
        targets_raw = window[:, 1:]
        valid = targets_raw != 0
        # ISeq carries NUM_PADS offset over raw ids (add_ semantics)
        iseq = jnp.where(
            inputs_raw != 0, inputs_raw - 1 + self.num_pads, 0
        ).astype(jnp.int32)
        ipos = jnp.where(valid, targets_raw - 1, 0).astype(jnp.int32)

        key = jax.random.fold_in(epoch_key, step_idx)
        negs = jax.random.randint(key, (B, L), 0, self.num_items)
        if self.exclude_seen:
            # one rejection round against the packed window
            def collides(c):
                return (c[..., None] + 1 == window[:, None, :]).any(-1)

            retry = jax.random.randint(
                jax.random.fold_in(key, 1), (B, L), 0, self.num_items
            )
            negs = jnp.where(collides(negs), retry, negs)
        return {
            self.User: users,
            self.ISeq: iseq,
            self.IPos: ipos,
            self.INeg: negs.astype(jnp.int32),
        }


class DeviceTimeSeqSampler(DeviceSeqSampler):
    """HSTU-style trainpipe on device: like DeviceSeqSampler but also
    carries the aligned timestamp column (shuffled_time_seqs_source +
    time_seq_train_yielding_pos_, HSTU/sampler.py). Negatives are drawn
    by the model itself (HSTU samples in fit), so none here."""

    def __init__(self, dataset, maxlen: int, batch_size: int, num_pads: int = 1):
        super().__init__(dataset, maxlen, batch_size, num_pads, exclude_seen=False)
        from .tags import TIMESTAMP

        self.Time = dataset.fields[TIMESTAMP].fork(SEQUENCE)
        times = dataset.train().user_time_seqs()
        W = maxlen + 1
        t0 = min((t[0] for t in times if t), default=0)
        packed_t = np.zeros((self.User.count, W), dtype=np.int32)
        for u, t in enumerate(times):
            tail = list(t)[-W:]
            if len(tail) >= 2:
                packed_t[u, W - len(tail):] = np.asarray(tail) - t0
        self._packed_t = jnp.asarray(packed_t)

    def sample_prepared(self, perm, epoch_key, step_idx) -> Dict[Field, jnp.ndarray]:
        B, L = self.batch_size, self.maxlen
        n = self._valid_users.shape[0]
        # modular gather instead of dynamic_slice: works when B > n
        rows = perm[(step_idx * B + jnp.arange(B)) % n]
        users = self._valid_users[rows]
        window = self._packed[users]
        t_window = self._packed_t[users]
        inputs_raw = window[:, :-1]
        targets_raw = window[:, 1:]
        valid = targets_raw != 0
        iseq = jnp.where(
            inputs_raw != 0, inputs_raw - 1 + self.num_pads, 0
        ).astype(jnp.int32)
        ipos = jnp.where(valid, targets_raw - 1, 0).astype(jnp.int32)
        times = jnp.where(inputs_raw != 0, t_window[:, :-1], 0).astype(jnp.int32)
        return {
            self.User: users,
            self.ISeq: iseq,
            self.IPos: ipos,
            self.Time: times,
        }


class DeviceRollSeqSampler(_DeviceSamplerBase):
    """Rolling-window trainpipe on device (shuffled_roll_seqs_source +
    seq_train_yielding_pos_(-1[, -1]) [+ seq_train_sampling_neg_] +
    lpad_/rpad_): one training row per (user, end) window — epoch size
    = #windows, not #users. Target is the window's final item; input is
    the items before it, padded with ``pad_value``.

    Covers two reference protocols (SURVEY.md §2.2):
    * ``window_includes_target=True`` (default) — the roll source is
      built with ``maxlen=maxlen`` so the window INCLUDING the target
      is capped: input length ≤ maxlen-1 (TIGER/train_t5.py, STAMP,
      FMLP-Rec, BSARec, FPMC trainpipes; these lpad_).
    * ``window_includes_target=False`` — the roll source is uncapped
      and the input is lprune_(maxlen)'d afterwards: input length ≤
      maxlen (GRU4Rec/NARM/GLINT-RU trainpipes; these rpad_).

    ``num_negatives`` > 0 additionally draws per-row uniform negatives
    with one rejection round against the user's FULL train history
    (seq_train_sampling_neg_ semantics); shape (B, 1) for one negative,
    (B, 1, K) otherwise — matching the generator pipe's collation.

    ``num_positives`` = P > 1 switches to the Caser window protocol
    (Caser/main.py sure_trainpipe: shuffled_roll_seqs_source(minlen=
    P+1, maxlen=maxlen+P, keep_at_least_itself=False) +
    seq_train_yielding_pos_(start_idx_for_target=-P,
    end_idx_for_input=-P) + gen_train_sampling_neg_(K)): the window is
    capped at maxlen+P, its LAST P items are the positives (B, P), the
    items before them are the input (≤ maxlen, left-padded), and the
    negatives collate 2-D (B, K) — gen_* (not seq_*) semantics, which
    is what Caser's fit concatenates along axis 1.

    Measured on a v5e at the Beauty config: TIGER's jitted step is
    1.4 ms but the generator pipe feeds it at 55 ms/step over the
    tunnel — this sampler closes that 40× gap."""

    def __init__(
        self,
        dataset,
        maxlen: int,
        batch_size: int,
        minlen: int = 2,
        num_pads: int = 0,
        pad_value: int = 0,
        num_negatives: int = 0,
        num_positives: int = 1,
        pad_side: str = "left",
        window_includes_target: bool = True,
        keep_at_least_itself: bool = True,
    ):
        assert pad_side in ("left", "right"), pad_side
        assert num_positives == 1 or pad_side == "left", (
            "multi-positive (Caser) windows lpad_ in the reference"
        )
        self.dataset = dataset
        self.maxlen = maxlen
        self.batch_size = batch_size
        self.num_pads = num_pads
        self.pad_value = pad_value
        self.num_negatives = num_negatives
        self.num_positives = num_positives
        self.pad_side = pad_side
        self.window_includes_target = window_includes_target

        User = dataset.fields[USER, ID]
        Item = dataset.fields[ITEM, ID]
        self.User, self.Item = User, Item
        self.ISeq = Item.fork(SEQUENCE)
        self.IPos = Item.fork(POSITIVE)
        self.INeg = Item.fork(NEGATIVE)
        self.num_items = Item.count

        seqs = dataset.train().user_seqs()
        Lmax = max((len(s) for s in seqs), default=1)
        # raw+1 storage, 0 = empty — unambiguous for collision checks
        packed = np.zeros((User.count, Lmax), dtype=np.int32)
        pairs = []
        minlen = max(minlen, 2)
        for u, s in enumerate(seqs):
            n = len(s)
            packed[u, :n] = np.asarray(s, dtype=np.int32) + 1
            if n >= minlen:
                for e in range(minlen, n + 1):
                    pairs.append((u, e))
            elif keep_at_least_itself and n >= 1:
                pairs.append((u, n))
        self._packed = jnp.asarray(packed)
        self._pairs = jnp.asarray(np.asarray(pairs, dtype=np.int32).reshape(-1, 2))
        self.num_windows = len(pairs)
        self.steps_per_epoch = max(1, self.num_windows // batch_size)

    def prepare(self, epoch_key):
        return jax.random.permutation(epoch_key, self._pairs.shape[0])

    def sample_prepared(self, perm, epoch_key, step_idx) -> Dict[Field, jnp.ndarray]:
        B, L, P = self.batch_size, self.maxlen, self.num_positives
        W = self._pairs.shape[0]
        take = perm[(step_idx * B + jnp.arange(B)) % W]
        pairs = self._pairs[take]  # (B, 2) = (user, end)
        users, ends = pairs[:, 0], pairs[:, 1]
        if P > 1:
            # Caser windows: window = seq[max(0, e-L-P):e]; the last P
            # items are targets, the ≤L before them the (lpad) input
            idx = ends[:, None] - P - L + jnp.arange(L)[None, :]
            valid = idx >= 0
            gathered = self._packed[users[:, None], jnp.clip(idx, 0, None)]
            iseq = jnp.where(
                valid, gathered - 1 + self.num_pads, self.pad_value
            ).astype(jnp.int32)
            pos_idx = ends[:, None] - P + jnp.arange(P)[None, :]
            ipos = (
                self._packed[users[:, None], pos_idx] - 1
            ).astype(jnp.int32)  # (B, P) raw targets
        else:
            eff = L - 1 if self.window_includes_target else L
            lo = jnp.maximum(ends - 1 - eff, 0)  # first usable input index
            if self.pad_side == "right":
                idx = lo[:, None] + jnp.arange(L)[None, :]
                valid = idx < ends[:, None] - 1
            else:
                # items right-aligned into the last min(eff, end-1) slots
                idx = ends[:, None] - 1 - L + jnp.arange(L)[None, :]
                valid = (idx >= 0) & (idx >= lo[:, None])
            gathered = self._packed[users[:, None], jnp.clip(idx, 0, None)]
            iseq = jnp.where(
                valid, gathered - 1 + self.num_pads, self.pad_value
            ).astype(jnp.int32)
            ipos = (
                jnp.take_along_axis(
                    self._packed[users], ends[:, None] - 1, axis=1
                ) - 1
            ).astype(jnp.int32)  # (B, 1) raw target
        batch = {self.User: users, self.ISeq: iseq, self.IPos: ipos}
        if self.num_negatives:
            K = self.num_negatives
            key = jax.random.fold_in(epoch_key, step_idx)
            hist = self._packed[users]  # (B, Lmax) raw+1
            negs = jax.random.randint(
                jax.random.fold_in(key, 0), (B, K), 0, self.num_items
            )
            retry = jax.random.randint(
                jax.random.fold_in(key, 1), (B, K), 0, self.num_items
            )
            collide = (negs[..., None] + 1 == hist[:, None, :]).any(-1)
            negs = jnp.where(collide, retry, negs).astype(jnp.int32)
            if P > 1:  # gen_train_sampling_neg_ collates 2-D (B, K)
                batch[self.INeg] = negs
            else:
                batch[self.INeg] = negs if K == 1 else negs[:, None, :]
        return batch


class DeviceFullSeqSampler(_DeviceSamplerBase):
    """Whole-sequence trainpipe on device (shuffled_seqs_source +
    add_ + lpad_): one row per user per epoch, input = the user's last
    ``maxlen`` train items (+num_pads offset, left-padded with 0).

    * BERT4Rec (BERT4Rec/main.py sure_trainpipe): no targets here —
      the model draws its in-batch random masking from the "sampling"
      rng stream inside fit.
    * RUM (RUM/main.py trainpipe): ``sample_pos=True`` additionally
      draws one uniform positive from the user's history
      (gen_train_sampling_pos_) and ``num_negatives`` rejected-vs-
      history negatives (gen_train_sampling_neg_)."""

    def __init__(
        self,
        dataset,
        maxlen: int,
        batch_size: int,
        num_pads: int = 1,
        sample_pos: bool = False,
        num_negatives: int = 0,
    ):
        self.dataset = dataset
        self.maxlen = maxlen
        self.batch_size = batch_size
        self.num_pads = num_pads
        self.sample_pos = sample_pos
        self.num_negatives = num_negatives

        User = dataset.fields[USER, ID]
        Item = dataset.fields[ITEM, ID]
        self.User, self.Item = User, Item
        self.ISeq = Item.fork(SEQUENCE)
        self.IPos = Item.fork(POSITIVE)
        self.INeg = Item.fork(NEGATIVE)
        self.num_items = Item.count

        seqs = dataset.train().user_seqs()
        L = maxlen
        packed = np.zeros((User.count, L), dtype=np.int32)  # raw+1, 0 pad
        counts = np.zeros(User.count, dtype=np.int32)
        for u, s in enumerate(seqs):
            tail = list(s)[-L:]
            if tail:
                packed[u, L - len(tail):] = np.asarray(tail) + 1
            counts[u] = len(tail)
        valid_users = np.flatnonzero(counts >= 1)
        self._packed = jnp.asarray(packed)
        self._counts = jnp.asarray(np.maximum(counts, 1))
        self._valid_users = jnp.asarray(valid_users, jnp.int32)
        self.steps_per_epoch = max(1, len(valid_users) // batch_size)

    def prepare(self, epoch_key):
        return jax.random.permutation(epoch_key, self._valid_users.shape[0])

    def sample_prepared(self, perm, epoch_key, step_idx) -> Dict[Field, jnp.ndarray]:
        B, L = self.batch_size, self.maxlen
        n = self._valid_users.shape[0]
        # modular gather instead of dynamic_slice: works when B > n
        rows = perm[(step_idx * B + jnp.arange(B)) % n]
        users = self._valid_users[rows]
        window = self._packed[users]  # (B, L) raw+1
        iseq = jnp.where(window != 0, window - 1 + self.num_pads, 0).astype(
            jnp.int32
        )
        batch = {self.User: users, self.ISeq: iseq}
        key = jax.random.fold_in(epoch_key, step_idx)
        if self.sample_pos:
            pick = jax.random.randint(
                jax.random.fold_in(key, 0), (B,), 0, 2**30
            ) % self._counts[users]
            # histories are right-aligned: valid slots start at L-count
            slot = L - self._counts[users] + pick
            pos = jnp.take_along_axis(window, slot[:, None], axis=1) - 1
            batch[self.IPos] = pos.astype(jnp.int32)  # (B, 1) raw ids
        if self.num_negatives:
            K = self.num_negatives
            negs = jax.random.randint(
                jax.random.fold_in(key, 1), (B, K), 0, self.num_items
            )
            retry = jax.random.randint(
                jax.random.fold_in(key, 2), (B, K), 0, self.num_items
            )
            collide = (negs[..., None] + 1 == window[:, None, :]).any(-1)
            batch[self.INeg] = jnp.where(collide, retry, negs).astype(jnp.int32)
        return batch


class DeviceLastTargetSampler(_DeviceSamplerBase):
    """ETEGRec/DIGER trainpipe on device (etegrec.py sure_trainpipe:
    shuffled_seqs_source(maxlen+1) + seq_train_yielding_pos_(-1, -1) +
    add_(NUM_PADS, (ISeq, IPos)) + rpad_): one row per user per epoch,
    input = the user's last ≤maxlen train items BEFORE the final one
    (offset, RIGHT-padded), target = the final item — ALSO offset,
    unlike the SASRec-family pipes (the reference applies add_ to IPos
    here because the generator embeds target ids through the same
    padded table)."""

    def __init__(self, dataset, maxlen: int, batch_size: int, num_pads: int = 1):
        self.dataset = dataset
        self.maxlen = maxlen
        self.batch_size = batch_size
        self.num_pads = num_pads

        User = dataset.fields[USER, ID]
        Item = dataset.fields[ITEM, ID]
        self.User, self.Item = User, Item
        self.ISeq = Item.fork(SEQUENCE)
        self.IPos = Item.fork(POSITIVE)
        self.num_items = Item.count

        seqs = dataset.train().user_seqs()
        W = maxlen + 1
        packed = np.zeros((User.count, W), dtype=np.int32)  # raw+1, left-aligned
        counts = np.zeros(User.count, dtype=np.int32)
        for u, s in enumerate(seqs):
            tail = list(s)[-W:]
            packed[u, : len(tail)] = np.asarray(tail) + 1
            counts[u] = len(tail)
        valid_users = np.flatnonzero(counts >= 2)
        self._packed = jnp.asarray(packed)
        self._counts = jnp.asarray(counts)
        self._valid_users = jnp.asarray(valid_users, jnp.int32)
        self.steps_per_epoch = max(1, len(valid_users) // batch_size)

    def prepare(self, epoch_key):
        return jax.random.permutation(epoch_key, self._valid_users.shape[0])

    def sample_prepared(self, perm, epoch_key, step_idx) -> Dict[Field, jnp.ndarray]:
        B, L = self.batch_size, self.maxlen
        n = self._valid_users.shape[0]
        rows = perm[(step_idx * B + jnp.arange(B)) % n]
        users = self._valid_users[rows]
        window = self._packed[users]          # (B, L+1) raw+1, left-aligned
        counts = self._counts[users]          # tail lengths (>=2)
        # input = tail[:-1] (rpad layout already left-aligned)
        inputs_raw = window[:, :-1]
        pos_in_input = jnp.arange(L)[None, :] < (counts - 1)[:, None]
        iseq = jnp.where(
            pos_in_input, inputs_raw - 1 + self.num_pads, 0
        ).astype(jnp.int32)
        # target = tail[-1], OFFSET (add_ covers IPos in this pipe)
        tgt = jnp.take_along_axis(window, (counts - 1)[:, None], axis=1)
        ipos = (tgt - 1 + self.num_pads).astype(jnp.int32)  # (B, 1)
        return {self.User: users, self.ISeq: iseq, self.IPos: ipos}


class DevicePairSampler(_DeviceSamplerBase):
    """Interaction-pairs trainpipe on device (shuffled_pairs_source
    [+ gen_train_sampling_neg_], SimpleX/UltraGCN trainpipes): one row
    per (user, item) train interaction — users weighted by activity,
    unlike DeviceGenSampler's uniform users. Emits User (B,), the pair
    item under the raw Item field (B, 1) — the pairs-source protocol
    consumed as ``data[self.Item]`` by SimpleX/UltraGCN fit — and,
    with ``num_negatives``, INeg (B, K) negatives drawn
    uniformly, optionally rejected against the user's packed history
    (``exclude_seen`` = the models' `unseen_only`)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_negatives: int = 0,
        exclude_seen: bool = True,
        max_history: int = 128,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_negatives = num_negatives
        self.exclude_seen = exclude_seen

        User = dataset.fields[USER, ID]
        Item = dataset.fields[ITEM, ID]
        self.User, self.Item = User, Item
        self.IPos = Item.fork(POSITIVE)
        self.INeg = Item.fork(NEGATIVE)
        self.num_items = Item.count

        seqs = dataset.train().user_seqs()
        pair_u, pair_i = [], []
        H = min(max_history, max((len(s) for s in seqs), default=1))
        packed = np.zeros((User.count, H), dtype=np.int32)
        for u, s in enumerate(seqs):
            pair_u.extend([u] * len(s))
            pair_i.extend(s)
            tail = list(s)[-H:]
            packed[u, : len(tail)] = np.asarray(tail) + 1
        self._pair_u = jnp.asarray(np.asarray(pair_u, dtype=np.int32))
        self._pair_i = jnp.asarray(np.asarray(pair_i, dtype=np.int32))
        self._packed = jnp.asarray(packed)
        self.num_pairs = len(pair_u)
        self.steps_per_epoch = max(1, self.num_pairs // batch_size)

    def prepare(self, epoch_key):
        return jax.random.permutation(epoch_key, self._pair_u.shape[0])

    def sample_prepared(self, perm, epoch_key, step_idx) -> Dict[Field, jnp.ndarray]:
        B, K = self.batch_size, self.num_negatives
        E = self._pair_u.shape[0]
        take = perm[(step_idx * B + jnp.arange(B)) % E]
        users = self._pair_u[take]
        pos = self._pair_i[take][:, None]  # (B, 1)
        batch = {
            self.User: users,
            self.Item: pos.astype(jnp.int32),
        }
        if K:
            key = jax.random.fold_in(epoch_key, step_idx)
            negs = jax.random.randint(
                jax.random.fold_in(key, 0), (B, K), 0, self.num_items
            )
            if self.exclude_seen:
                hist = self._packed[users]
                retry = jax.random.randint(
                    jax.random.fold_in(key, 1), (B, K), 0, self.num_items
                )
                collide = (negs[..., None] + 1 == hist[:, None, :]).any(-1)
                negs = jnp.where(collide, retry, negs)
            batch[self.INeg] = negs.astype(jnp.int32)
        return batch


class DeviceGenSampler(_DeviceSamplerBase):
    """MF-BPR-style trainpipe on device: per step uniform users, one
    positive drawn from the user's packed history, K uniform negatives
    (one rejection round against the history)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_negatives: int = 1,
        max_history: int = 128,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_negatives = num_negatives

        User = dataset.fields[USER, ID]
        Item = dataset.fields[ITEM, ID]
        self.User, self.Item = User, Item
        self.IPos = Item.fork(POSITIVE)
        self.INeg = Item.fork(NEGATIVE)
        self.num_items = Item.count

        seqs = dataset.train().user_seqs()
        H = min(max_history, max((len(s) for s in seqs), default=1))
        packed = np.zeros((User.count, H), dtype=np.int32)
        counts = np.zeros(User.count, dtype=np.int32)
        for u, s in enumerate(seqs):
            tail = list(s)[-H:]
            packed[u, : len(tail)] = np.asarray(tail) + 1
            counts[u] = len(tail)
        self._packed = jnp.asarray(packed)
        self._counts = jnp.asarray(np.maximum(counts, 1))
        self.steps_per_epoch = max(1, User.count // batch_size)

    def sample_prepared(self, prep, epoch_key, step_idx) -> Dict[Field, jnp.ndarray]:
        B, K = self.batch_size, self.num_negatives
        key = jax.random.fold_in(epoch_key, step_idx)
        users = jax.random.randint(
            jax.random.fold_in(key, 0), (B,), 0, self.User.count
        )
        hist = self._packed[users]  # (B, H) raw+1
        pick = jax.random.randint(
            jax.random.fold_in(key, 1), (B,), 0, 2**30
        ) % self._counts[users]
        pos = jnp.take_along_axis(hist, pick[:, None], axis=1) - 1  # (B, 1)
        negs = jax.random.randint(
            jax.random.fold_in(key, 2), (B, K), 0, self.num_items
        )
        retry = jax.random.randint(
            jax.random.fold_in(key, 3), (B, K), 0, self.num_items
        )
        collide = (negs[..., None] + 1 == hist[:, None, :]).any(-1)
        negs = jnp.where(collide, retry, negs)
        return {
            self.User: users.astype(jnp.int32),
            self.IPos: pos.astype(jnp.int32),
            self.INeg: negs.astype(jnp.int32),
        }
