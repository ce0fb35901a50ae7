"""Multi-host input sharding (`shard_`, data/pipes.py HostSharder).

The reference delegates host data sharding to torch-DDP's
DistributedSampler; here each host applies `.shard_(n, i)` to its pipe
(SURVEY.md §2.1 parallelism table). No multi-host hardware exists in
this image, so these tests simulate N hosts by instantiating the same
pipe chain with explicit (num_shards, shard_id) and pin the protocol:
disjoint, covering, deterministic under a shared seed, and balanced.
"""

from __future__ import annotations

import numpy as np
import pytest

from recboard_tpu.data import synthetic
from recboard_tpu.models.zoo import SASRec


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mh"))
    return synthetic.synthetic_next_item(
        root=root, name="MH_001_LOU", num_users=97, num_items=60,
        avg_len=8.0, seed=5,
    )


def _rows(pipe):
    """Materialize a pipe of per-row dicts into hashable tuples."""
    out = []
    for row in pipe:
        key = tuple(
            (str(f), tuple(np.ravel(v).tolist()))
            for f, v in sorted(row.items(), key=lambda kv: str(kv[0]))
        )
        out.append(key)
    return out


def test_shard_partition_is_disjoint_and_covering(ds):
    model = SASRec(dataset=ds, maxlen=8)

    def source():
        return (
            ds.train()
            .shuffled_seqs_source(maxlen=8)
            .seq_train_yielding_pos_(start_idx_for_target=1, end_idx_for_input=-1)
        )

    # depth-matched single-shard pipe: set_seed offsets by chain depth,
    # so the unsharded comparison pipe also goes through a HostSharder
    full_pipe = source().shard_(num_shards=1, shard_id=0)
    full_pipe.set_seed(7)
    full_pipe.set_epoch(0)
    full = _rows(full_pipe)

    shards = []
    for i in range(4):
        p = source().shard_(num_shards=4, shard_id=i)
        p.set_seed(7)
        p.set_epoch(0)
        shards.append(_rows(p))

    # covering: every row lands on exactly one host, order-preserved
    interleaved = []
    iters = [iter(s) for s in shards]
    for j in range(len(full)):
        interleaved.append(next(iters[j % 4]))
    assert interleaved == full

    # balanced within one row
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1
    assert sum(sizes) == len(full)


def test_shard_deterministic_across_reconstruction(ds):
    """Two processes building the same pipe with the same seed see the
    same shard content (resume/elastic contract)."""

    def build(shard_id):
        p = (
            ds.train()
            .shuffled_seqs_source(maxlen=8)
            .seq_train_yielding_pos_(start_idx_for_target=1, end_idx_for_input=-1)
            .shard_(num_shards=2, shard_id=shard_id)
        )
        p.set_seed(13)
        p.set_epoch(3)
        return _rows(p)

    assert build(0) == build(0)
    assert build(1) == build(1)
    assert not set(build(0)) & set(build(1))


def test_shard_eval_pipe_covers_all_users(ds):
    """Ordered eval pipes shard by row too; the union of host shards
    evaluates every user exactly once."""
    model = SASRec(dataset=ds, maxlen=8)

    def users_of(shard_id, n):
        # shard before batching: build the chain manually
        src = (
            ds.valid()
            .ordered_user_ids_source()
            .valid_sampling_(ranking="full")
            .shard_(num_shards=n, shard_id=shard_id)
        )
        return [row[model.User] for row in src]

    seen = []
    for i in range(3):
        seen += [int(np.ravel(u)[0]) for u in users_of(i, 3)]
    all_users = [
        int(np.ravel(row[model.User])[0])
        for row in ds.valid().ordered_user_ids_source().valid_sampling_(ranking="full")
    ]
    assert sorted(seen) == sorted(all_users)
    assert len(seen) == len(set(seen))
