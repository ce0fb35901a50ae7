"""Native C++ layer: build, sampling correctness/determinism, TSV
parsing parity with the Python loader, sampler-pipe integration."""

import os

import numpy as np
import pytest

from recboard_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of the native library failed"


def test_sample_negatives_excludes_seen():
    indptr = np.array([0, 3, 3, 5])
    items = np.array([1, 5, 9, 2, 7])  # user0: {1,5,9}, user1: {}, user2: {2,7}
    users = np.array([0] * 50 + [1] * 20 + [2] * 50)
    out = native.sample_negatives(users, 8, indptr, items, 10, seed=123)
    assert out.shape == (120, 8)
    assert out.min() >= 0 and out.max() < 10
    for i, u in enumerate(users):
        seen = set(items[indptr[u] : indptr[u + 1]].tolist())
        assert not (set(out[i].tolist()) & seen)


def test_sample_negatives_deterministic():
    indptr = np.array([0, 2])
    items = np.array([0, 1])
    users = np.zeros(100, dtype=np.int64)
    a = native.sample_negatives(users, 4, indptr, items, 50, seed=7)
    b = native.sample_negatives(users, 4, indptr, items, 50, seed=7)
    c = native.sample_negatives(users, 4, indptr, items, 50, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    # roughly uniform over the allowed range
    counts = np.bincount(a.reshape(-1), minlength=50)
    assert counts[0] == 0 and counts[1] == 0


def test_parse_interactions(tmp_path, tiny_dataset):
    file_ = os.path.join(tiny_dataset.path, "train.txt")
    parsed = native.parse_interactions(file_)
    assert parsed is not None
    users, items, col3, col4 = parsed
    ref_users, ref_items = tiny_dataset.train().to_bigraph_edges()
    np.testing.assert_array_equal(users, ref_users)
    np.testing.assert_array_equal(items, ref_items)


def test_sampler_pipes_use_chunked_path(tiny_dataset):
    from recboard_tpu.data.tags import ID, ITEM, NEGATIVE, POSITIVE, USER

    User = tiny_dataset.fields[USER, ID]
    Item = tiny_dataset.fields[ITEM, ID]
    INeg = Item.fork(NEGATIVE)
    seqs = tiny_dataset.train().user_seqs()
    pipe = (
        tiny_dataset.train()
        .choiced_user_ids_source()
        .gen_train_sampling_pos_()
        .gen_train_sampling_neg_(num_negatives=3)
        .set_seed(1)
    )
    rows_a = list(pipe)
    rows_b = list(pipe)
    for ra, rb in zip(rows_a, rows_b):
        assert ra[INeg] == rb[INeg]  # epoch-deterministic
        for neg in ra[INeg]:
            assert neg not in seqs[ra[User]]
    pipe.set_epoch(1)
    assert [r[INeg] for r in pipe] != [r[INeg] for r in rows_a]
