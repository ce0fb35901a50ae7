"""Dataset/fields/preprocessing behavioral tests (protocol parity,
SURVEY.md §7 hard part #1 — tiny hand-checked fixtures first)."""

import numpy as np
import pytest

from recboard_tpu.data import preprocessing
from recboard_tpu.data.datasets import NextItemRecDataSet
from recboard_tpu.data.fields import Field, FieldTuple, multi_hot
from recboard_tpu.data.tags import ID, ITEM, SEQUENCE, USER


def test_field_identity_and_fork():
    item = Field("Item", (ITEM, ID), count=10)
    seq = item.fork(SEQUENCE)
    assert seq != item and seq.count == 10
    assert seq.match(ITEM, SEQUENCE) and not item.match(SEQUENCE)
    assert hash(item.fork(SEQUENCE)) == hash(seq)
    ft = FieldTuple([item, Field("User", (USER, ID), count=5)])
    assert ft[ITEM, ID] == item
    assert len(ft.match(ID)) == 2
    assert len(ft.match_not(USER)) == 1


def test_multi_hot():
    m = multi_hot([(0, 2), (), (1,)], 4)
    assert m.shape == (3, 4)
    assert m[0].tolist() == [True, False, True, False]
    assert not m[1].any()


def test_kcore_and_lou_split(tmp_path):
    # user 0: 4 inters, user 1: 3, user 2: 1 (dropped by 2-core)
    users = np.array([0, 0, 0, 0, 1, 1, 1, 2])
    items = np.array([0, 1, 2, 3, 0, 1, 2, 3])
    ts = np.arange(8)
    path = preprocessing.make_dataset(
        str(tmp_path), "T_000_LOU", users, items, None, ts,
        kcore4user=2, kcore4item=1, splitting="LOU",
    )
    ds = NextItemRecDataSet(str(tmp_path), "T_000_LOU")
    assert ds.fields[USER, ID].count == 2
    train = ds.train().user_seqs()
    valid = ds.valid().user_seqs()
    test = ds.test().user_seqs()
    # LOU: last → test, second-last → valid
    assert train[0] == (0, 1) and valid[0] == (2,) and test[0] == (3,)
    assert train[1] == (0,) and valid[1] == (1,) and test[1] == (2,)
    assert ds.meta["splitting"] == "LOU"


def test_rou_split():
    users = np.array([0] * 10)
    split = preprocessing.split_rou(users, (8, 1, 1))
    assert (split == 0).sum() == 8 and (split == 1).sum() == 1 and (split == 2).sum() == 1


def test_reindex_first_appearance():
    new, old = preprocessing.reindex(np.array([42, 7, 42, 9]))
    assert new.tolist() == [0, 1, 0, 2]
    assert old.tolist() == [42, 7, 9]


def test_dataset_views_and_seqs(tiny_dataset):
    ds = tiny_dataset
    assert ds.fields[USER, ID].count > 0
    seqs = ds.train().user_seqs()
    assert len(seqs) == ds.fields[USER, ID].count
    # time-ordering: valid item comes after all train items per user
    rows = ds.train().to_seqs(maxlen=5)
    assert all(len(r[ds.fields[ITEM, ID].fork(SEQUENCE)]) <= 5 for r in rows)
