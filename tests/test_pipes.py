"""Datapipe DSL tests: determinism, semantics of samplers/transforms,
eval-protocol fixtures (SURVEY.md §7 hard part #1)."""

import numpy as np

from recboard_tpu.data.pipes import Size, collate
from recboard_tpu.data.tags import ID, ITEM, SEEN, SEQUENCE, UNSEEN, USER, POSITIVE, NEGATIVE


def _fields(ds):
    User = ds.fields[USER, ID]
    Item = ds.fields[ITEM, ID]
    return User, Item


def test_choiced_source_epoch_size_and_determinism(tiny_dataset):
    User, _ = _fields(tiny_dataset)
    pipe = tiny_dataset.train().choiced_user_ids_source().set_seed(3)
    rows_a = [r[User] for r in pipe]
    rows_b = [r[User] for r in pipe]
    assert len(rows_a) == User.count
    assert rows_a == rows_b  # same epoch → same draws
    pipe.set_epoch(1)
    assert [r[User] for r in pipe] != rows_a


def test_gen_sampling_pos_neg(tiny_dataset):
    User, Item = _fields(tiny_dataset)
    IPos, INeg = Item.fork(POSITIVE), Item.fork(NEGATIVE)
    seqs = tiny_dataset.train().user_seqs()
    pipe = (
        tiny_dataset.train()
        .choiced_user_ids_source()
        .gen_train_sampling_pos_()
        .gen_train_sampling_neg_(num_negatives=2)
        .set_seed(0)
    )
    for row in pipe:
        u = row[User]
        assert row[IPos][0] in seqs[u]
        for neg in row[INeg]:
            assert neg not in seqs[u]


def test_seq_train_yielding_and_padding(tiny_dataset):
    User, Item = _fields(tiny_dataset)
    ISeq, IPos, INeg = Item.fork(SEQUENCE), Item.fork(POSITIVE), Item.fork(NEGATIVE)
    maxlen = 8
    pipe = (
        tiny_dataset.train()
        .shuffled_seqs_source(maxlen=maxlen)
        .seq_train_yielding_pos_(start_idx_for_target=1, end_idx_for_input=-1)
        .seq_train_sampling_neg_(num_negatives=1)
        .add_(offset=1, modified_fields=(ISeq,))
        .lpad_(maxlen, modified_fields=(ISeq, IPos, INeg), padding_value=0)
        .batch_(4)
        .tensor_()
        .set_seed(0)
    )
    batch = next(iter(pipe))
    assert batch[ISeq].shape == (4, maxlen)
    assert batch[IPos].shape == (4, maxlen)
    assert batch[Size] == 4
    # shift-by-one: unpadded input[i+1] == target[i] + offset relationship
    seqs = tiny_dataset.train().user_seqs()
    for b in range(4):
        u = int(batch[User][b])
        full = seqs[u][-maxlen:]
        inp = [x for x in batch[ISeq][b].tolist() if x != 0]
        tgt = [x for x in batch[IPos][b].tolist() if x != 0][-len(inp):]
        assert inp == [x + 1 for x in full[:-1]][-len(inp):]
        assert tgt[-1] == full[-1]


def test_valid_test_sampler_protocol(tiny_dataset):
    """valid: seen=train; test: seen=train++valid (HSTU/sampler.py)."""
    User, Item = _fields(tiny_dataset)
    ISeq, IUnseen, ISeen = (
        Item.fork(SEQUENCE),
        Item.fork(UNSEEN),
        Item.fork(SEEN),
    )
    train = tiny_dataset.train().user_seqs()
    valid = tiny_dataset.valid().user_seqs()
    test = tiny_dataset.test().user_seqs()

    vrows = list(
        tiny_dataset.valid().ordered_user_ids_source().valid_sampling_("full").set_seed(0)
    )
    by_user = {}
    for r in vrows:
        by_user.setdefault(r[User], []).append(r)
    for u, rows in by_user.items():
        assert len(rows) == len(valid[u])
        for k, r in enumerate(rows):
            assert r[ISeen] == tuple(train[u])
            assert r[ISeq] == tuple(train[u]) + tuple(valid[u][:k])
            assert r[IUnseen] == (valid[u][k],)

    trows = list(
        tiny_dataset.test().ordered_user_ids_source().test_sampling_("full").set_seed(0)
    )
    for r in trows[:20]:
        u = r[User]
        assert r[ISeen] == tuple(train[u]) + tuple(valid[u])
        assert r[IUnseen][0] in test[u]


def test_pool_sampling_cached_negatives(tiny_dataset):
    User, Item = _fields(tiny_dataset)
    IUnseen = Item.fork(UNSEEN)
    pipe = (
        tiny_dataset.valid()
        .ordered_user_ids_source()
        .valid_sampling_("pool")
        .set_seed(5)
    )
    rows_a = list(pipe)
    rows_b = list(pipe)
    train = tiny_dataset.train().user_seqs()
    valid = tiny_dataset.valid().user_seqs()
    for ra, rb in zip(rows_a, rows_b):
        assert len(ra[IUnseen]) == 101  # 1 pos + 100 negs (MF-BPR/main.py:108)
        assert ra[IUnseen] == rb[IUnseen]  # cached per (user, k)
        u = ra[User]
        known = set(train[u]) | set(valid[u])
        for neg in ra[IUnseen][1:]:
            assert neg not in known


def test_roll_seqs_source(tiny_dataset):
    User, Item = _fields(tiny_dataset)
    ISeq = Item.fork(SEQUENCE)
    rows = list(
        tiny_dataset.train()
        .shuffled_roll_seqs_source(minlen=2, maxlen=5)
        .set_seed(0)
    )
    seqs = tiny_dataset.train().user_seqs()
    expected = sum(max(0, len(s) - 1) for s in seqs if len(s) >= 2)
    expected += sum(1 for s in seqs if 0 < len(s) < 2)  # keep_at_least_itself
    assert len(rows) == expected
    assert all(1 <= len(r[ISeq]) <= 5 for r in rows)


def test_collate_ragged_kept():
    from recboard_tpu.data.fields import Field

    f = Field("X", (), count=None)
    out = collate([{f: (1, 2)}, {f: (1, 2, 3)}])
    assert isinstance(out[f], tuple)  # ragged stays ragged
    out2 = collate([{f: (1, 2)}, {f: (3, 4)}])
    assert isinstance(out2[f], np.ndarray) and out2[f].shape == (2, 2)
