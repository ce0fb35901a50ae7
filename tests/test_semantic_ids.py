"""Semantic-ID stack tests: quantizers, k-means, converter/trie,
seq2seq + constrained beam search, RQVAE + TIGER end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_models_smoke import _first_batch, _fit_loss


def test_sinkhorn_balances():
    from recboard_tpu.sem.quantizers import sinkhorn_assignment

    rng = np.random.default_rng(0)
    dist = jnp.asarray(rng.random((64, 8)), jnp.float32)
    Q = sinkhorn_assignment(dist, 0.05, 100)
    # columns sum to 1 per sample; prototypes get ~B/K mass
    np.testing.assert_allclose(np.asarray(Q.sum(1)), 1.0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(Q.sum(0)), 64 / 8, rtol=0.05)


def test_kmeans_and_sids():
    from recboard_tpu.sem.kmeans import kmeans, product_kmeans_sids, residual_kmeans_sids

    rng = np.random.default_rng(0)
    # 3 well-separated blobs
    x = np.concatenate(
        [rng.normal(loc=c, scale=0.1, size=(30, 4)) for c in (-5, 0, 5)]
    )
    centers, labels = kmeans(x, 3, iters=10, seed=0)
    assert len(set(labels[:30])) == 1 and len(set(labels[60:])) == 1
    centers, labels = kmeans(x, 3, iters=10, seed=0, size_min=25)
    assert np.bincount(labels, minlength=3).min() >= 25
    sids = residual_kmeans_sids(x, num_codebooks=2, num_codewords=4, iters=5)
    assert sids.shape == (90, 2)
    sids = product_kmeans_sids(x, num_codebooks=2, num_codewords=4, iters=5)
    assert sids.shape == (90, 2)


@pytest.mark.parametrize("strategy", ["ste", "gumbel", "rotation", "simvq", "product"])
def test_quantizers(strategy):
    from recboard_tpu.sem.quantizers import (
        ProductQuantizer,
        ResidualQuantizer,
        ResidualSimVQQuantizer,
    )

    D = 8
    if strategy == "simvq":
        q = ResidualSimVQQuantizer(codebook_dim=D, num_codebooks=2, num_codewords=8)
    elif strategy == "product":
        q = ProductQuantizer(codebook_dim=D, num_codebooks=2, num_codewords=8)
    else:
        q = ResidualQuantizer(
            codebook_dim=D, num_codebooks=2, num_codewords=8, estimator=strategy
        )
    dim_in = D * 2 if strategy == "product" else D
    z = jnp.asarray(np.random.default_rng(0).normal(size=(16, dim_in)), jnp.float32)
    variables = q.init({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, z)
    z_hat, loss, ids = q.apply(
        variables, z, rngs={"sampling": jax.random.PRNGKey(2)}
    )
    assert z_hat.shape == z.shape
    assert ids.shape == (16, 2)
    assert float(loss) >= 0
    # gradients flow to the input through the estimator
    g = jax.grad(
        lambda zz: q.apply(
            variables, zz, rngs={"sampling": jax.random.PRNGKey(2)}
        )[0].sum()
    )(z)
    assert float(jnp.abs(g).sum()) > 0
    # hard reconstruction: embed(get_indices(z)) == the quantized value
    # of the hard path (for non-gumbel, __call__'s value equals it too)
    hard_ids = q.apply(variables, z, method="get_indices")
    rec = q.apply(variables, hard_ids, method="embed")
    assert rec.shape == z.shape
    if strategy in ("ste", "rotation", "simvq", "product"):
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(z_hat), rtol=1e-5, atol=1e-5
        )


def test_converter_and_trie():
    from recboard_tpu.sem.converter import SemIDConverter

    codes = np.array([[0, 1], [0, 2], [1, 1], [0, 1]])  # items 0 & 3 collide
    conv = SemIDConverter.from_codes(codes)
    assert conv.collision_rate > 0
    # collision resolved with check tokens; round trips still work
    for i in range(4):
        text = conv.encode(conv.format(i))
        assert conv.decode(text) == [i]
    # trie: from root only <SID> is allowed
    assert conv.allowed_tokens([]) == (conv.start_id,)
    # after <SID>, only first-level sids present in vocab
    nxt = conv.allowed_tokens([conv.start_id])
    names = {t for t in nxt}
    assert conv.tokenizer.convert_tokens_to_ids("<sid_0_0>") in names
    assert conv.tokenizer.convert_tokens_to_ids("<sid_0_1>") in names
    assert conv.end_id not in names
    # dense tables are consistent: every item's token path is accepted
    for i in range(4):
        node = 0
        for t in conv.item_token_ids[i][: conv.item_token_lengths[i]]:
            assert conv.allowed[node, t]
            node = conv.next_node[node, t]
        assert conv.node_item[node] == i


def test_seq2seq_and_constrained_beam(tiny_dataset):
    from recboard_tpu.models.zoo import TIGER
    from recboard_tpu.sem.converter import SemIDConverter

    I = tiny_dataset.fields["ITEM", "ID"].count
    rng = np.random.default_rng(0)
    codes = np.stack(
        [rng.integers(0, 6, size=I), rng.integers(0, 6, size=I)], axis=1
    )
    conv = SemIDConverter.from_codes(codes)
    model = TIGER(
        tiny_dataset, converter=conv, maxlen=6, num_beams=4, embedding_dim=32,
        num_heads=2, num_encoder_layers=1, num_decoder_layers=1, ffn_dim=64,
        dropout_rate=0.0,
    )
    batch = _first_batch(model.sure_trainpipe(6, 8))
    losses, params = _fit_loss(model, batch, steps=20, lr=0.01)
    assert losses[-1] < losses[0]

    eval_batch = _first_batch(model.sure_validpipe(6, "full", batch_size=4))
    scores = model.apply(
        {"params": params}, eval_batch, None, method="recommend_from_full"
    )
    assert scores.shape == (4, I)
    # beam hits are raised above the background noise
    assert float(jnp.max(scores)) >= 1.0
    # every row has at least num_beams-ish raised entries ≤ num_beams
    raised = (np.asarray(scores) >= 1.0).sum(axis=1)
    assert (raised >= 1).all() and (raised <= model.num_beams).all()

    pool = model.apply(
        {"params": params},
        {model.ISeq: eval_batch[model.ISeq],
         model.IUnseen: jnp.arange(5)[None].repeat(4, 0)},
        None,
        method="recommend_from_pool",
    )
    assert pool.shape == (4, 5)


def test_rqvae_product_strategy_fit_and_codes(tiny_dataset):
    """PQ-VAE (quantization_strategy='product'): the encoder latent must
    be num_codebooks*codebook_dim (reference TIGER/train_pqvae.py:77) —
    a plain codebook_dim latent cannot be split into per-codebook blocks
    (regression: the reshape inside ProductQuantizer raised at fit)."""
    import jax

    from recboard_tpu.models.zoo import RQVAE

    I = tiny_dataset.fields["ITEM", "ID"].count
    feats = np.random.default_rng(0).normal(size=(I, 16)).astype(np.float32)
    model = RQVAE(
        tiny_dataset, item_features=feats, hidden_dims=(32,), codebook_dim=8,
        num_codebooks=2, num_codewords=8,
        quantization_strategy="product", apply_kmeans_init=True,
    )
    batch = {model.Item: jnp.arange(16, dtype=jnp.int32)}
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, method="fit",
    )
    loss, logs = model.apply(
        v, batch, method="fit", rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert np.isfinite(float(loss))
    params = model.post_init_params(v["params"])  # product k-means init
    codes = np.asarray(
        model.apply({"params": params}, jnp.arange(I), method="codes_of")
    )
    assert codes.shape == (I, 2)
    assert codes.min() >= 0 and codes.max() < 8
    # each codebook quantizes its own latent block; after k-means init on
    # 40+ items all 8 codewords of level 0 should be reachable
    assert len(np.unique(codes[:, 0])) > 1


def test_rqvae_trains_and_emits_vocab(tiny_dataset, tmp_path):
    import os

    from recboard_tpu.models.zoo import RQVAE, RQVAECoach
    from recboard_tpu.parser import Parser

    I = tiny_dataset.fields["ITEM", "ID"].count
    feats = np.random.default_rng(0).normal(size=(I, 16)).astype(np.float32)
    p = Parser()
    p.set_defaults(
        description="RQVAE", root="unused", epochs=3, batch_size=32, lr=1e-3,
        eval_freq=1, log2file=False, log2console=False,
        log_path=str(tmp_path / "logs"), checkpoint_path=str(tmp_path / "infos"),
        monitors=["LOSS"], which4best="PPL", dataset="tiny",
    )
    cfg = p.compile([])
    model = RQVAE(
        tiny_dataset, item_features=feats, hidden_dims=(32,), codebook_dim=8,
        num_codebooks=2, num_codewords=8,
    )
    coach = RQVAECoach(
        dataset=tiny_dataset,
        trainpipe=model.sure_trainpipe(32),
        validpipe=None,
        testpipe=None,
        model=model,
        cfg=cfg,
    )
    for epoch in range(3):
        coach.train(epoch)
    coach.evaluate(2, mode="valid")
    summary = coach._flush("valid", 2)
    assert 1.0 <= summary["PPL"] <= 8.0
    assert 0.0 <= summary["COLLISION_RATE"] <= 1.0
    vocab_file = coach.save_sid_vocab(str(tmp_path / "sid_vocab.json"))
    assert os.path.isfile(vocab_file)
    from recboard_tpu.sem.converter import SemIDConverter

    conv = SemIDConverter.load(vocab_file)
    assert len(conv.sid_vocab) == I


def test_textual_feature_encoder_hash_backend(tmp_path):
    import os

    import numpy as np

    from recboard_tpu.sem.encode import TextualFeatureEncoder, clean_text
    from recboard_tpu.utils import import_pickle

    # reference cleaning semantics (TIGER/encode_textual_features.py)
    assert clean_text('<b>Hello</b> "World"\n&amp; more') == "Hello World & more"
    assert clean_text(["a", "b"]) == "a b"
    assert clean_text(None) == ""

    dsdir = tmp_path / "Processed" / "T_000_LOU"
    os.makedirs(dsdir)
    with open(dsdir / "item.txt", "w") as fh:
        fh.write("ITEM\tTITLE\tCATEGORIES\tBRAND\n")
        fh.write("0\tRed lipstick\tBeauty Makeup\tAcme\n")
        fh.write("1\tRed lip stick\tBeauty Makeup\tAcme\n")
        fh.write("2\tTractor engine oil\tAutomotive\tZorg\n")
    out = TextualFeatureEncoder(
        str(tmp_path), "T_000_LOU", backend="hash", feature_dim=64
    ).run()
    feats = import_pickle(out)
    assert feats.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-5)
    # lexical similarity: near-duplicate items more similar than unrelated
    sim01 = float(feats[0] @ feats[1])
    sim02 = float(feats[0] @ feats[2])
    assert sim01 > sim02
    # determinism
    out2 = TextualFeatureEncoder(
        str(tmp_path), "T_000_LOU", backend="hash", feature_dim=64,
        output_file="again.pkl",
    ).run()
    np.testing.assert_array_equal(feats, import_pickle(out2))


def test_tiger_remat_matches_no_remat(tiny_dataset):
    """remat=True only changes the autodiff schedule, not values."""
    import jax
    import numpy as _np

    from recboard_tpu.data.tags import ID, ITEM
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.sem.converter import SemIDConverter

    Item = tiny_dataset.fields[ITEM, ID]
    codes = _np.random.default_rng(0).integers(0, 8, size=(Item.count, 3))
    conv = SemIDConverter.from_codes(codes)
    TIGER = REGISTRY["TIGER"]
    kw = dict(converter=conv, maxlen=6, num_beams=4, embedding_dim=32,
              num_heads=2, num_encoder_layers=1, num_decoder_layers=1,
              ffn_dim=64, dropout_rate=0.0)
    m0 = TIGER(tiny_dataset, **kw)
    m1 = TIGER(tiny_dataset, remat=True, **kw)
    rng = _np.random.default_rng(0)
    batch = {m0.ISeq: jnp.asarray(rng.integers(0, Item.count, (8, 6)), jnp.int32),
             m0.IPos: jnp.asarray(rng.integers(0, Item.count, (8, 1)), jnp.int32)}
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    p0 = m0.init(rngs, batch)["params"]
    l0, g0 = jax.value_and_grad(
        lambda p: m0.apply({"params": p}, batch, method="fit")[0])(p0)
    l1, g1 = jax.value_and_grad(
        lambda p: m1.apply({"params": p}, batch, method="fit")[0])(p0)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_rating_residual_quantizer():
    """R3-VAE RatingResidualQuantizer (R3-VAE/quantizer.py:66-158):
    decoupling removes the reference component, reconstruction is a sum
    of rating-scaled unit codewords, SC/PD losses are finite, and the
    whole thing is differentiable WITHOUT a straight-through estimator
    (codebook grads flow through the cosine rating)."""
    from recboard_tpu.sem.quantizers import RatingResidualQuantizer

    q = RatingResidualQuantizer(codebook_dim=8, num_codebooks=2, num_codewords=4)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)), jnp.float32)
    variables = q.init(jax.random.PRNGKey(0), z)
    z_hat, sc, pd, ids = q.apply(variables, z)
    assert z_hat.shape == (16, 8) and ids.shape == (16, 2)
    assert np.isfinite(float(sc)) and np.isfinite(float(pd))
    # ids consistent with get_indices
    ids2 = q.apply(variables, z, method="get_indices")
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))

    # differentiable through the rating: codebook grads are nonzero
    def loss(params):
        zh, sc_, pd_, _ = q.apply({"params": params}, z)
        return jnp.sum(jnp.square(zh)) + sc_ + pd_

    grads = jax.grad(loss)(variables["params"])
    g0 = np.asarray(grads["codebook_0"])
    assert np.abs(g0).max() > 0


def test_r3vae_tokenizer_trains(tiny_dataset, tmp_path):
    """R3-VAE end-to-end under RQVAECoach: k-means codebook init fires
    (post_init_params), loss falls, codes are near-unique."""
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.models.zoo.tiger import RQVAECoach
    from recboard_tpu.parser import Parser

    I = tiny_dataset.fields["ITEM", "ID"].count
    feats = np.random.default_rng(0).normal(size=(I, 16)).astype(np.float32)
    model = REGISTRY["R3-VAE"](tiny_dataset, item_features=feats,
                               num_codebooks=3, num_codewords=8)
    assert getattr(type(model), "COACH", None) is RQVAECoach
    p = Parser()
    p.set_defaults(description="R3-VAE", root="x", dataset="tiny", epochs=4,
                   batch_size=32, lr=5e-3, optimizer="adamw", eval_freq=10,
                   log2file=False, log2console=False,
                   log_path=str(tmp_path / "l"),
                   checkpoint_path=str(tmp_path / "i"),
                   monitors=["LOSS"], which4best="LOSS", seed=0)
    cfg = p.compile([])
    coach = RQVAECoach(dataset=tiny_dataset, trainpipe=model.sure_trainpipe(32),
                       validpipe=None, testpipe=None, model=model, cfg=cfg)
    for e in range(4):
        coach.train(e)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    # k-means init actually replaced the U(-1/(l+1)) init: codebook rows
    # should live near the data's residual scale, not the uniform cube
    cb0 = np.asarray(coach.state.params["quantizer"]["codebook_0"])
    assert cb0.std() > 0
    codes = np.asarray(
        model.apply({"params": coach.state.params}, jnp.arange(I),
                    method="codes_of")
    )
    assert codes.shape == (I, 3)
    assert len({tuple(r) for r in codes.tolist()}) > I // 2
    vocab = coach.save_sid_vocab(str(tmp_path / "sid_vocab.json"))
    import os
    assert os.path.exists(vocab)


def test_letter_tokenizer_diversity_and_kmeans(tiny_dataset, tmp_path):
    """LETTER tokenizer: k-means init + per-epoch diversity clusters
    (LETTER/quantizer.py) through LETTERCoach; loss falls and the
    diversity tables are well-formed."""
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.models.zoo.tiger import LETTERCoach
    from recboard_tpu.parser import Parser

    I = tiny_dataset.fields["ITEM", "ID"].count
    feats = np.random.default_rng(0).normal(size=(I, 16)).astype(np.float32)
    model = REGISTRY["LETTER"](
        tiny_dataset, item_features=feats, collab_features=feats,
        hidden_dims=(32, 16), codebook_dim=8, num_codebooks=3,
        num_codewords=8, num_diversity_clusters=3,
    )
    assert model.apply_kmeans_init and model.diversity_weight > 0
    assert getattr(type(model), "COACH", None) is LETTERCoach
    p = Parser()
    p.set_defaults(description="LETTER", root="x", dataset="tiny", epochs=4,
                   batch_size=32, lr=5e-3, optimizer="adamw", eval_freq=10,
                   log2file=False, log2console=False,
                   log_path=str(tmp_path / "l"),
                   checkpoint_path=str(tmp_path / "i"),
                   monitors=["LOSS"], which4best="LOSS", seed=0)
    cfg = p.compile([])
    coach = LETTERCoach(dataset=tiny_dataset, trainpipe=model.sure_trainpipe(32),
                        validpipe=None, testpipe=None, model=model, cfg=cfg)
    for e in range(4):
        coach.train(e)
    losses = [h["LOSS"] for h in coach.history["train"]]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    labels, members, sizes = coach._div_tables
    L, K = labels.shape
    assert (L, K) == (3, 8)
    assert sizes.sum(axis=-1).tolist() == [K] * L  # partition per level
    # every member row lists exactly the codewords with that label
    for l in range(L):
        for c in range(sizes.shape[1]):
            listed = set(members[l, c, : sizes[l, c]].tolist())
            expected = set(np.where(labels[l] == c)[0].tolist())
            assert listed == expected


def test_seq2seq_fused_attention_matches_jnp(monkeypatch):
    """The fused training-attention path inside Seq2SeqTransformer
    (structured masks + learned T5 bias through
    ops/attention.mha_dropout_pallas) equals the jnp path at dropout 0
    on valid positions."""
    import os

    from recboard_tpu.sem.seq2seq import Seq2SeqTransformer

    model = Seq2SeqTransformer(
        vocab_size=30, dim=16, num_heads=2, num_encoder_layers=1,
        num_decoder_layers=1, ffn_dim=32, dropout=0.0, pad_id=0, head_dim=8,
    )
    rng = np.random.default_rng(0)
    enc_ids = jnp.asarray(rng.integers(1, 30, (4, 9)), jnp.int32)
    enc_ids = enc_ids.at[:, 7:].set(0)  # trailing pads
    dec_ids = jnp.asarray(rng.integers(1, 30, (4, 5)), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        enc_ids, dec_ids,
    )
    ref = model.apply(variables, enc_ids, dec_ids, False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    monkeypatch.setenv("RECBOARD_FUSED_ATTN_INTERPRET", "1")
    fused = model.apply(variables, enc_ids, dec_ids, False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                               atol=2e-4, rtol=2e-4)
