"""Seq2SeqTransformer crosscheck vs Hugging Face torch T5.

The generative family (TIGER/LETTER/ETEGRec/R3-VAE/DIGER — 7 baseline
rows) rides sem/seq2seq.py, which replaces the reference's
``T5ForConditionalGeneration`` (TIGER/train_t5.py:187-210). This test
transplants our flax params into a real HF torch T5 with the matching
tiny config and pins the full seq2seq logits: relative-position
bucketization (bidirectional encoder / causal decoder), layer-0 bias
shared across layers, unscaled attention, RMSNorm placement (ONE
pre-norm shared by q/kv; cross-attention consumes the encoder output
raw), ReLU FFN, and the tied-head d_model**-0.5 rescale.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VOCAB, D, DKV, H, DFF, LAYERS = 50, 16, 4, 2, 32, 2


def _hf_from_flax(params):
    from transformers import T5Config, T5ForConditionalGeneration

    cfg = T5Config(
        vocab_size=VOCAB, d_model=D, d_kv=DKV, num_heads=H, d_ff=DFF,
        num_layers=LAYERS, num_decoder_layers=LAYERS, dropout_rate=0.0,
        feed_forward_proj="relu", relative_attention_num_buckets=32,
        relative_attention_max_distance=128, tie_word_embeddings=True,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    m = T5ForConditionalGeneration(cfg).double().eval()
    t = lambda a: torch.as_tensor(np.asarray(a).copy(), dtype=torch.float64)

    sd = {"shared.weight": t(params["shared"]["embedding"])}

    def attn(dst, src):
        for k in ("q", "k", "v"):
            w = np.asarray(src[k]["kernel"])  # (D, H, hd)
            sd[f"{dst}.{k}.weight"] = t(w.reshape(D, H * DKV)).T
        o = np.asarray(src["o"]["kernel"])  # (H, hd, D)
        sd[f"{dst}.o.weight"] = t(o.reshape(H * DKV, D)).T

    for i in range(LAYERS):
        blk = params[f"encoder_blocks_{i}"]
        base = f"encoder.block.{i}"
        attn(f"{base}.layer.0.SelfAttention", blk["MultiHeadAttn_0"])
        sd[f"{base}.layer.0.layer_norm.weight"] = t(blk["RMSNorm_0"]["scale"])
        sd[f"{base}.layer.1.DenseReluDense.wi.weight"] = t(
            blk["FFN_0"]["Dense_0"]["kernel"]).T
        sd[f"{base}.layer.1.DenseReluDense.wo.weight"] = t(
            blk["FFN_0"]["Dense_1"]["kernel"]).T
        sd[f"{base}.layer.1.layer_norm.weight"] = t(blk["RMSNorm_1"]["scale"])

        blk = params[f"decoder_blocks_{i}"]
        base = f"decoder.block.{i}"
        attn(f"{base}.layer.0.SelfAttention", blk["self_attn"])
        sd[f"{base}.layer.0.layer_norm.weight"] = t(blk["RMSNorm_0"]["scale"])
        attn(f"{base}.layer.1.EncDecAttention", blk["cross_attn"])
        sd[f"{base}.layer.1.layer_norm.weight"] = t(blk["RMSNorm_1"]["scale"])
        sd[f"{base}.layer.2.DenseReluDense.wi.weight"] = t(
            blk["FFN_0"]["Dense_0"]["kernel"]).T
        sd[f"{base}.layer.2.DenseReluDense.wo.weight"] = t(
            blk["FFN_0"]["Dense_1"]["kernel"]).T
        sd[f"{base}.layer.2.layer_norm.weight"] = t(blk["RMSNorm_2"]["scale"])

    sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"] = t(
        params["enc_bias"]["rel_embedding"])
    sd["decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"] = t(
        params["dec_bias"]["rel_embedding"])
    sd["encoder.final_layer_norm.weight"] = t(params["enc_final_ln"]["scale"])
    sd["decoder.final_layer_norm.weight"] = t(params["dec_final_ln"]["scale"])

    missing, unexpected = m.load_state_dict(sd, strict=False)
    # tied copies (encoder/decoder embed_tokens, lm_head) resolve from shared
    assert not unexpected, unexpected
    assert all("embed_tokens" in n or "lm_head" in n for n in missing), missing
    m.tie_weights()
    return m


def test_t5_torch_transplant():
    import jax
    import jax.numpy as jnp

    from recboard_tpu.sem.seq2seq import Seq2SeqTransformer

    model = Seq2SeqTransformer(
        vocab_size=VOCAB, dim=D, num_heads=H, num_encoder_layers=LAYERS,
        num_decoder_layers=LAYERS, ffn_dim=DFF, dropout=0.0, pad_id=0,
        head_dim=DKV,
    )
    rng = np.random.default_rng(0)
    enc_ids = rng.integers(2, VOCAB, (4, 9))
    enc_ids[:, 7:] = 0  # right padding on some rows
    enc_ids[0, 5:] = 0
    dec_ids = rng.integers(2, VOCAB, (4, 6))
    enc_ids_j = jnp.asarray(enc_ids, jnp.int32)
    dec_ids_j = jnp.asarray(dec_ids, jnp.int32)

    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        enc_ids_j, dec_ids_j,
    )["params"]
    jax_logits = model.apply({"params": params}, enc_ids_j, dec_ids_j)

    hf = _hf_from_flax(jax.tree.map(np.asarray, params))
    with torch.no_grad():
        out = hf(
            input_ids=torch.as_tensor(enc_ids),
            attention_mask=torch.as_tensor((enc_ids != 0).astype(np.int64)),
            decoder_input_ids=torch.as_tensor(dec_ids),
        )
    th_logits = out.logits.numpy()

    np.testing.assert_allclose(
        np.asarray(jax_logits), th_logits, atol=3e-5, rtol=1e-4
    )
