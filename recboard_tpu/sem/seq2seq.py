"""T5-style encoder-decoder + trie-constrained beam search.

Replaces the reference's HF `T5ForConditionalGeneration` + Python
`prefix_allowed_tokens_fn` host callback (TIGER/train_t5.py:187-210,
TIGER/converter.py:498-530) with a compact flax implementation shaped
like T5: RMSNorm pre-normalization, bucketed relative position biases
(bidirectional encoder / causal decoder), ReLU FFN, tied output head.

Beam search runs fully under jit: SID sequences are ≤ L+2 tokens, so
each step re-runs the tiny decoder self-attention (no incremental KV
cache at these lengths), BUT the cross-attention memory K/V are
projected ONCE per query (`precompute_cross_kv` + `decode_beams`) —
the uncached loop re-projected a num_beams×-duplicated encoder state
every step of every layer, which profiled as 82% of serving time at
the reference Beauty config (tools/tiger_ablate.py). The trie's dense
`allowed`/`next_node` tables mask and advance beams — no host
roundtrips (SURVEY.md §7 hard part #6).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["Seq2SeqTransformer", "beam_search", "beam_search_cached"]

NEG_INF = -1e9


def _rel_bucket(rel: jnp.ndarray, bidirectional: bool, num_buckets: int, max_dist: int):
    """T5 relative position bucketization."""
    ret = 0
    n = -rel
    if bidirectional:
        num_buckets //= 2
        ret = (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(n.astype(jnp.float32), 1.0) / max_exact)
        / jnp.log(max_dist / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class RelativePositionBias(nn.Module):
    num_heads: int
    bidirectional: bool = True
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, qlen: int, klen: int) -> jnp.ndarray:
        ctx = jnp.arange(qlen)[:, None]
        mem = jnp.arange(klen)[None, :]
        buckets = _rel_bucket(
            mem - ctx, self.bidirectional, self.num_buckets, self.max_distance
        )
        table = self.param(
            "rel_embedding",
            nn.initializers.normal(stddev=0.02),
            (self.num_buckets, self.num_heads),
        )
        return table[buckets].transpose(2, 0, 1)[None]  # (1, H, Q, K)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(var + self.eps) * scale


class MultiHeadAttn(nn.Module):
    dim: int
    num_heads: int
    dropout: float = 0.1
    head_dim: Optional[int] = None  # T5 d_kv: decoupled from dim//H

    def setup(self):
        H = self.num_heads
        # T5 keeps d_kv fixed (64) regardless of num_heads; dim//H would
        # give lane-hostile 21-wide heads at d_model=128, H=6
        # (TIGER/train_t5.py:21, ETEGRec/train_etegrec.py:41)
        hd = self.head_dim or self.dim // H
        init = nn.initializers.normal(stddev=self.dim**-0.5)
        # setup-based (not @nn.compact) so the serving path can run the
        # projections independently (memory_kv/attend_cached below);
        # attribute names keep the q/k/v/o param paths stable
        self.q = nn.DenseGeneral((H, hd), use_bias=False, kernel_init=init)
        self.k = nn.DenseGeneral((H, hd), use_bias=False, kernel_init=init)
        self.v = nn.DenseGeneral((H, hd), use_bias=False, kernel_init=init)
        self.o = nn.DenseGeneral(
            self.dim, axis=(-2, -1), use_bias=False, kernel_init=init
        )
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, q_in, kv_in, mask, bias=None, deterministic=True,
                 causal=False, key_padding=None):
        """``mask`` is the legacy dense boolean (True = keep) used by the
        jnp path; when the structured form is supplied instead
        (``causal`` + ``key_padding`` (B, S) True = VALID), training on
        TPU routes through the fused Pallas kernel
        (ops/attention.mha_dropout_pallas): SID protocols run L≈300
        tokens, so the per-layer (B, H, 300, 300) score/prob/mask
        tensors are the training bottleneck — the kernel keeps them in
        VMEM and regenerates the dropout mask in the backward, with the
        learned T5 bias getting exact in-kernel dbias accumulation."""
        import os

        H = self.num_heads
        hd = self.head_dim or self.dim // H
        q = self.q(q_in)
        k = self.k(kv_in)
        v = self.v(kv_in)

        structured = mask is None  # callers pass causal/key_padding instead
        interpret = bool(os.environ.get("RECBOARD_FUSED_ATTN_INTERPRET"))
        use_fused = (
            structured
            and not deterministic
            and not os.environ.get("RECBOARD_DISABLE_FUSED_ATTN")  # A/B probe
            and (jax.default_backend() == "tpu" or interpret)
        )
        if use_fused:
            from ..ops.attention import mha_dropout_pallas

            B, L = q.shape[0], q.shape[1]
            S = k.shape[1]
            rng = (
                self.make_rng("dropout")
                if self.dropout > 0.0
                else jax.random.PRNGKey(0)
            )
            kpm = None if key_padding is None else ~key_padding  # True=masked
            out = mha_dropout_pallas(
                q.reshape(B, L, H * hd),
                k.reshape(B, S, H * hd),
                v.reshape(B, S, H * hd),
                H, causal, kpm,
                None if bias is None else bias,
                1.0,  # T5 does not scale by sqrt(hd)
                self.dropout, rng, interpret=interpret,
            ).reshape(B, L, H, hd)
            return self.o(out)

        if structured:
            # build the dense mask the jnp path expects
            Lq, Sk = q.shape[1], k.shape[1]
            m = None
            if causal:
                m = jnp.tril(jnp.ones((Lq, Sk), dtype=bool), k=Sk - Lq)[None, None]
            if key_padding is not None:
                kp = key_padding[:, None, None, :]
                m = kp if m is None else m & kp
            mask = m
        # T5 does not scale by sqrt(hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        if bias is not None:
            scores = scores + bias
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = self.drop(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return self.o(out)

    # ------------------------------------------------- serving (cached)
    def memory_kv(self, kv_in):
        """Project the attention memory ONCE per query (no beam
        broadcast) — the beam loop re-ran k/v over a K×-duplicated
        encoder state at every decode step (num_beams × max_steps ×
        num_layers redundant MXU work, the dominant serving cost)."""
        return self.k(kv_in), self.v(kv_in)

    def attend_cached(self, q_in, kmem, vmem, key_padding=None):
        """Cross-attention against precomputed memory K/V, with the
        beam dimension folded into the query axis: q_in (B*F, T, D)
        attends kmem/vmem (B, S, H, hd) → (B*F, T, dim). Deterministic
        (serving only). Identical arithmetic to __call__'s jnp path."""
        B, S = kmem.shape[0], kmem.shape[1]
        BF, T = q_in.shape[0], q_in.shape[1]
        F = BF // B
        q = self.q(q_in).reshape(B, F * T, kmem.shape[2], kmem.shape[3])
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, kmem, preferred_element_type=jnp.float32
        )
        if key_padding is not None:
            scores = jnp.where(key_padding[:, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vmem)
        return self.o(out.reshape(BF, T, out.shape[2], out.shape[3]))


class FFN(nn.Module):
    dim: int
    hidden: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        init = nn.initializers.normal(stddev=self.dim**-0.5)
        h = nn.Dense(self.hidden, use_bias=False, kernel_init=init)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.dim, use_bias=False, kernel_init=init)(h)


class EncoderBlock(nn.Module):
    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    head_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, key_padding, bias, deterministic=True):
        n = RMSNorm()(x)  # ONE pre-norm shared by q and kv, as in T5
        h = MultiHeadAttn(self.dim, self.num_heads, self.dropout, self.head_dim)(
            n, n, None, bias, deterministic,
            causal=False, key_padding=key_padding,
        )
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = FFN(self.dim, self.ffn_dim, self.dropout)(
            RMSNorm()(x), deterministic=deterministic
        )
        return x + nn.Dropout(self.dropout)(h, deterministic=deterministic)


class DecoderBlock(nn.Module):
    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    head_dim: Optional[int] = None

    def setup(self):
        # setup-based (see MultiHeadAttn) with attribute names chosen to
        # match the previous @nn.compact auto-naming exactly, so
        # checkpoints and the torch-transplant crosschecks stay valid
        self.RMSNorm_0 = RMSNorm()
        self.self_attn = MultiHeadAttn(
            self.dim, self.num_heads, self.dropout, self.head_dim
        )
        self.RMSNorm_1 = RMSNorm()
        self.cross_attn = MultiHeadAttn(
            self.dim, self.num_heads, self.dropout, self.head_dim
        )
        self.RMSNorm_2 = RMSNorm()
        self.FFN_0 = FFN(self.dim, self.ffn_dim, self.dropout)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, enc, enc_valid, bias, deterministic=True):
        n = self.RMSNorm_0(x)  # ONE pre-norm shared by q and kv, as in T5
        h = self.self_attn(n, n, None, bias, deterministic, causal=True)
        x = x + self.drop(h, deterministic=deterministic)
        # T5 cross-attention normalizes the decoder stream only; the
        # encoder output arrives already final-layer-normed
        h = self.cross_attn(
            self.RMSNorm_1(x), enc, None, None, deterministic,
            causal=False, key_padding=enc_valid,
        )
        x = x + self.drop(h, deterministic=deterministic)
        h = self.FFN_0(self.RMSNorm_2(x), deterministic=deterministic)
        return x + self.drop(h, deterministic=deterministic)

    def step_beams(self, x, kmem, vmem, enc_valid, bias):
        """Serving step on beam-folded activations: x (B*K, T, D) with
        cross-attention against the per-query cached memory K/V."""
        n = self.RMSNorm_0(x)
        x = x + self.self_attn(n, n, None, bias, True, causal=True)
        x = x + self.cross_attn.attend_cached(
            self.RMSNorm_1(x), kmem, vmem, enc_valid
        )
        return x + self.FFN_0(self.RMSNorm_2(x), deterministic=True)


class Seq2SeqTransformer(nn.Module):
    """T5-shaped encoder-decoder over a token vocabulary."""

    vocab_size: int
    dim: int = 128
    num_heads: int = 4
    num_encoder_layers: int = 4
    num_decoder_layers: int = 4
    ffn_dim: int = 512
    dropout: float = 0.1
    pad_id: int = 0
    head_dim: Optional[int] = 64  # T5 d_kv default
    remat: bool = False  # rematerialize blocks in bwd: SID protocols run
    # ~6 tokens/item (L=300 at maxlen 50), so stored attention scores are
    # (B, H, 300, 300) per layer — 2.7 GB at B=1024; remat trades ~1.3x
    # compute for fitting large batches in HBM

    def setup(self):
        self.shared = nn.Embed(
            self.vocab_size, self.dim,
            embedding_init=nn.initializers.normal(stddev=1.0),
        )
        self.enc_bias = RelativePositionBias(
            self.num_heads, bidirectional=True, name="enc_bias"
        )
        self.dec_bias = RelativePositionBias(
            self.num_heads, bidirectional=False, name="dec_bias"
        )
        # deterministic must stay a Python bool under remat (args[0] is
        # the module itself in flax's transformed call signature)
        Enc = (
            nn.remat(EncoderBlock, static_argnums=(4,))
            if self.remat
            else EncoderBlock
        )
        Dec = (
            nn.remat(DecoderBlock, static_argnums=(5,))
            if self.remat
            else DecoderBlock
        )
        self.encoder_blocks = [
            Enc(self.dim, self.num_heads, self.ffn_dim, self.dropout,
                self.head_dim)
            for _ in range(self.num_encoder_layers)
        ]
        self.decoder_blocks = [
            Dec(self.dim, self.num_heads, self.ffn_dim, self.dropout,
                self.head_dim)
            for _ in range(self.num_decoder_layers)
        ]
        self.enc_final_ln = RMSNorm()
        self.dec_final_ln = RMSNorm()

    def encode(self, input_ids: jnp.ndarray, deterministic: bool = True):
        mask = input_ids != self.pad_id  # (B, L) True = valid
        x = self.shared(input_ids)
        bias = self.enc_bias(input_ids.shape[1], input_ids.shape[1])
        for block in self.encoder_blocks:
            x = block(x, mask, bias, deterministic)
        return self.enc_final_ln(x), mask

    def decode(
        self,
        decoder_ids: jnp.ndarray,
        enc_out: jnp.ndarray,
        enc_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        Bq = decoder_ids.shape[1]
        x = self.shared(decoder_ids)
        bias = self.dec_bias(Bq, Bq)
        for block in self.decoder_blocks:
            x = block(x, enc_out, enc_mask, bias, deterministic)
        x = self.dec_final_ln(x)
        # tied head, T5-style rescale
        logits = jnp.einsum(
            "bld,vd->blv", x * (self.dim**-0.5), self.shared.embedding,
            preferred_element_type=jnp.float32,
        )
        return logits

    def __call__(self, input_ids, decoder_ids, deterministic: bool = True):
        enc_out, enc_mask = self.encode(input_ids, deterministic)
        return self.decode(decoder_ids, enc_out, enc_mask, deterministic)

    # ---------------------------------------------- serving (cached kv)
    def precompute_cross_kv(self, enc_out):
        """Per-decoder-layer cross-attention (K, V) of the encoder
        memory, computed ONCE per query — see MultiHeadAttn.memory_kv.
        Unavailable under remat (the wrapped blocks hide their
        submodules); serving callers fall back to the uncached path."""
        if self.remat:
            raise ValueError("precompute_cross_kv: not under remat")
        return [blk.cross_attn.memory_kv(enc_out)
                for blk in self.decoder_blocks]

    def decode_beams(self, decoder_ids, cross_kv, enc_mask,
                     return_hidden: bool = False):
        """Deterministic decode on beam-folded ids (B*K, T) against the
        cached memory; same arithmetic as decode() minus the per-step
        re-projection of the K×-duplicated encoder state.
        ``return_hidden`` skips the tied head (joint models — ETEGRec —
        project through their own token head)."""
        T = decoder_ids.shape[1]
        x = self.shared(decoder_ids)
        bias = self.dec_bias(T, T)
        for blk, (kmem, vmem) in zip(self.decoder_blocks, cross_kv):
            x = blk.step_beams(x, kmem, vmem, enc_mask, bias)
        x = self.dec_final_ln(x)
        if return_hidden:
            return x
        return jnp.einsum(
            "bld,vd->blv", x * (self.dim**-0.5), self.shared.embedding,
            preferred_element_type=jnp.float32,
        )


def beam_search(
    apply_decode,
    enc_out: jnp.ndarray,
    enc_mask: jnp.ndarray,
    allowed: jnp.ndarray,  # (num_nodes, V) bool
    next_node: jnp.ndarray,  # (num_nodes, V) int32
    node_item: jnp.ndarray,  # (num_nodes,) int32
    num_beams: int,
    max_steps: int,
    start_id: int,
    pad_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trie-constrained beam search; returns (items (B, K), scores (B, K)).

    apply_decode(decoder_ids (B*, T)) → logits (B*, T, V) given the
    pre-broadcast encoder state.
    """
    enc_out_b = jnp.repeat(enc_out, num_beams, axis=0)  # (B*K, Le, D)
    enc_mask_b = jnp.repeat(enc_mask, num_beams, axis=0)
    return beam_search_cached(
        lambda dec_in: apply_decode(dec_in, enc_out_b, enc_mask_b),
        enc_out.shape[0], allowed, next_node, node_item,
        num_beams, max_steps, start_id, pad_id,
    )


def beam_search_cached(
    decode_fn,
    batch_size: int,
    allowed: jnp.ndarray,  # (num_nodes, V) bool
    next_node: jnp.ndarray,  # (num_nodes, V) int32
    node_item: jnp.ndarray,  # (num_nodes,) int32
    num_beams: int,
    max_steps: int,
    start_id: int,
    pad_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam-search core over an abstract ``decode_fn(dec_in (B*K, T)) →
    logits (B*K, T, V)`` — the memory representation (broadcast encoder
    state, or the cached per-layer cross K/V from
    ``Seq2SeqTransformer.decode_beams``) is closed over by the caller."""
    B = batch_size
    V = allowed.shape[1]
    K = num_beams

    tokens = jnp.full((B, K, max_steps + 1), pad_id, dtype=jnp.int32)
    # decoder starts from PAD (T5 decoder_start_token) — position 0
    scores = jnp.full((B, K), NEG_INF)
    scores = scores.at[:, 0].set(0.0)  # only beam 0 live at t=0
    nodes = jnp.zeros((B, K), dtype=jnp.int32)  # trie root

    def step(t, state):
        tokens, scores, nodes = state
        dec_in = tokens.reshape(B * K, max_steps + 1)
        logits = decode_fn(dec_in)  # (B*K, T, V)
        logits = logits[:, t, :].reshape(B, K, V)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ok = allowed[nodes]  # (B, K, V)
        terminal = node_item[nodes] >= 0  # (B, K)
        # terminal beams: force PAD with 0 logprob (score frozen)
        pad_onehot = jnp.zeros((V,), bool).at[pad_id].set(True)
        ok = jnp.where(terminal[..., None], pad_onehot[None, None], ok)
        logp = jnp.where(ok, logp, NEG_INF)
        logp = jnp.where(
            terminal[..., None] & pad_onehot[None, None], 0.0, logp
        )
        cand = scores[..., None] + logp  # (B, K, V)
        flat = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)
        beam_idx = top_idx // V
        tok_idx = top_idx % V
        new_tokens = jnp.take_along_axis(
            tokens, beam_idx[..., None], axis=1
        )
        new_tokens = new_tokens.at[:, :, t + 1].set(tok_idx)
        new_nodes = next_node[
            jnp.take_along_axis(nodes, beam_idx, axis=1), tok_idx
        ]
        return new_tokens, top_scores, new_nodes

    tokens, scores, nodes = jax.lax.fori_loop(
        0, max_steps, step, (tokens, scores, nodes)
    )
    items = node_item[nodes]  # (B, K); -1 for dead beams
    return items, scores
