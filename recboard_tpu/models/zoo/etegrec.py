"""ETEGRec: end-to-end joint tokenizer + generative recommender.

Reference: ETEGRec/train_etegrec.py:107-652 + ETEGRec/modules.py —
components: (a) tokenizer (RQ-VAE over a learnable semantic item table,
emitting reconstructions + per-level code logits), (b) a T5 generator
over code tokens whose labels are the target item's code (+ a conflict
check digit, code_length = num_codebooks + 1); losses: token CE
("code_loss"), symmetric KL between the sequence latent's code logits
and the target item's code logits ("kl_loss"), symmetric InfoNCE
between decoder latents and tokenizer reconstructions ("dec_cl_loss"),
plus the VQ recon loss in the tokenizer phase; alternating id/rec
optimization cycles with item codes refreshed per cycle
(refresh_item_codes, :225-264).

TPU mapping: codes → flat token ids (level offsets) feed the shared
sem/seq2seq T5; generation reuses the jitted trie-constrained beam
search over the refreshed codes; the alternating-phase trainable-set
switch is an optimizer-mask concern (ETEGRecCoach labels params).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import criterions
from ...launcher import Coach
from ...sem.quantizers import ResidualQuantizer
from ...sem.seq2seq import Seq2SeqTransformer, beam_search, beam_search_cached
from ..base import Batch, SeqRecArch
from ..modules import xavier_normal
from . import register


def codes_with_check_digit(
    codes: np.ndarray, max_rank: Optional[int] = None
) -> np.ndarray:
    """Append a per-collision-group rank digit (refresh_item_codes,
    ETEGRec/train_etegrec.py:235-247). The reference raises when a
    conflict group exceeds the codebook size; we clamp and warn so a
    collapsed early-training codebook doesn't kill the run."""
    groups: Dict[Tuple[int, ...], int] = {}
    out = np.zeros((codes.shape[0], codes.shape[1] + 1), dtype=np.int64)
    overflow = 0
    for i, row in enumerate(np.asarray(codes).tolist()):
        key = tuple(row)
        rank = groups.get(key, 0)
        groups[key] = rank + 1
        if max_rank is not None and rank >= max_rank:
            overflow += 1
            rank = max_rank - 1
        out[i] = row + [rank]
    if overflow:
        from ... import utils

        utils.warnLogger(
            f"[ETEGRec] >>> {overflow} items exceeded the check-digit space "
            f"(conflict > {max_rank}); codes are temporarily ambiguous"
        )
    return out


@register("ETEGRec")
class ETEGRec(SeqRecArch):
    NUM_PADS: int = 1
    PADDING_VALUE: int = 0

    item_features: Optional[np.ndarray] = None  # semantic features (N, F)
    maxlen: int = 20
    num_codebooks: int = 3
    num_codewords: int = 256
    codebook_dim: int = 128
    hidden_dims: Tuple[int, ...] = (512, 256)
    commit_weight: float = 0.25
    embedding_dim: int = 128
    num_heads: int = 4
    num_layers: int = 6
    num_decoder_layers: int = 6
    ffn_dim: int = 512  # T5 d_ff (ETEGRec/train_etegrec.py:42)
    head_dim: int = 64  # T5 d_kv (ETEGRec/train_etegrec.py:41)
    dropout_rate: float = 0.1
    remat: bool = False  # rematerialize seq2seq blocks (large-batch HBM)
    num_beams: int = 20
    temperature: float = 0.07
    quant_loss_weight: float = 1.0
    tokenizer_estimator: str = "ste"
    apply_shared_codebook: bool = False
    sk_epsilons: Optional[Tuple[float, ...]] = None
    sk_iters: int = 50
    # per-phase loss weights (train_etegrec.py:72-83 argparse defaults);
    # the id phase trains the tokenizer on vq (+ cross terms once
    # warmed), the rec phase trains the generator on code CE
    id_vq_loss: float = 1.0
    id_code_loss: float = 0.0
    id_kl_loss: float = 1e-4
    id_dec_cl_loss: float = 3e-4
    rec_vq_loss: float = 0.0
    rec_code_loss: float = 1.0
    rec_kl_loss: float = 1e-4
    rec_dec_cl_loss: float = 3e-4
    sim: str = "cos"  # dec_cl similarity: cos | dot (train_etegrec.py:83)
    kmeans_init: bool = False  # k-means codebook init (ETEGRec rqvae cfg)
    kmeans_iters: int = 100

    # token layout: 0 PAD, then level l code c → 1 + l*K + c; check digit
    # level gets its own block
    @property
    def code_length(self) -> int:
        return self.num_codebooks + 1

    @property
    def token_vocab(self) -> int:
        return 1 + self.code_length * self.num_codewords

    def _code_tokens(self, codes: jnp.ndarray) -> jnp.ndarray:
        """(.., code_length) codes → flat token ids."""
        offsets = 1 + jnp.arange(self.code_length) * self.num_codewords
        return codes + offsets

    def setup(self):
        feats = np.asarray(self.item_features, np.float32)
        feats = np.concatenate(
            [np.zeros((self.NUM_PADS, feats.shape[1]), np.float32), feats], axis=0
        )
        self.semantic_embedding = self.param(
            "semantic_embedding", lambda k, s: jnp.asarray(feats), feats.shape
        )
        dims = [feats.shape[1], *self.hidden_dims, self.codebook_dim]
        self.enc_layers = [
            nn.Dense(d, use_bias=False, kernel_init=xavier_normal) for d in dims[1:]
        ]
        self.dec_layers = [
            nn.Dense(d, use_bias=False, kernel_init=xavier_normal)
            for d in dims[::-1][1:]
        ]
        self.rq = ResidualQuantizer(
            codebook_dim=self.codebook_dim,
            num_codebooks=self.num_codebooks,
            num_codewords=self.num_codewords,
            commit_weight=self.commit_weight,
            estimator=self.tokenizer_estimator,
            apply_shared_codebook=self.apply_shared_codebook,
            sk_epsilons=self.sk_epsilons,
            sk_iters=self.sk_iters,
            gumbel_temperature=getattr(self, "gumbel_tau", 1.0),
        )
        self.seq2seq = Seq2SeqTransformer(
            vocab_size=self.token_vocab,
            dim=self.embedding_dim,
            num_heads=self.num_heads,
            num_encoder_layers=self.num_layers,
            num_decoder_layers=self.num_decoder_layers,
            ffn_dim=self.ffn_dim,
            head_dim=self.head_dim,
            dropout=self.dropout_rate,
            pad_id=0,
            remat=self.remat,
        )
        self.seq_project = nn.Dense(self.codebook_dim, kernel_init=xavier_normal)
        self.dec_project = nn.Dense(feats.shape[1], kernel_init=xavier_normal)

    # ----------------------------------------------------------- tokenizer
    def tok_encode(self, x):
        for i, layer in enumerate(self.enc_layers):
            x = layer(x)
            if i < len(self.enc_layers) - 1:
                x = nn.silu(x)
        return x

    def tok_decode(self, q):
        for i, layer in enumerate(self.dec_layers):
            q = layer(q)
            if i < len(self.dec_layers) - 1:
                q = nn.silu(q)
        return q

    def tokenizer_forward(self, feats):
        z = self.tok_encode(feats)
        z_hat, vq_loss, ids, logits = self.rq.quantize_with_logits(z)
        recon = self.tok_decode(z_hat)
        return recon, vq_loss, ids, logits

    def current_codes(self) -> jnp.ndarray:
        """Raw (N_items, L) codes of the semantic table (pre check digit)."""
        feats = self.semantic_embedding[self.NUM_PADS :]
        return self.rq.get_indices(self.tok_encode(feats))

    # ---------------------------------------------------------------- pipes
    def sure_trainpipe(self, maxlen: int, batch_size: int):
        return (
            self.dataset.train()
            .shuffled_seqs_source(maxlen=maxlen + 1)
            .seq_train_yielding_pos_(start_idx_for_target=-1, end_idx_for_input=-1)
            .add_(offset=self.NUM_PADS, modified_fields=(self.ISeq, self.IPos))
            .rpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def sure_validpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 256):
        return (
            self.dataset.valid()
            .ordered_user_ids_source()
            .valid_sampling_(ranking)
            .lprune_(maxlen, modified_fields=(self.ISeq,))
            .add_(self.NUM_PADS, modified_fields=(self.ISeq,))
            .rpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def sure_testpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 256):
        return (
            self.dataset.test()
            .ordered_user_ids_source()
            .test_sampling_(ranking)
            .lprune_(maxlen, modified_fields=(self.ISeq,))
            .add_(self.NUM_PADS, modified_fields=(self.ISeq,))
            .rpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    # ------------------------------------------------------------ training
    def post_init_params(self, params):
        """Optional k-means codebook init on the (frozen-at-init)
        semantic table's encoded latents (ETEGRec/configs/rqvae kmeans_init)."""
        if not self.kmeans_init:
            return params
        from ...sem.kmeans import kmeans

        feats = np.asarray(self.item_features, np.float64)
        z_in = np.concatenate(
            [np.zeros((self.NUM_PADS, feats.shape[1])), feats], axis=0
        )[self.NUM_PADS:]
        z = np.asarray(
            self.apply(
                {"params": params}, jnp.asarray(z_in, jnp.float32),
                method="tok_encode",
            ),
            np.float64,
        )
        K = self.num_codewords
        rq = dict(params["rq"])
        r = z
        for l in range(self.num_codebooks):
            centers, labels = kmeans(
                r, min(K, len(r)), iters=min(self.kmeans_iters, 50), seed=l
            )
            rq[f"codebook_{l}"] = jnp.asarray(centers, jnp.float32)
            r = r - centers[labels]
        new = dict(params)
        new["rq"] = rq
        return new

    def fit(self, data: Batch, train_id: bool = False, warmed: bool = True):
        """`all_item_code` (N+1, code_length) is threaded by the Coach as
        a batch entry ('item_code'); -1 marks the PAD item row. The
        (train_id, warmed) flags select the reference's per-phase loss
        weights (train_per_epoch, train_etegrec.py:491-516): id phase =
        tokenizer vq (+ warmed cross terms), rec phase = code CE (+
        warmed cross terms)."""
        item_code = data["item_code"]  # (N+1, Lc)
        seqs = data[self.ISeq]
        B = seqs.shape[0]
        Lc = self.code_length

        input_codes = item_code[seqs]  # (B, S, Lc)
        input_tokens = self._code_tokens(jnp.maximum(input_codes, 0))
        input_tokens = jnp.where(
            (input_codes >= 0) & (seqs != self.PADDING_VALUE)[..., None],
            input_tokens,
            0,
        ).reshape(B, -1)

        targets = data[self.IPos][:, 0]
        label_codes = item_code[targets]  # (B, Lc)
        label_tokens = self._code_tokens(label_codes)

        dec_in = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), label_tokens[:, :-1]], axis=1
        )
        enc_out, enc_mask = self.seq2seq.encode(input_tokens, deterministic=False)
        dec_hidden = self._decode_hidden(dec_in, enc_out, enc_mask, False)
        logits = self._token_logits(dec_hidden)
        code_loss = criterions.cross_entropy_with_logits(logits, label_tokens)

        # alignment: sequence latent vs target tokenizer logits
        seq_latent = self.seq_project(
            (enc_out * enc_mask[..., None]).sum(1)
            / jnp.maximum(enc_mask.sum(1, keepdims=True), 1.0)
        )  # (B, dc)
        target_feats = self.semantic_embedding[targets]
        target_recon, vq_loss, _, target_logits = self.tokenizer_forward(target_feats)
        _, _, _, seq_logits = self.rq.quantize_with_logits(seq_latent)

        def sym_kl(a, b):
            pa = jax.nn.log_softmax(a.reshape(-1, self.num_codewords), axis=-1)
            pb = jax.nn.log_softmax(b.reshape(-1, self.num_codewords), axis=-1)
            kl = jnp.sum(jnp.exp(pb) * (pb - pa), axis=-1).mean()
            kr = jnp.sum(jnp.exp(pa) * (pa - pb), axis=-1).mean()
            return kl + kr

        kl_loss = sym_kl(seq_logits, target_logits)

        dec_latent = self.dec_project(dec_hidden[:, -1, :])  # (B, F)
        def cl(a, b):
            if self.sim == "cos":
                a = a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-12)
                b = b * jax.lax.rsqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-12)
            sim = jnp.einsum("md,nd->mn", a, b) / self.temperature
            labels = jnp.arange(a.shape[0], dtype=jnp.int32)
            return criterions.cross_entropy_with_logits(sim, labels)

        dec_cl_loss = cl(target_recon, dec_latent) + cl(dec_latent, target_recon)

        recon_loss = jnp.mean(jnp.square(target_recon - target_feats))
        vq_total = recon_loss + self.quant_loss_weight * vq_loss

        if train_id:
            w_vq = self.id_vq_loss
            w_code = self.id_code_loss if warmed else 0.0
            w_kl = self.id_kl_loss if warmed else 0.0
            w_cl = self.id_dec_cl_loss if warmed else 0.0
        else:
            w_vq = self.rec_vq_loss
            w_code = self.rec_code_loss
            w_kl = self.rec_kl_loss if warmed else 0.0
            w_cl = self.rec_dec_cl_loss if warmed else 0.0
        # python-float weights: zero terms drop out of the jaxpr entirely
        loss = 0.0
        if w_code:
            loss = loss + w_code * code_loss
        if w_kl:
            loss = loss + w_kl * kl_loss
        if w_cl:
            loss = loss + w_cl * dec_cl_loss
        if w_vq:
            loss = loss + w_vq * vq_total
        if not hasattr(loss, "dtype"):  # all weights zero: keep it traced
            loss = 0.0 * code_loss
        return loss, {
            "code_loss": code_loss,
            "kl_loss": kl_loss,
            "dec_cl_loss": dec_cl_loss,
            "vq_loss": vq_total,
        }

    def _decode_hidden(self, dec_in, enc_out, enc_mask, deterministic):
        # reuse seq2seq.decode but keep the hidden states: re-implement
        # the tied-head projection separately
        x = self.seq2seq.shared(dec_in)
        Bq = dec_in.shape[1]
        bias = self.seq2seq.dec_bias(Bq, Bq)
        for block in self.seq2seq.decoder_blocks:
            x = block(x, enc_out, enc_mask, bias, deterministic)
        return self.seq2seq.dec_final_ln(x)

    def _token_logits(self, dec_hidden):
        return jnp.einsum(
            "bld,vd->blv",
            dec_hidden * (self.embedding_dim**-0.5),
            self.seq2seq.shared.embedding,
            preferred_element_type=jnp.float32,
        )

    # ----------------------------------------------------------- inference
    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        item_code = data["item_code"]
        trie = data["trie"]  # (allowed, next_node, node_item) np arrays
        seqs = data[self.ISeq]
        B = seqs.shape[0]
        input_codes = item_code[seqs]
        input_tokens = self._code_tokens(jnp.maximum(input_codes, 0))
        input_tokens = jnp.where(
            (input_codes >= 0) & (seqs != self.PADDING_VALUE)[..., None],
            input_tokens,
            0,
        ).reshape(B, -1)
        enc_out, enc_mask = self.seq2seq.encode(input_tokens)

        allowed, next_node, node_item = trie
        kw = dict(num_beams=self.num_beams, max_steps=self.code_length,
                  start_id=0, pad_id=0)
        if not self.remat:
            # cached serving path (see TIGER.recommend_from_full): the
            # cross-attention memory K/V are projected once per query
            cross_kv = self.seq2seq.precompute_cross_kv(enc_out)
            items, scores = beam_search_cached(
                lambda dec: self._token_logits(self.seq2seq.decode_beams(
                    dec, cross_kv, enc_mask, return_hidden=True)),
                B, jnp.asarray(allowed), jnp.asarray(next_node),
                jnp.asarray(node_item), **kw,
            )
        else:
            items, scores = beam_search(
                lambda d, eo, em: self._token_logits(
                    self._decode_hidden(d, eo, em, True)),
                enc_out,
                enc_mask,
                jnp.asarray(allowed),
                jnp.asarray(next_node),
                jnp.asarray(node_item),
                **kw,
            )
        full = jnp.full((B, self.Item.count), -1e23)
        safe = jnp.where(items >= 0, items, self.Item.count)
        padded = jnp.concatenate(
            [full, jnp.full((B, 1), -1e23)], axis=1
        )
        out = padded.at[jnp.arange(B)[:, None], safe].max(scores)
        return out[:, : self.Item.count]

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        item_code = data["item_code"]
        seqs = data[self.ISeq]
        cands = data[self.IUnseen] + self.NUM_PADS  # (B, K)
        B, K = cands.shape
        input_codes = item_code[seqs]
        input_tokens = self._code_tokens(jnp.maximum(input_codes, 0))
        input_tokens = jnp.where(
            (input_codes >= 0) & (seqs != self.PADDING_VALUE)[..., None],
            input_tokens,
            0,
        ).reshape(B, -1)
        enc_out, enc_mask = self.seq2seq.encode(input_tokens)
        labels = self._code_tokens(item_code[cands])  # (B, K, Lc)
        Lc = self.code_length
        dec_in = jnp.concatenate(
            [jnp.zeros((B, K, 1), jnp.int32), labels[..., :-1]], axis=-1
        ).reshape(B * K, Lc)
        h = self._decode_hidden(
            dec_in,
            jnp.repeat(enc_out, K, axis=0),
            jnp.repeat(enc_mask, K, axis=0),
            True,
        )
        logp = jax.nn.log_softmax(self._token_logits(h), axis=-1)
        picked = jnp.take_along_axis(
            logp, labels.reshape(B * K, Lc)[..., None], axis=-1
        )[..., 0]
        return picked.sum(-1).reshape(B, K)


class ETEGRecCoach(Coach):
    """Alternating id/rec cycles (CoachForETEGRec, train_etegrec.py:
    407-653): the id phase runs every `cycle`-th epoch and refreshes the
    item codes (+ trie) at its end; each phase has its OWN AdamW (+
    warmup scheduler + global-norm clip 1.0) over its own param subset
    (tokenizer vs generator, semantic table frozen); cross losses are
    gated off until `warm_epoch`."""

    cycle: int = 2

    def set_other(self):
        self._train_id = False
        self._warmed = True
        self._item_code = None
        self._trie = None

    # --------------------------------------------------- phase optimizers
    @staticmethod
    def _param_group(path) -> str:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "semantic_embedding" in name:
            return "frozen"
        if (
            name.startswith("rq/")
            or name.startswith("enc_layers")
            or name.startswith("dec_layers")
        ):
            return "id"
        return "rec"

    def _label_fn(self, params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: self._param_group(p), params
        )

    def _schedule(self, lr: float, total: int, warmup: int):
        import optax

        kind = str(self.cfg.get("lr_scheduler_type", "cosine")).lower()
        warmup = max(int(warmup), 0)
        total = max(int(total), warmup + 1)
        if kind == "constant":
            if not warmup:
                return lr
            return optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup),
                 optax.constant_schedule(lr)],
                [warmup],
            )
        if kind == "linear":
            return optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup),
                 optax.linear_schedule(lr, 0.0, total - warmup)],
                [warmup],
            )
        return optax.warmup_cosine_decay_schedule(0.0, lr, warmup, total)

    def _steps_per_epoch(self) -> int:
        # roll-seq windows ≈ one per train interaction
        return max(1, len(self.dataset.train()) // max(int(self.cfg.batch_size), 1))

    def set_optimizer(self) -> None:
        import optax

        cfg = self.cfg
        wd = float(cfg.get("weight_decay", 0.0) or 0.0)
        cyc = max(int(cfg.get("cycle", self.cycle)), 1)
        spe = self._steps_per_epoch()
        rec_total = int(cfg.epochs) * spe
        id_total = max(rec_total // cyc, 1)
        warmup = int(cfg.get("warmup_steps", 8000))
        # None-aware fallbacks: an explicit 0.0 must freeze the phase,
        # not silently fall back to cfg.lr
        lr_rec = cfg.get("lr_rec")
        lr_rec = float(cfg.lr if lr_rec in (None, "") else lr_rec)
        lr_id = cfg.get("lr_id")
        lr_id = float(cfg.lr if lr_id in (None, "") else lr_id)

        def branch(lr, total, warm):
            return optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adamw(self._schedule(lr, total, warm), weight_decay=wd),
            )

        self.rec_optimizer = optax.multi_transform(
            {"rec": branch(lr_rec, rec_total, warmup),
             "id": optax.set_to_zero(), "frozen": optax.set_to_zero()},
            self._label_fn,
        )
        self.id_optimizer = optax.multi_transform(
            {"id": branch(lr_id, id_total, max(warmup // cyc, 0)),
             "rec": optax.set_to_zero(), "frozen": optax.set_to_zero()},
            self._label_fn,
        )
        # template optimizer: init carries BOTH phases' states; update is
        # never used (this coach builds phase-specific steps)
        self.optimizer = optax.GradientTransformation(
            init=lambda p: {
                "rec": self.rec_optimizer.init(p),
                "id": self.id_optimizer.init(p),
            },
            update=self._template_update,
        )

    @staticmethod
    def _template_update(grads, state, params=None):
        raise RuntimeError(
            "ETEGRecCoach routes updates through per-phase optimizers"
        )

    def _make_train_step(self):
        import optax

        phase = "id" if self._train_id else "rec"
        opt = self.id_optimizer if self._train_id else self.rec_optimizer
        from ...launcher.coach import TrainState

        def step(state, batch, rng):
            def fn(p):
                return self.loss_of(p, batch, rng)

            (loss, logs), grads = jax.value_and_grad(fn, has_aux=True)(
                state.params
            )
            updates, opt_sub = opt.update(
                grads, state.opt_state[phase], state.params
            )
            params = optax.apply_updates(state.params, updates)
            opt_state = dict(state.opt_state)
            opt_state[phase] = opt_sub
            return (
                TrainState(params, opt_state, state.step + 1, state.stats),
                loss,
                logs,
            )

        return jax.jit(step, donate_argnums=0)

    def refresh_item_codes(self):
        model = self.get_res_sys_arch()
        codes = np.asarray(
            self.model.apply({"params": self.state.params}, method="current_codes")
        )
        full = codes_with_check_digit(codes, max_rank=model.num_codewords)
        item_code = np.concatenate(
            [np.full((model.NUM_PADS, full.shape[1]), -1, np.int64), full], axis=0
        )
        self._item_code = item_code
        self._trie = self._build_trie(full, model)

    @staticmethod
    def _build_trie(codes: np.ndarray, model):
        V = model.token_vocab
        children = [dict()]
        node_item = [-1]

        def child(node, token):
            nxt = children[node].get(token)
            if nxt is None:
                children.append(dict())
                node_item.append(-1)
                nxt = len(children) - 1
                children[node][token] = nxt
            return nxt

        offsets = 1 + np.arange(codes.shape[1]) * model.num_codewords
        for item_id, row in enumerate(codes):
            node = 0
            for tok in (row + offsets).tolist():
                node = child(node, tok)
            node_item[node] = item_id
        # pad the node count to a power-of-two bucket so refreshed tries
        # keep a stable shape → the jitted eval step doesn't recompile
        n = len(children)
        n_pad = 1
        while n_pad < n:
            n_pad *= 2
        allowed = np.zeros((n_pad, V), dtype=bool)
        next_node = np.full((n_pad, V), -1, dtype=np.int32)
        for i, kids in enumerate(children):
            for t, j in kids.items():
                allowed[i, t] = True
                next_node[i, t] = j
        items_arr = np.full(n_pad, -1, np.int32)
        items_arr[:n] = np.asarray(node_item, np.int32)
        for i in range(n):
            if items_arr[i] >= 0:
                allowed[i, 0] = True
                next_node[i, 0] = i
        return allowed, next_node, items_arr

    def loss_of(self, params, batch, rng):
        loss, logs = self.model.apply(
            {"params": params},
            batch,
            self._train_id,
            getattr(self, "_warmed", True),
            method="fit",
            rngs={"dropout": rng, "sampling": jax.random.fold_in(rng, 1)},
        )
        return loss, logs

    def train(self, epoch: int):
        cyc = max(int(self.cfg.get("cycle", self.cycle)), 1)
        if self.state is not None and self._item_code is None:
            self.refresh_item_codes()
        if not getattr(self, "_finetuning", False):
            # reference phase rule (train_per_epoch, train_etegrec.py:
            # 492-494): the id phase runs every cycle-th epoch; cross
            # losses gate on after warm_epoch
            self._train_id = (epoch % cyc == 0) if cyc else False
            self._warmed = epoch >= int(self.cfg.get("warm_epoch", 0) or 0)
        return super().train(epoch)

    def post_training(self) -> None:
        """Code-loss finetune of the generator at finetune_lr with a
        fresh cosine schedule, tokenizer frozen, starting from the best
        checkpoint (CoachForETEGRec.finetune, train_etegrec.py:583-624)."""
        import optax

        from ... import utils
        from ...launcher.coach import EarlyStopError, TrainState

        ft = int(self.cfg.get("finetune_epochs", 0) or 0)
        if ft <= 0 or self.state is None:
            return
        utils.infoLogger("[ETEGRec] >>> code-loss finetune phase")
        try:
            self.load_best()
        except FileNotFoundError:
            pass
        self.refresh_item_codes()
        # fresh best/early-stop trackers (reset_best_for_finetune)
        self._best = None
        self._stopping_steps = 0
        self._early_stop_patience = 10
        spe = self._steps_per_epoch()
        wd = float(self.cfg.get("weight_decay", 0.0) or 0.0)
        lr = float(self.cfg.get("finetune_lr", 5e-4) or 5e-4)
        self.rec_optimizer = optax.multi_transform(
            {"rec": optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adamw(
                    optax.cosine_decay_schedule(lr, max(ft * spe, 1)),
                    weight_decay=wd,
                ),
            ),
             "id": optax.set_to_zero(), "frozen": optax.set_to_zero()},
            self._label_fn,
        )
        opt_state = dict(self.state.opt_state)
        opt_state["rec"] = self.rec_optimizer.init(self.state.params)
        self.state = TrainState(
            self.state.params, opt_state, self.state.step, self.state.stats
        )
        self._finetuning = True
        self._phase_tag = 1  # invalidates cached (phase, warmed) steps
        # rec phase, unwarmed → code loss only (rec_vq_loss defaults 0)
        self._train_id = False
        self._warmed = False
        eval_freq = max(1, int(self.cfg.get("eval_freq", 1)))
        try:
            for e in range(ft):
                epoch = int(self.cfg.epochs) + e
                self.train(epoch)
                if (e + 1) % eval_freq == 0 and self.validpipe is not None:
                    self.evaluate(epoch, mode="valid")
                    summary = self._flush("valid", epoch)
                    self._check_best(summary, epoch)
        except EarlyStopError as exc:
            utils.infoLogger(f"[ETEGRec] >>> finetune early stop: {exc}")
        self._finetuning = False
        self.save_last()

    def _device_batches(self, epoch: int):
        """Per-step batches drawn from a device sampler (the ETEGRec
        protocol sampler, DeviceLastTargetSampler): sampling runs as
        one small jitted program per step — no host pipe work in the
        loop. The generic Coach scan-chunks whole epochs instead, but
        this coach's step function switches on host-side phase state
        and refreshes item codes between phases, so per-step dispatch
        (~1 ms over the tunnel, ~90 steps/epoch at Beauty scale) is the
        right trade here."""
        pipe = self.trainpipe
        pipe.set_seed(int(self.cfg.seed))
        pipe.set_epoch(epoch)
        if not hasattr(self, "_sampler_jit"):
            self._sampler_jit = (
                jax.jit(pipe.prepare),
                jax.jit(pipe.sample_prepared),
            )
        prep_fn, sample_fn = self._sampler_jit
        key = pipe.epoch_key()
        prep = prep_fn(key)
        B = int(self.cfg.batch_size)
        for i in range(pipe.steps_per_epoch):
            yield sample_fn(prep, key, i), B

    def train_per_epoch(self, epoch: int) -> None:
        from ...data.pipes import Size

        if getattr(self.trainpipe, "is_device_sampler", False):
            source = self._device_batches(epoch)
        else:
            source = (
                (
                    {
                        f: jnp.asarray(v)
                        for f, v in data.items()
                        if isinstance(v, (np.ndarray, jnp.ndarray))
                        and f != Size
                    },
                    int(data.get(Size, 1)),
                )
                for data in self.dataloader
            )
        for batch, n in source:
            batch = dict(batch)
            self._init_state_eteg(batch)
            batch["item_code"] = jnp.asarray(self._item_code)
            # loss_of closes over (_train_id, _warmed) (static) → one
            # jitted step per (phase, warmed) combination
            if not hasattr(self, "_step_fns"):
                self._step_fns = {}
            key = (self._train_id, self._warmed, getattr(self, "_phase_tag", 0))
            if key not in self._step_fns:
                self._step_fns[key] = self._make_train_step()
            step_fn = self._step_fns[key]
            self._rng, rng = jax.random.split(self._rng)
            self.state, loss, logs = step_fn(self.state, batch, rng)
            self.monitor(
                float(loss), n=n, reduction="mean", mode="train", pool=["LOSS"]
            )
        if self._train_id and self.state is not None:
            # codes move only when the tokenizer trains: refresh at the
            # END of each id epoch (train_etegrec.py:542-543)
            self.refresh_item_codes()

    def _init_state_eteg(self, batch):
        if self.state is not None:
            return
        # init requires item_code: derive a provisional one (zeros)
        model = self.get_res_sys_arch()
        provisional = np.zeros(
            (model.Item.count + model.NUM_PADS, model.code_length), np.int64
        )
        batch = dict(batch)
        batch["item_code"] = jnp.asarray(provisional)
        self._init_state(batch)
        # warm-start the tokenizer from a stage-A RQVAE run
        # (train_etegrec.py:169-170 model_id.load_state_dict); without
        # it the codes churn from scratch and the generator chases a
        # moving SID target — measured near-random on small data
        rqvae_path = self.cfg.get("rqvae_path")
        if rqvae_path:
            self._load_stage_a(str(rqvae_path))
        self.refresh_item_codes()

    def _load_stage_a(self, path: str) -> None:
        """Transplant a stage-A RQVAE payload (Coach.save format: the
        encoder MLP + quantizer codebooks) into the joint model's
        enc_layers/rq params."""
        from ... import utils
        from ...launcher.coach import TrainState

        payload = utils.import_pickle(path)
        src = payload["params"] if isinstance(payload, dict) else payload
        params = dict(self.state.params)
        moved = 0
        for k, v in src.items():
            # full stage-A module: encoder AND decoder MLPs (the
            # reference's model_id.load_state_dict restores both)
            if (k.startswith("enc_layers") or k.startswith("dec_layers")) \
                    and k in params:
                params[k] = jax.tree.map(jnp.asarray, v)
                moved += 1
        if "quantizer" in src and "rq" in params:
            rq = dict(params["rq"])
            for k, v in src["quantizer"].items():
                if k in rq:
                    rq[k] = jnp.asarray(np.asarray(v))
                    moved += 1
            params["rq"] = rq
        if moved == 0:
            raise ValueError(
                f"rqvae_path {path!r} transplanted NOTHING — the payload's "
                "keys don't match this tokenizer (expected enc_layers_*/"
                "dec_layers_* + quantizer/codebook_*); training from "
                "scratch would collapse (docs/PARITY.md)"
            )
        utils.infoLogger(
            f"[{type(self).__name__}] >>> transplanted {moved} stage-A tensors"
        )
        self.state = TrainState(
            params, self.state.opt_state, self.state.step, self.state.stats
        )

    def evaluate(self, epoch: int, step: int = -1, mode: str = "valid") -> None:
        if self._item_code is None:
            self.refresh_item_codes()
        pipe = self.validpipe if mode == "valid" else self.testpipe
        if pipe is None:
            return
        model = self.get_res_sys_arch()
        from ...launcher import metrics as metrics_lib

        wanted = tuple(
            (b, k) for b, k in self._wanted if b in metrics_lib.RANK_METRICS
        )
        pool = [metrics_lib.fmt_metric(b, k) for b, k in wanted]
        item_code = jnp.asarray(self._item_code)
        trie = tuple(jnp.asarray(t) for t in self._trie)

        step_key = ("eteg_eval", self.remove_seen)
        if step_key not in self._jit_cache:

            def eval_step(params, batch, item_code, trie, seen_ids,
                          target_ids, valid_rows):
                batch = dict(batch)
                batch["item_code"] = item_code
                batch["trie"] = trie
                scores = self.model.apply(
                    {"params": params}, batch, None,
                    method="recommend_from_full",
                )
                if self.remove_seen and seen_ids is not None:
                    rows = jnp.arange(scores.shape[0])[:, None]
                    scores = scores.at[rows, seen_ids].set(-1e23, mode="drop")
                return metrics_lib.rank_metrics(
                    scores, target_ids, wanted, valid_rows
                )

            self._jit_cache[step_key] = jax.jit(eval_step)
        eval_step = self._jit_cache[step_key]

        pending = []
        for data in pipe:
            batch, aux, valid_rows, B = self._densify_eval_batch(data)
            batch = {f: jnp.asarray(v) for f, v in batch.items()}
            sums = eval_step(
                self.state.params, batch, item_code, trie,
                jnp.asarray(aux["seen_ids"])
                if self.remove_seen and aux.get("seen_ids") is not None
                else None,
                jnp.asarray(aux["target_ids"]),
                jnp.asarray(valid_rows),
            )
            pending.append((B, sums))
        for (B, sums) in zip(
            [b for b, _ in pending], jax.device_get([s for _, s in pending])
        ):
            values = [float(sums[name]) / max(B, 1) for name in pool if name in sums]
            self.monitor(*values, n=B, reduction="mean", mode=mode, pool=pool)


ETEGRec.COACH = ETEGRecCoach
