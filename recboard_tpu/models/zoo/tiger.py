"""TIGER: two-stage semantic-ID generative recommendation.

Stage A — RQ-VAE tokenizer (TIGER/train_rqvae.py:75-283): frozen
L2-normalized semantic item features → dropout/SiLU MLP encoder →
residual quantizer (STE/Gumbel/rotation/SimVQ/product) → MLP decoder →
normalized reconstruction; sum-MSE recon + commitment losses; metrics:
per-level codebook perplexity + collision rate; emits sid_vocab.json.

Stage B — seq2seq generator (TIGER/train_t5.py:95-240): item history →
SID protocol tokens → T5-style encoder-decoder CE on the target item's
SID block; full ranking via trie-constrained beam search, beam scores
scattered over uniform background noise (train_t5.py:210-236).

Baselines (Beauty): TIGER RQ-VAE NDCG@10 0.0371±0.0008 et al.

TPU-first: item→token mapping is a static (N+1, L) int table (row N =
all-PAD sentinel used as the sequence pad), so train/eval batches are
pure int arrays — no tokenizer in the hot path; beam search is jitted
with dense trie masks (sem/seq2seq.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import utils
from ...launcher import Coach
from ...sem.converter import SemIDConverter
from ...sem.quantizers import (
    ProductQuantizer,
    RatingResidualQuantizer,
    ResidualQuantizer,
    ResidualSimVQQuantizer,
)
from ...sem.seq2seq import Seq2SeqTransformer, beam_search, beam_search_cached
from ..base import Batch, RecSysArch, SeqRecArch
from ..modules import xavier_normal
from . import register

BACKGROUND_SCORE_MAX = 1e-3
BEAM_SCORE_BASE = 1.0


@register("RQVAE")
class RQVAE(RecSysArch):
    """Stage-A tokenizer model. With `collab_features` + `cf_weight`,
    this is LETTER's tokenizer: the reconstruction is aligned with
    collaborative item embeddings through an in-batch contrastive CE
    (LETTER/train_rqvae.py:167-190)."""

    item_features: Optional[np.ndarray] = None  # (N, F), frozen
    hidden_dims: Tuple[int, ...] = (512, 256, 128)
    codebook_dim: int = 32
    num_codebooks: int = 3
    num_codewords: int = 256
    dropout_rate: float = 0.0
    commit_weight: float = 0.25
    quantization_strategy: str = "ste"  # ste|gumbel|rotation|simvq|product
    apply_shared_codebook: bool = False
    sk_epsilons: Optional[Tuple[float, ...]] = None
    sk_iters: int = 50
    gumbel_temperature: float = 1.0
    collab_features: Optional[np.ndarray] = None  # (N, F'), frozen (LETTER)
    cf_weight: float = 0.0
    # LETTER tokenizer knobs (LETTER/train_rqvae.py:19-30): k-means
    # codebook init on the encoded latents + per-epoch codebook
    # diversity clusters; both inert at the TIGER defaults
    apply_kmeans_init: bool = False
    kmeans_iters: int = 10
    diversity_weight: float = 0.0
    num_diversity_clusters: int = 10
    act: str = "silu"  # TIGER SiLU; LETTER ReLU (train_rqvae.py:97)
    # TIGER L2-normalizes item features at load (train_rqvae.py:81);
    # ETEGRec's stage-A trains on RAW features (train_etegrec.py:116-121
    # loads without normalize) — set false when pretraining a tokenizer
    # for an ETEGRec/DIGER warm start so the spaces match
    normalize_features: bool = True
    recon_reduction: str = "sum"  # sum-MSE/B (TIGER) | mean (LETTER)
    commit_reduction: str = "sum"
    quant_normalize_loss: bool = True  # TIGER /L; LETTER raw sum
    quant_loss_weight: float = 1.0  # ETEGRec rqvae pretrain scales aux

    def setup(self):
        feats = np.asarray(self.item_features, np.float32)
        if self.normalize_features:
            feats = feats / np.maximum(
                np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
            )
        self._feats = jnp.asarray(feats)
        # product quantization splits the latent into per-codebook blocks,
        # so the encoder must emit num_codebooks*codebook_dim (reference
        # TIGER/train_pqvae.py:77 `codebook_size = codebook_dim *
        # num_codebooks`); every residual strategy quantizes the same
        # codebook_dim-sized latent at each level instead
        latent_dim = (
            self.codebook_dim * self.num_codebooks
            if self.quantization_strategy == "product"
            else self.codebook_dim
        )
        dims = [feats.shape[1], *self.hidden_dims, latent_dim]
        self.enc_layers = [
            nn.Dense(d, use_bias=False, kernel_init=xavier_normal)
            for d in dims[1:]
        ]
        self.dec_layers = [
            nn.Dense(d, use_bias=False, kernel_init=xavier_normal)
            for d in dims[::-1][1:]
        ]
        self.dropout = nn.Dropout(self.dropout_rate)
        kwargs = dict(
            codebook_dim=self.codebook_dim,
            num_codebooks=self.num_codebooks,
            num_codewords=self.num_codewords,
            apply_shared_codebook=self.apply_shared_codebook,
            commit_weight=self.commit_weight,
            commit_reduction=self.commit_reduction,
            sk_iters=self.sk_iters,
            sk_epsilons=self.sk_epsilons,
            gumbel_temperature=self.gumbel_temperature,
            normalize_loss=self.quant_normalize_loss,
        )
        if self.quantization_strategy == "simvq":
            self.quantizer = ResidualSimVQQuantizer(**kwargs)
        elif self.quantization_strategy == "product":
            self.quantizer = ProductQuantizer(**kwargs)
        else:
            self.quantizer = ResidualQuantizer(
                estimator=self.quantization_strategy,
                diversity_weight=self.diversity_weight,
                **kwargs,
            )

    @property
    def _act(self):
        return nn.relu if self.act == "relu" else nn.silu

    def sure_trainpipe(self, batch_size: int = 512):
        from ...data.pipes import RandomShuffledSource

        rows = self.dataset.to_rows({self.Item: list(range(self.Item.count))})
        return (
            RandomShuffledSource(self.dataset.train(), rows)
            .batch_(batch_size)
            .tensor_()
        )

    def encode(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i, layer in enumerate(self.enc_layers):
            x = self.dropout(x, deterministic=deterministic)
            x = layer(x)
            if i < len(self.enc_layers) - 1:
                x = self._act(x)
        return x

    def decode(self, q: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i, layer in enumerate(self.dec_layers):
            q = self.dropout(q, deterministic=deterministic)
            q = layer(q)
            if i < len(self.dec_layers) - 1:
                q = self._act(q)
        return q * jax.lax.rsqrt(
            jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12
        )

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        items = data[self.Item].reshape(-1)
        x = self._feats[items]
        z = self.encode(x, deterministic=False)
        tables = data.get("diversity_tables")
        if tables is not None and isinstance(self.quantizer, ResidualQuantizer):
            q, aux_loss, ids = self.quantizer(z, diversity_tables=tables)
        else:
            q, aux_loss, ids = self.quantizer(z)
        x_hat = self.decode(q, deterministic=False)
        if self.recon_reduction == "mean":
            recon = jnp.mean(jnp.square(x_hat - x))
        else:
            recon = jnp.sum(jnp.square(x_hat - x)) / items.shape[0]
        loss = recon + self.quant_loss_weight * aux_loss
        logs = {"recon_loss": recon, "auxiliary_loss": aux_loss}
        if self.collab_features is not None and self.cf_weight > 0:
            # LETTER collaborative alignment: in-batch contrastive CE
            # between x_hat and the frozen collaborative embeddings
            collab = jnp.asarray(self.collab_features, jnp.float32)[items]
            logits = jnp.einsum("md,nd->mn", x_hat, collab)
            labels = jnp.arange(items.shape[0], dtype=jnp.int32)
            from ... import criterions

            cf_loss = criterions.cross_entropy_with_logits(logits, labels)
            loss = loss + self.cf_weight * cf_loss
            logs["cf_loss"] = cf_loss
        return loss, logs

    def codes_of(self, items: jnp.ndarray) -> jnp.ndarray:
        x = self._feats[items]
        z = self.encode(x)
        return self.quantizer.get_indices(z)

    def eval_recon(self, items: jnp.ndarray) -> jnp.ndarray:
        """Deterministic reconstruction loss at the HARD code assignment
        (reference registers RECON_LOSS as a valid metric,
        TIGER/train_rqvae.py:224-230; which4best can then target it)."""
        x = self._feats[items]
        z = self.encode(x)
        q = self.quantizer.embed(self.quantizer.get_indices(z))
        x_hat = self.decode(q)
        if self.recon_reduction == "mean":
            return jnp.mean(jnp.square(x_hat - x))
        return jnp.sum(jnp.square(x_hat - x)) / items.shape[0]

    # ------------------------------------------ host-side init/refresh
    def post_init_params(self, params):
        """K-means codebook init (LETTER/quantizer.py:34-58): the
        reference re-inits each codebook with constrained k-means on the
        first batch's latents at the first forward; here the Coach calls
        this right after param init (same moment, all-items latents for
        coverage). Level l clusters the residual left by levels < l."""
        if not self.apply_kmeans_init:
            return params
        if self.quantization_strategy in ("simvq",):
            utils.warnLogger(
                "[RQVAE] >>> apply_kmeans_init is not defined for SimVQ "
                "(frozen base codebooks); skipping"
            )
            return params
        from ...sem.kmeans import kmeans

        feats = np.asarray(self.item_features, np.float64)
        feats = feats / np.maximum(
            np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
        )
        z = np.asarray(
            self.apply(
                {"params": params}, jnp.asarray(feats, jnp.float32),
                method="encode",
            ),
            np.float64,
        )
        K = self.num_codewords
        quant = dict(params["quantizer"])
        if self.quantization_strategy == "product":
            blocks = z.reshape(z.shape[0], self.num_codebooks, -1)
            for l in range(self.num_codebooks):
                size_min = max(1, min(len(z) // (K * 2), 50))
                centers, _ = kmeans(
                    blocks[:, l], min(K, len(z)), iters=self.kmeans_iters,
                    seed=l, size_min=size_min,
                )
                quant[f"codebook_{l}"] = jnp.asarray(centers, jnp.float32)
        else:
            r = z
            for l in range(self.num_codebooks):
                size_min = max(1, min(len(r) // (K * 2), 50))
                centers, labels = kmeans(
                    r, min(K, len(r)), iters=self.kmeans_iters,
                    seed=l, size_min=size_min,
                )
                quant[f"codebook_{l}"] = jnp.asarray(centers, jnp.float32)
                r = r - centers[labels]
                if self.apply_shared_codebook:
                    break
        new = dict(params)
        new["quantizer"] = quant
        return new

    def build_diversity_tables(self, params):
        """Per-epoch codebook clustering for the diversity loss
        (LETTER/quantizer.py:60-91): constrained k-means over each
        level's codewords → (labels (L,K), members (L,C,K), sizes (L,C))
        padded tables the jitted step samples positives from."""
        from ...sem.kmeans import kmeans

        C = self.num_diversity_clusters
        K = self.num_codewords
        n_books = 1 if self.apply_shared_codebook else self.num_codebooks
        labels_all, members_all, sizes_all = [], [], []
        for l in range(n_books):
            cb = np.asarray(params["quantizer"][f"codebook_{l}"], np.float64)
            size_min = max(1, min(K // (C * 2), 10))
            _, labels = kmeans(cb, C, iters=10, seed=l, size_min=size_min)
            members = np.zeros((C, K), np.int32)
            sizes = np.zeros((C,), np.int32)
            for c in range(C):
                idx = np.where(labels == c)[0]
                members[c, : len(idx)] = idx
                sizes[c] = len(idx)
            labels_all.append(labels.astype(np.int32))
            members_all.append(members)
            sizes_all.append(sizes)
        reps = self.num_codebooks // n_books
        return (
            np.stack(labels_all * reps),
            np.stack(members_all * reps),
            np.stack(sizes_all * reps),
        )

    def recommend_from_full(self, data, buffers=None):
        raise NotImplementedError("RQVAE is a tokenizer, not a recommender")

    recommend_from_pool = recommend_from_full


class RQVAECoach(Coach):
    """Stage-A coach: registers tokenizer metrics (PPL per level +
    collision rate, TIGER/train_rqvae.py:224-283) and writes
    sid_vocab.json at the end."""

    def evaluate(self, epoch: int, step: int = -1, mode: str = "valid") -> None:
        model = self.get_res_sys_arch()
        codes = np.asarray(
            self.model.apply(
                {"params": self.state.params},
                jnp.arange(model.Item.count),
                method="codes_of",
            )
        )  # (N, L)
        ppls = []
        for l in range(codes.shape[1]):
            counts = np.bincount(codes[:, l], minlength=model.num_codewords)
            p = counts / counts.sum()
            nz = p[p > 0]
            ppls.append(float(np.exp(-(nz * np.log(nz)).sum())))
        uniq = len({tuple(r) for r in codes.tolist()})
        collision = 1.0 - uniq / codes.shape[0]
        names = ["PPL", "COLLISION_RATE"] + [f"PPL#{i}" for i in range(len(ppls))]
        values = [float(np.mean(ppls)), collision] + ppls
        try:
            recon = float(
                self.model.apply(
                    {"params": self.state.params},
                    jnp.arange(model.Item.count),
                    method="eval_recon",
                )
            )
            names.append("RECON_LOSS")
            values.append(recon)
        except Exception:  # archs without eval_recon (R3-VAE coach reuse)
            pass
        self.monitor(*values, n=1, reduction="mean", mode=mode, pool=names)

    def save_sid_vocab(self, file_: Optional[str] = None) -> str:
        import os

        model = self.get_res_sys_arch()
        codes = np.asarray(
            self.model.apply(
                {"params": self.state.params},
                jnp.arange(model.Item.count),
                method="codes_of",
            )
        )
        converter = SemIDConverter.from_codes(codes)
        file_ = file_ or os.path.join(self.cfg.LOG_PATH, "sid_vocab.json")
        converter.save(file_)
        return file_


class LETTERCoach(RQVAECoach):
    """LETTER stage-A coach: re-clusters each codebook for the diversity
    loss before every epoch (CoachForRQVAE.train_per_epoch,
    LETTER/train_rqvae.py:236) and threads the padded cluster tables
    into the jitted step as batch entries."""

    def train(self, epoch: int):
        model = self.get_res_sys_arch()
        if model.diversity_weight > 0 and self.state is not None:
            self._div_tables = model.build_diversity_tables(self.state.params)
        return super().train(epoch)

    def train_per_epoch(self, epoch: int) -> None:
        model = self.get_res_sys_arch()
        if model.diversity_weight <= 0:
            return super().train_per_epoch(epoch)
        from ...data.pipes import Size

        if not hasattr(self, "_train_step_fn"):
            self._train_step_fn = None
        for data in self.dataloader:
            n = int(data.get(Size, 1))
            batch = {
                f: jnp.asarray(v)
                for f, v in data.items()
                if isinstance(v, np.ndarray) and f != Size
            }
            self._init_state(batch)
            if getattr(self, "_div_tables", None) is None:
                self._div_tables = model.build_diversity_tables(
                    self.state.params
                )
            batch["diversity_tables"] = tuple(
                jnp.asarray(t) for t in self._div_tables
            )
            if self._train_step_fn is None:
                self._train_step_fn = self._make_train_step()
            self._rng, rng = jax.random.split(self._rng)
            self.state, loss, logs = self._train_step_fn(self.state, batch, rng)
            self.monitor(
                float(loss), n=n, reduction="mean", mode="train", pool=["LOSS"]
            )


@register("LETTER")
class LETTERTokenizer(RQVAE):
    """LETTER tokenizer = TIGER RQ-VAE + collaborative alignment +
    k-means codebook init + per-epoch codebook diversity loss
    (LETTER/train_rqvae.py:14-50, LETTER/quantizer.py). Defaults mirror
    LETTER/train_rqvae.py argparse; stage B reuses TIGER's generator
    over the emitted sid_vocab. Reductions follow the reference exactly:
    mean-MSE recon/commit (F.mse_loss default) and an UN-normalized
    per-level aux sum (LETTER/quantizer.py:250), unlike TIGER's
    sum-MSE/B and /num_codebooks."""

    cf_weight: float = 0.01
    dropout_rate: float = 0.1
    apply_kmeans_init: bool = True
    diversity_weight: float = 0.0001
    sk_epsilons: Optional[Tuple[float, ...]] = (0.0, 0.0, 0.003)
    act: str = "relu"
    recon_reduction: str = "mean"
    commit_reduction: str = "mean"
    quant_normalize_loss: bool = False


@register("R3-VAE")
class R3VAE(RecSysArch):
    """R3-VAE: reference-vector-guided residual RATING quantization
    (R3-VAE/train_r3vae.py:47-161 + R3-VAE/quantizer.py:66-167) —
    identity encoder over L2-normalized frozen semantic features, a
    RatingResidualQuantizer (top-1 cosine codeword scaled by its cosine
    score; differentiable, no STE), a 4x-expansion MLP decoder, and
    rec (1-cos) + SC (semantic cohesion) + PD (preference
    discrimination) losses. Codebooks k-means-initialized from the
    residuals of the first 5*num_codewords items (reset_parameters,
    train_r3vae.py:81-98) — constrained k-means in the reference, plain
    balanced Lloyd here (k_means_constrained is not in this image).
    Stage B reuses TIGER's generator over the emitted sid_vocab."""

    item_features: Optional[np.ndarray] = None  # (N, F), frozen
    num_codebooks: int = 3
    num_codewords: int = 256
    pd_temperature: float = 2.0
    rec_loss_weight: float = 1.0
    sc_loss_weight: float = 0.1
    pd_loss_weight: float = 0.05
    kmeans_iters: int = 10

    def setup(self):
        feats = np.asarray(self.item_features, np.float32)
        feats = feats / np.maximum(
            np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
        )
        self._feats = jnp.asarray(feats)
        F_dim = feats.shape[1]
        self.quantizer = RatingResidualQuantizer(
            codebook_dim=F_dim,
            num_codebooks=self.num_codebooks,
            num_codewords=self.num_codewords,
            pd_temperature=self.pd_temperature,
        )
        xavier_uniform = nn.initializers.xavier_uniform()
        self.dec_hidden = nn.Dense(F_dim * 4, kernel_init=xavier_uniform)
        self.dec_out = nn.Dense(F_dim, kernel_init=xavier_uniform)

    def sure_trainpipe(self, batch_size: int = 512):
        from ...data.pipes import RandomShuffledSource

        rows = self.dataset.to_rows({self.Item: list(range(self.Item.count))})
        return (
            RandomShuffledSource(self.dataset.train(), rows)
            .batch_(batch_size)
            .tensor_()
        )

    def decode(self, q: jnp.ndarray) -> jnp.ndarray:
        return self.dec_out(nn.relu(self.dec_hidden(q)))

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        items = data[self.Item].reshape(-1)
        x = self._feats[items]
        q, sc_loss, pd_loss, _ = self.quantizer(x)
        x_hat = self.decode(q)
        num = jnp.sum(x_hat * x, axis=-1)
        den = jnp.maximum(
            jnp.linalg.norm(x_hat, axis=-1) * jnp.linalg.norm(x, axis=-1), 1e-8
        )
        rec_loss = 1.0 - jnp.mean(num / den)
        loss = (
            rec_loss * self.rec_loss_weight
            + sc_loss * self.sc_loss_weight
            + pd_loss * self.pd_loss_weight
        )
        return loss, {
            "rec_loss": rec_loss, "sc_loss": sc_loss, "pd_loss": pd_loss
        }

    def codes_of(self, items: jnp.ndarray) -> jnp.ndarray:
        return self.quantizer.get_indices(self._feats[items])

    def post_init_params(self, params):
        """K-means codebook init on residuals of the first 5K items,
        level by level with the already-initialized levels applied
        (reference reset_parameters → first quantizer forward with
        requires_kmeans_init_, train_r3vae.py:88-98)."""
        from ...sem.kmeans import kmeans

        feats = np.asarray(self.item_features, np.float64)
        feats = feats / np.maximum(
            np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
        )
        x = feats[: self.num_codewords * 5]
        quant = dict(params["quantizer"])
        ref = np.asarray(quant["reference_vector"], np.float64)
        refn = ref / max(np.linalg.norm(ref), 1e-12)
        vals = x @ refn.T  # (B, 1)
        r = x - vals * refn
        K = self.num_codewords
        for l in range(self.num_codebooks):
            size_min = max(1, min(len(r) // (K * 2), 50))
            centers, _ = kmeans(
                r, min(K, len(r)), iters=self.kmeans_iters, seed=l,
                size_min=size_min,
            )
            quant[f"codebook_{l}"] = jnp.asarray(centers, jnp.float32)
            cbn = centers / np.maximum(
                np.linalg.norm(centers, axis=-1, keepdims=True), 1e-12
            )
            rn = r / np.maximum(
                np.linalg.norm(r, axis=-1, keepdims=True), 1e-12
            )
            scores = rn @ cbn.T
            idx = scores.argmax(axis=-1)
            w = scores[np.arange(len(r)), idx]
            r = r - w[:, None] * cbn[idx]
        new = dict(params)
        new["quantizer"] = quant
        return new

    def recommend_from_full(self, data, buffers=None):
        raise NotImplementedError("R3-VAE is a tokenizer, not a recommender")

    recommend_from_pool = recommend_from_full


@register("TIGER")
class TIGER(SeqRecArch):
    """Stage-B generator over SID tokens."""

    NUM_PADS: int = 0  # padding handled by the sentinel token-table row

    converter: Optional[SemIDConverter] = None
    maxlen: int = 20
    num_beams: int = 20
    embedding_dim: int = 128
    num_heads: int = 4
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    ffn_dim: int = 256  # T5 d_ff = 4*d_kv (TIGER/train_t5.py:22)
    head_dim: int = 64  # T5 d_kv (TIGER/train_t5.py:21)
    dropout_rate: float = 0.1
    remat: bool = False  # rematerialize seq2seq blocks (large-batch HBM)

    def setup(self):
        conv = self.converter
        # sentinel row: item id == Item.count → all-PAD block
        table = np.concatenate(
            [conv.item_token_ids,
             np.full((1, conv.item_token_ids.shape[1]), conv.pad_id, np.int32)],
            axis=0,
        )
        self._token_table = jnp.asarray(table)
        self.seq2seq = Seq2SeqTransformer(
            vocab_size=conv.vocab_size,
            dim=self.embedding_dim,
            num_heads=self.num_heads,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            ffn_dim=self.ffn_dim,
            head_dim=self.head_dim,
            dropout=self.dropout_rate,
            pad_id=conv.pad_id,
            remat=self.remat,
        )

    @property
    def _pad_item(self) -> int:
        return self.Item.count

    def sure_trainpipe(self, maxlen: int, batch_size: int):
        return (
            self.dataset.train()
            .shuffled_roll_seqs_source(minlen=2, maxlen=maxlen, keep_at_least_itself=True)
            .seq_train_yielding_pos_(start_idx_for_target=-1, end_idx_for_input=-1)
            .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self._pad_item)
            .batch_(batch_size)
            .tensor_()
        )

    def sure_validpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 256):
        return (
            self.dataset.valid()
            .ordered_user_ids_source()
            .valid_sampling_(ranking)
            .lprune_(maxlen, modified_fields=(self.ISeq,))
            .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self._pad_item)
            .batch_(batch_size)
            .tensor_()
        )

    def sure_testpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 256):
        return (
            self.dataset.test()
            .ordered_user_ids_source()
            .test_sampling_(ranking)
            .lprune_(maxlen, modified_fields=(self.ISeq,))
            .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self._pad_item)
            .batch_(batch_size)
            .tensor_()
        )

    def _input_tokens(self, seqs: jnp.ndarray) -> jnp.ndarray:
        """(B, maxlen) item ids → (B, maxlen*L) SID tokens."""
        toks = self._token_table[seqs]  # (B, maxlen, L)
        return toks.reshape(seqs.shape[0], -1)

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        conv = self.converter
        input_ids = self._input_tokens(data[self.ISeq])
        targets = self._token_table[data[self.IPos][:, 0]]  # (B, L)
        decoder_ids = jnp.concatenate(
            [jnp.full((targets.shape[0], 1), conv.pad_id, jnp.int32), targets[:, :-1]],
            axis=1,
        )
        logits = self.seq2seq(input_ids, decoder_ids, deterministic=False)
        from ... import criterions

        weights = (targets != conv.pad_id).astype(jnp.float32)
        rec_loss = criterions.cross_entropy_with_logits(
            logits, targets, weights=weights
        )
        return rec_loss, {"rec_loss": rec_loss}

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        conv = self.converter
        input_ids = self._input_tokens(data[self.ISeq])
        enc_out, enc_mask = self.seq2seq.encode(input_ids)

        trie = (jnp.asarray(conv.allowed), jnp.asarray(conv.next_node),
                jnp.asarray(conv.node_item))
        if not self.remat:
            # cached serving path: cross-attention memory K/V projected
            # once per query instead of per beam × step × layer (the
            # uncached beam loop profiled as 82% of serving time at the
            # reference config — tools/tiger_ablate.py, docs/PERF.md)
            cross_kv = self.seq2seq.precompute_cross_kv(enc_out)
            items, scores = beam_search_cached(
                lambda dec: self.seq2seq.decode_beams(dec, cross_kv, enc_mask),
                input_ids.shape[0], *trie,
                num_beams=self.num_beams,
                max_steps=conv.max_num_sid_tokens + 2,
                start_id=conv.start_id,
                pad_id=conv.pad_id,
            )
        else:  # remat hides the block submodules; use the uncached loop
            items, scores = beam_search(
                lambda d, eo, em: self.seq2seq.decode(d, eo, em),
                enc_out,
                enc_mask,
                *trie,
                num_beams=self.num_beams,
                max_steps=conv.max_num_sid_tokens + 2,
                start_id=conv.start_id,
                pad_id=conv.pad_id,
            )
        B = items.shape[0]
        # scatter raised beam scores over uniform background noise
        # (TIGER/train_t5.py:214-236)
        noise = (
            jax.random.uniform(
                jax.random.PRNGKey(0), (B, self.Item.count + 1)
            )
            * BACKGROUND_SCORE_MAX
        )
        raised = scores - scores.min(axis=1, keepdims=True) + BEAM_SCORE_BASE
        safe_items = jnp.where(items >= 0, items, self.Item.count)
        full = noise.at[jnp.arange(B)[:, None], safe_items].set(raised)
        return full[:, : self.Item.count]

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        """Score each pool candidate's SID block by its sequence
        log-likelihood (TIGER/train_t5.py recommend_from_pool)."""
        conv = self.converter
        input_ids = self._input_tokens(data[self.ISeq])
        enc_out, enc_mask = self.seq2seq.encode(input_ids)
        cands = data[self.IUnseen]  # (B, K)
        B, K = cands.shape
        targets = self._token_table[cands]  # (B, K, L)
        L = targets.shape[-1]
        dec_in = jnp.concatenate(
            [jnp.full((B, K, 1), conv.pad_id, jnp.int32), targets[..., :-1]], axis=-1
        )
        enc_out_b = jnp.repeat(enc_out, K, axis=0)
        enc_mask_b = jnp.repeat(enc_mask, K, axis=0)
        logits = self.seq2seq.decode(
            dec_in.reshape(B * K, L), enc_out_b, enc_mask_b
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = targets.reshape(B * K, L)
        picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        mask = (tgt != conv.pad_id).astype(jnp.float32)
        scores = (picked * mask).sum(-1) / jnp.maximum(mask.sum(-1), 1.0)
        return scores.reshape(B, K)


# tokenizer-stage models route to the stage-A coach through the CLI
# (run.py COACH convention); TIGER itself uses the base Coach
RQVAE.COACH = RQVAECoach
LETTERTokenizer.COACH = LETTERCoach
R3VAE.COACH = RQVAECoach
