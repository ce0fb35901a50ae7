"""DIGER: joint ID-encoder + residual quantizer + code-token T5,
refreshing semantic IDs every epoch.

Reference: DIGER/main.py:78-500 + DIGER/modules.py:60-112 — trainable
item embeddings initialized from semantic features → MLP ID encoder →
Gumbel residual quantizer; T5 predicts the target item's code tokens;
losses combined per step (no alternating cycles, DIGER/main.py:289-330):
rec = w_code·code_loss/(2σ²) + log σ (learned uncertainty) +
w_recon·recon + w_vq·vq; semantic IDs refreshed before each epoch
(DIGER/main.py:78 docstring step 3).

Implementation shares the ETEGRec machinery (code tokens → shared
seq2seq, per-epoch refresh + trie rebuild in the coach)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import criterions
from . import register
from .etegrec import ETEGRec, ETEGRecCoach


@register("DIGER")
class DIGER(ETEGRec):
    # DIGER/main.py defaults where they differ from ETEGRec's
    num_codewords: int = 512
    dropout_rate: float = 0.0
    tokenizer_estimator: str = "gumbel"
    code_loss_weight: float = 1.0
    recon_loss_weight: float = 1.0
    vq_loss_weight: float = 1.0
    sigma_lambda: float = 0.5
    gumbel_tau: float = 2.0

    def setup(self):
        super().setup()
        self.sigma = self.param("sigma", nn.initializers.ones, (1,))

    def fit(self, data, train_id: bool = True, warmed: bool = True):
        item_code = data["item_code"]
        seqs = data[self.ISeq]
        B = seqs.shape[0]

        input_codes = item_code[seqs]
        input_tokens = self._code_tokens(jnp.maximum(input_codes, 0))
        input_tokens = jnp.where(
            (input_codes >= 0) & (seqs != self.PADDING_VALUE)[..., None],
            input_tokens,
            0,
        ).reshape(B, -1)

        targets = data[self.IPos][:, 0]
        label_codes = item_code[targets]
        label_tokens = self._code_tokens(label_codes)
        dec_in = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), label_tokens[:, :-1]], axis=1
        )
        enc_out, enc_mask = self.seq2seq.encode(input_tokens, deterministic=False)
        dec_hidden = self._decode_hidden(dec_in, enc_out, enc_mask, False)
        logits = self._token_logits(dec_hidden)
        code_loss = criterions.cross_entropy_with_logits(logits, label_tokens)

        # learned-uncertainty weighting (DIGER/main.py:326-333)
        sigma = jnp.clip(jnp.abs(self.sigma[0]) + self.sigma_lambda, 1e-6)
        code_loss_u = code_loss / (2 * sigma**2) + jnp.log(sigma)

        target_feats = self.semantic_embedding[targets]
        latents = self.tok_encode(target_feats)
        z_hat, vq_loss, _, _ = self.rq.quantize_with_logits(latents)
        recon_loss = jnp.sum(jnp.square(z_hat - latents)) / latents.shape[0]

        loss = (
            self.code_loss_weight * code_loss_u
            + self.recon_loss_weight * recon_loss
            + self.vq_loss_weight * vq_loss
        )
        return loss, {
            "rec_loss": loss,
            "code_loss": code_loss,
            "recon_loss": recon_loss,
            "vq_loss": vq_loss,
            "sigma": sigma,
        }


class DIGERCoach(ETEGRecCoach):
    """Refreshes semantic IDs before every epoch; JOINT optimization —
    one AdamW over param-group lrs (CoachForDIGER.set_optimizer,
    DIGER/main.py:420-460: t5 @ lr, id tokenizer @ lr_id, sigma @
    lr_sigma) with global-norm clip 1.0 (main.py:475); the item
    embedding table stays frozen (main.py:144-145) and the ID encoder
    freezes under --freeze_id_encoder. --rqvae_path transplants a
    stage-A RQVAE checkpoint into the encoder/codebooks
    (load_id_tokenizer, main.py:164-189)."""

    cycle: int = 1

    def _param_group(self, path) -> str:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "semantic_embedding" in name:
            return "frozen"
        if "sigma" in name.lower():
            return "sigma"
        if name.startswith("rq/") or name.startswith("dec_layers"):
            return "id"
        if name.startswith("enc_layers"):
            return (
                "frozen"
                if bool(self.cfg.get("freeze_id_encoder", False))
                else "id"
            )
        return "rec"

    def set_optimizer(self) -> None:
        import optax

        cfg = self.cfg
        wd = float(cfg.get("weight_decay", 0.0) or 0.0)
        # None-aware fallbacks (an explicit 0.0 freezes the group)
        lr_rec = cfg.get("lr_rec")
        lr_rec = float(cfg.lr if lr_rec in (None, "") else lr_rec)
        lr_id = cfg.get("lr_id")
        lr_id = float(lr_rec if lr_id in (None, "") else lr_id)
        lr_sigma = cfg.get("lr_sigma")
        lr_sigma = float(lr_id if lr_sigma in (None, "") else lr_sigma)

        def branch(lr):
            return optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adamw(lr, weight_decay=wd),
            )

        joint = optax.multi_transform(
            {"rec": branch(lr_rec), "id": branch(lr_id),
             "sigma": branch(lr_sigma), "frozen": optax.set_to_zero()},
            self._label_fn,
        )
        # DIGER is single-phase: both phase slots point at the same
        # joint optimizer so the inherited (phase-keyed) step fns work
        self.rec_optimizer = joint
        self.id_optimizer = joint
        self.optimizer = optax.GradientTransformation(
            init=lambda p: {"rec": joint.init(p), "id": joint.init(p)},
            update=self._template_update,
        )

    def train(self, epoch: int):
        if self.state is not None:
            self.refresh_item_codes()
        self._train_id = True
        self._warmed = True
        return super(ETEGRecCoach, self).train(epoch)

    def post_training(self) -> None:
        """DIGER has no finetune phase (DIGER/main.py fit loop)."""


DIGER.COACH = DIGERCoach
