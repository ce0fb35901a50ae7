"""E4SRec: LLM-backed sequential recommendation with LoRA.

Reference: E4SRec/main.py:63-260 — frozen pretrained item-ID embeddings
→ linear adaptor into the LLM's hidden space, concatenated between
frozen instruction/response prompt embeddings; an 8-bit LLaMA backbone
is frozen with LoRA adapters; last hidden state → linear projection to
item logits, CE; only {adaptor, LoRA, output head} are saved/trained
(E4SRec/main.py:215-260).

Environment note: no pretrained LLaMA weights exist in this zero-egress
image, so the backbone here is a compact decoder-only transformer with
the same wiring — frozen base weights (stop_gradient) + trainable LoRA
A/B on the attention projections — preserving E4SRec's training
protocol (what is frozen vs trained, the prompt sandwich, the output
head). Loading real pretrained weights is a parameter-injection away
(the backbone params are an ordinary flax pytree).

``eight_bit=True`` stores the frozen attention weights as int8 +
per-channel scales (the bitsandbytes ``load_in_8bit`` analogue,
SURVEY.md §2.1) in the non-param ``quant`` collection; LoRA math stays
full precision, exactly like peft-over-8bit. Measured on the v5e at a
512-dim 4-block backbone: +9% step time (41.5 -> 45.2 ms, the
dequant cast) for 4x smaller frozen weights AND no adam moments on
them (params 76.4 -> 59.6 MB trainable + 4.2 MB int8 frozen) — the
trade bitsandbytes makes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import criterions, utils
from ...launcher import Coach
from ...parallel import dist
from ..base import Batch, SeqRecArch
from . import register

_init02 = nn.initializers.normal(stddev=0.02)


class LoRADense(nn.Module):
    """Frozen base Dense + trainable low-rank update (peft-style).

    ``eight_bit=True`` is the bitsandbytes-``load_in_8bit`` analogue
    (E4SRec/main.py:44-61): the frozen base weight is STORED as int8
    with one f32 scale per output channel in the non-param ``quant``
    collection (rides TrainState.stats — the optimizer never sees it,
    checkpoints carry it), and is dequantized on use. The per-column
    scale factors out of the matmul exactly, so the compute is one MXU
    matmul on the int8→float cast plus a columnwise rescale — no
    gather/unpack kernels needed on TPU."""

    features: int
    rank: int = 8
    alpha: float = 16.0
    eight_bit: bool = False

    @nn.compact
    def __call__(self, x):
        A = self.param("lora_A", nn.initializers.normal(0.01), (x.shape[-1], self.rank))
        B = self.param("lora_B", nn.initializers.zeros, (self.rank, self.features))
        if self.eight_bit:
            def init_q():
                w = _init02(self.make_rng("params"), (x.shape[-1], self.features))
                s = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-12)
                return {
                    "q8": jnp.round(w / s).astype(jnp.int8),
                    "scale": s.astype(jnp.float32),
                }
            q = self.variable("quant", "base_kernel", init_q).value
            y = (x @ q["q8"].astype(x.dtype)) * q["scale"].astype(x.dtype)
        else:
            base = self.param("base_kernel", _init02, (x.shape[-1], self.features))
            y = x @ jax.lax.stop_gradient(base)  # frozen pretrained weight
        return y + (x @ A) @ B * (self.alpha / self.rank)


class DecoderBlock(nn.Module):
    dim: int
    num_heads: int
    lora_rank: int
    eight_bit: bool = False

    @nn.compact
    def __call__(self, x, attn_mask):
        H, hd = self.num_heads, self.dim // self.num_heads
        h = nn.LayerNorm()(x)
        q = LoRADense(self.dim, self.lora_rank, eight_bit=self.eight_bit,
                      name="q_proj")(h)
        k = LoRADense(self.dim, self.lora_rank, eight_bit=self.eight_bit,
                      name="k_proj")(h)
        v = LoRADense(self.dim, self.lora_rank, eight_bit=self.eight_bit,
                      name="v_proj")(h)
        B, L, _ = x.shape
        qh = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / (hd**0.5)
        scores = scores + attn_mask
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, self.dim)
        x = x + LoRADense(self.dim, self.lora_rank, eight_bit=self.eight_bit,
                          name="o_proj")(ctx)
        h = nn.LayerNorm()(x)
        f = nn.Dense(self.dim * 4, kernel_init=_init02, name="up")(h)
        f = nn.silu(f)
        f = nn.Dense(self.dim, kernel_init=_init02, name="down")(f)
        # FFN weights are backbone weights: frozen at the OPTIMIZER level
        # (trainable_labels), gradients still flow through activations
        return x + f


@register("E4SRec")
class E4SRec(SeqRecArch):
    item_features: Optional[np.ndarray] = None  # frozen pretrained ID embds
    maxlen: int = 50
    backbone_dim: int = 128
    num_blocks: int = 2
    num_heads: int = 4
    lora_rank: int = 16
    # bitsandbytes load_in_8bit analogue: int8 backbone attention weights
    eight_bit: bool = False
    num_prompt_tokens: int = 4  # instruction sandwich length
    num_response_tokens: int = 2

    def setup(self):
        feats = np.asarray(self.item_features, np.float32)
        feats = np.concatenate(
            [np.zeros((self.NUM_PADS, feats.shape[1]), np.float32), feats], axis=0
        )
        self._feats = jnp.asarray(feats)
        self.adaptor = nn.Dense(self.backbone_dim, kernel_init=_init02)
        # frozen prompt embeddings (stand-ins for tokenized instructions)
        self.instruct_embds = self.param(
            "instruct_embds", _init02, (self.num_prompt_tokens, self.backbone_dim)
        )
        self.response_embds = self.param(
            "response_embds", _init02, (self.num_response_tokens, self.backbone_dim)
        )
        self.blocks = [
            DecoderBlock(self.backbone_dim, self.num_heads, self.lora_rank,
                         self.eight_bit, name=f"block_{i}")
            for i in range(self.num_blocks)
        ]
        self.final_ln = nn.LayerNorm()
        self.output_proj = nn.Dense(
            self.Item.count + self.NUM_PADS, use_bias=False, kernel_init=_init02
        )

    def sure_trainpipe(self, maxlen: int, batch_size: int):
        return (
            self.dataset.train()
            .shuffled_roll_seqs_source(maxlen=maxlen, keep_at_least_itself=True)
            .seq_train_yielding_pos_(start_idx_for_target=-1, end_idx_for_input=-1)
            .add_(offset=self.NUM_PADS, modified_fields=(self.ISeq, self.IPos))
            .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def encode(self, data: Batch) -> jnp.ndarray:
        seqs = data[self.ISeq]
        B, L = seqs.shape
        seq_embds = self.adaptor(self._feats[seqs])  # (B, L, D)
        instruct = jax.lax.stop_gradient(self.instruct_embds)[None].repeat(B, 0)
        response = jax.lax.stop_gradient(self.response_embds)[None].repeat(B, 0)
        x = jnp.concatenate([instruct, seq_embds, response], axis=1)
        total = x.shape[1]
        valid = jnp.concatenate(
            [
                jnp.ones((B, self.num_prompt_tokens), bool),
                seqs != self.PADDING_VALUE,
                jnp.ones((B, self.num_response_tokens), bool),
            ],
            axis=1,
        )
        causal = jnp.tril(jnp.ones((total, total), bool))
        mask = jnp.where(
            valid[:, None, None, :] & causal[None, None], 0.0, -1e4
        )
        for block in self.blocks:
            x = block(x, mask)
        return self.final_ln(x)[:, -1]

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        user = self.encode(data)
        logits = self.output_proj(user)
        rec_loss = criterions.cross_entropy_with_logits(
            logits, data[self.IPos][:, 0]
        )
        return rec_loss, {"rec_loss": rec_loss}

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        user = self.encode(data)
        return self.output_proj(user)[:, self.NUM_PADS :]

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        scores = self.recommend_from_full(data)
        return jnp.take_along_axis(scores, data[self.IUnseen], axis=1)

    def trainable_labels(self, params) -> Any:
        """'trainable' for adaptor/LoRA/output head, 'frozen' elsewhere —
        the E4SRec protocol (only these are optimized/saved,
        E4SRec/main.py:215-246). Use with optax.multi_transform."""

        def label(path, leaf):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            trainable = (
                "adaptor" in name
                or "lora_" in name
                or "output_proj" in name
                or "LayerNorm" in name
            )
            return "trainable" if trainable else "frozen"

        return jax.tree_util.tree_map_with_path(label, params)


class E4SRecCoach(Coach):
    """Saves/loads ONLY the trainable subset (adaptor / LoRA / output
    head / LayerNorms) — the E4SRec persistence protocol
    (E4SRec/main.py:215-246): the frozen backbone is reconstructable
    from the pretrained checkpoint, so model.pkl/best.pkl stay tiny.
    Loading merges the saved subset over freshly built params and
    synchronizes, mirroring the reference's load + barrier."""

    def _trainable_mask(self):
        labels = self.get_res_sys_arch().trainable_labels(self.state.params)
        return jax.tree.map(lambda l: l == "trainable", labels)

    @dist.main_process_only
    def save(self, filename=None, best=False) -> None:
        import os

        import numpy as np

        cfg = self.cfg
        utils.mkdirs(cfg.CHECKPOINT_PATH)
        filename = filename or (
            cfg.BEST_FILENAME if best else cfg.SAVED_FILENAME
        )
        mask = self._trainable_mask()
        subset = jax.tree.map(
            lambda p, keep: np.asarray(p) if keep else None,
            self.state.params,
            mask,
        )
        payload = {"params": subset, "partial": True}
        # non-param collections (the int8 `quant` base weights) are NOT
        # re-derivable from the trainable subset — persist them so
        # serving/resume does not depend on replaying the init seed
        if self.state.stats:
            payload["stats"] = jax.tree.map(np.asarray, self.state.stats)
        utils.export_pickle(
            payload, os.path.join(cfg.CHECKPOINT_PATH, filename)
        )

    def load(self, path=None, filename=None) -> None:
        import os

        cfg = self.cfg
        payload = utils.import_pickle(
            os.path.join(path or cfg.CHECKPOINT_PATH, filename or cfg.SAVED_FILENAME)
        )
        if not payload.get("partial"):
            return super().load(path, filename)
        self._ensure_state()
        merged = jax.tree.map(
            lambda cur, new: cur if new is None else jnp.asarray(new),
            self.state.params,
            payload["params"],
            is_leaf=lambda x: x is None,
        )
        from ...launcher.coach import TrainState

        stats = self.state.stats
        if payload.get("stats"):
            stats = jax.tree.map(jnp.asarray, payload["stats"])
        self.state = TrainState(
            merged, self.state.opt_state, self.state.step, stats
        )
        dist.synchronize()


E4SRec.COACH = E4SRecCoach
