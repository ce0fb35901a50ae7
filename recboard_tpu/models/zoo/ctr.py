"""CTR prediction models: DeepFM and DCN.

Reference: DeepFM/main.py:34-200 (LogisticRegression + inner-product FM
block + DNN; per-field EMBED embeddings, dense fields via Linear(1→D);
`marked_params` separates embedding weight decay), DCN/main.py:35-135
(CrossNet layers x0·(w·xi)+b + DNN → concat → fc). BCE loss on Label;
pool-style eval with AUC/LOGLOSS monitors (configs for Criteo/Frappe
BARS).

TPU note: all field embeddings gather into one (B, F, D) tensor so the
FM bi-interaction and DNN run as dense batched matmuls on the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ... import criterions
from ...data.tags import EMBED, LABEL, SPARSE
from ..base import Batch, PredRecArch
from ...launcher import Coach
from ... import utils
from ..modules import TorchBatchNorm, xavier_normal
from . import register

_emb_init = nn.initializers.normal(stddev=1e-4)


class FieldEmbeddings(nn.Module):
    """Per-field embeddings to a common dim: sparse ids → Embed rows,
    dense scalars → Linear(1→D) (DeepFM/main.py:140-151)."""

    fields: tuple  # of Field
    dim: int

    @nn.compact
    def __call__(self, data: Batch) -> jnp.ndarray:
        outs = []
        for field in self.fields:
            v = data[field]
            if field.match(SPARSE) or field.match(EMBED) or field.count is not None:
                e = nn.Embed(
                    field.count, self.dim, embedding_init=_emb_init,
                    name=f"embeddings_{field.name}",
                )(v)
            else:
                e = nn.Dense(
                    self.dim, use_bias=False, kernel_init=xavier_normal,
                    name=f"embeddings_{field.name}",
                )(v[..., None].astype(jnp.float32))
            outs.append(e[:, None, :])
        return jnp.concatenate(outs, axis=1)  # (B, F, D)


class _PredBase(PredRecArch):
    def sure_trainpipe(self, batch_size: int):
        return (
            self.dataset.train().shuffled_inter_source().batch_(batch_size).tensor_()
        )

    @property
    def input_fields(self):
        return tuple(self.fields.match_not(LABEL))

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        return self.recommend_from_pool(data, buffers)


@register("DeepFM")
class DeepFM(_PredBase):
    embedding_dim: int = 10
    hidden_dims: Tuple[int, ...] = (400, 400, 400)
    hidden_dropout_rate: float = 0.1
    batch_norm: bool = False

    def setup(self):
        self.embeddings = FieldEmbeddings(self.input_fields, self.embedding_dim)
        self.lr_embeddings = FieldEmbeddings(self.input_fields, 1)
        self.lr_bias = self.param("lr_bias", nn.initializers.zeros, (1,))
        self.dnn_layers = [
            nn.Dense(h, kernel_init=xavier_normal) for h in self.hidden_dims
        ]
        # reference MLPBlock: linear -> BatchNorm -> ReLU -> dropout
        # (DeepFM/main.py:104-120; batch_norm: True in both BARS configs)
        self.dnn_norms = [
            TorchBatchNorm() if self.batch_norm else None
            for _ in self.hidden_dims
        ]
        self.dnn_out = nn.Dense(1, kernel_init=xavier_normal)
        self.dropout = nn.Dropout(self.hidden_dropout_rate)

    def _logits(self, data: Batch, deterministic: bool = True) -> jnp.ndarray:
        x = self.embeddings(data)  # (B, F, D)
        # FM: LR first-order + inner-product second-order
        lr = self.lr_embeddings(data).sum(axis=(1, 2)) + self.lr_bias[0]  # (B,)
        sum_sq = jnp.square(x.sum(axis=1))
        sq_sum = jnp.square(x).sum(axis=1)
        fm = 0.5 * (sum_sq - sq_sum).sum(axis=-1)  # (B,)
        # DNN on flattened embeddings
        h = x.reshape(x.shape[0], -1)
        for layer, norm in zip(self.dnn_layers, self.dnn_norms):
            h = layer(h)
            if norm is not None:
                h = norm(h, use_running_average=deterministic)
            h = nn.relu(h)
            h = self.dropout(h, deterministic=deterministic)
        dnn = self.dnn_out(h)[:, 0]
        return lr + fm + dnn

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        logits = self._logits(data, deterministic=False)
        labels = data[self.Label].astype(jnp.float32)
        loss = criterions.bce_with_logits(logits, labels)
        return loss, {"rec_loss": loss}

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        return nn.sigmoid(self._logits(data))


@register("DCN")
class DCN(_PredBase):
    embedding_dim: int = 4
    hidden_dims: Tuple[int, ...] = (400, 400, 400)
    num_layers: int = 3
    hidden_dropout_rate: float = 0.0
    batch_norm: bool = False

    def setup(self):
        self.embeddings = FieldEmbeddings(self.input_fields, self.embedding_dim)
        input_dim = len(self.input_fields) * self.embedding_dim
        self.cross_ws = [
            nn.Dense(1, use_bias=False, kernel_init=xavier_normal, name=f"cross_w_{i}")
            for i in range(self.num_layers)
        ]
        self.cross_bs = [
            self.param(f"cross_b_{i}", nn.initializers.zeros, (input_dim,))
            for i in range(self.num_layers)
        ]
        self.dnn_layers = [
            nn.Dense(h, kernel_init=xavier_normal) for h in self.hidden_dims
        ]
        # DCN/main.py:50-70 MLPBlock: linear -> BatchNorm -> ReLU ->
        # dropout (batch_norm: True in the Frappe BARS config)
        self.dnn_norms = [
            TorchBatchNorm() if self.batch_norm else None
            for _ in self.hidden_dims
        ]
        self.fc = nn.Dense(1, kernel_init=xavier_normal)
        self.dropout = nn.Dropout(self.hidden_dropout_rate)

    def _logits(self, data: Batch, deterministic: bool = True) -> jnp.ndarray:
        x0 = self.embeddings(data)
        x0 = x0.reshape(x0.shape[0], -1)
        xi = x0
        # CrossNet without residual: xi = w(xi)·x0 + b (DCN/main.py:45,156-158)
        for w, b in zip(self.cross_ws, self.cross_bs):
            xi = w(xi) * x0 + b
        h = x0
        for layer, norm in zip(self.dnn_layers, self.dnn_norms):
            h = layer(h)
            if norm is not None:
                h = norm(h, use_running_average=deterministic)
            h = nn.relu(h)
            h = self.dropout(h, deterministic=deterministic)
        return self.fc(jnp.concatenate([h, xi], axis=-1))[:, 0]

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        logits = self._logits(data, deterministic=False)
        labels = data[self.Label].astype(jnp.float32)
        loss = criterions.bce_with_logits(logits, labels)
        return loss, {"rec_loss": loss}

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        return nn.sigmoid(self._logits(data))


class CTRCoach(Coach):
    """The reference CTR Coach behaviors (DeepFM/main.py:187-258):

    * per-group weight decay — parameters whose path contains
      'embeddings' decay by ``cfg.embedding_decay`` (0.05 in the DeepFM
      BARS configs), everything else by ``cfg.weight_decay`` — torch
      Adam placement (decay coupled into the gradient before moments);
    * ReduceLROnPlateau on the best metric: when which4best has not
      improved for ``patience`` further evaluations, lr *= factor and
      the train step recompiles with the new constant (adam moments are
      lr-independent, so optimizer state carries over exactly as
      torch's scheduler does).
    """

    def set_optimizer(self) -> None:
        import jax as _jax
        import optax

        cfg = self.cfg
        ed = cfg.get("embedding_decay", None)
        self._current_lr = getattr(self, "_current_lr", float(cfg.lr))
        if ed is None:
            # the plateau drop must survive the fallback path too: the
            # base set_optimizer builds from cfg.lr, so feed it the
            # current (possibly plateau-decayed) lr
            orig_lr = cfg.lr
            try:
                cfg.lr = self._current_lr
                return super().set_optimizer()
            finally:
                cfg.lr = orig_lr
        # a non-plateau schedule (cosine/step/...) set by set_lr_scheduler
        # takes precedence over the constant current lr, exactly as the
        # base Coach does
        lr = (
            self.lr_schedule
            if getattr(self, "lr_schedule", None)
            else self._current_lr
        )
        b1 = float(cfg.get("optim_first_moment_decay", 0.9))
        b2 = float(cfg.get("optim_second_moment_decay", 0.999))
        wd = float(cfg.get("weight_decay", 0.0) or 0.0)

        def branch(decay: float):
            chain = []
            if decay:
                chain.append(optax.add_decayed_weights(decay))
            chain.append(optax.scale_by_adam(b1=b1, b2=b2))
            chain.append(optax.scale_by_learning_rate(lr))
            return optax.chain(*chain)

        def label_fn(params):
            def label(path, _):
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                return "embed" if "embeddings" in name else "other"

            return _jax.tree_util.tree_map_with_path(label, params)

        self.optimizer = optax.multi_transform(
            {"embed": branch(float(ed)), "other": branch(wd)}, label_fn
        )

    def train(self, epoch: int):
        spec = self.cfg.get("lr_scheduler") or {}
        kind = str(spec.get("which", spec.get("name", "plateau"))).lower()
        if spec and kind in ("plateau", "reducelronplateau"):
            patience = int(spec.get("patience", self.cfg.get("eval_freq", 1)))
            factor = float(spec.get("factor", 0.1))
            min_lr = float(spec.get("min_lr", 0.0) or 0.0)
            stalls = getattr(self, "_stopping_steps", 0)
            if stalls == 0:
                # metric improved since the last eval: a fresh plateau
                # must trigger its own drop (torch ReduceLROnPlateau
                # resets num_bad_epochs on improvement)
                self._last_lr_drop = -1
            cur = getattr(self, "_current_lr", float(self.cfg.lr))
            if (
                stalls > 0
                and stalls % max(patience, 1) == 0
                and stalls != getattr(self, "_last_lr_drop", -1)
                and cur > min_lr
            ):
                self._last_lr_drop = stalls
                self._current_lr = max(cur * factor, min_lr)
                utils.infoLogger(
                    f"[Coach] >>> plateau: lr -> {self._current_lr:.3e}"
                )
                self.set_optimizer()
                self._train_step_fn = None  # recompile with the new lr
        return super().train(epoch)

    def set_lr_scheduler(self) -> None:
        # plateau is handled in train(); other kinds fall back
        spec = self.cfg.get("lr_scheduler") or {}
        kind = str(spec.get("which", spec.get("name", "plateau"))).lower()
        if spec and kind not in ("plateau", "reducelronplateau"):
            return super().set_lr_scheduler()
        self.lr_schedule = None


DeepFM.COACH = CTRCoach
DCN.COACH = CTRCoach
