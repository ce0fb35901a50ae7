"""Coach — the training loop / evaluation / persistence engine.

freerec parity (SURVEY.md §2.5, lifecycle shape proven by the faithful
override in ETEGRec/train_etegrec.py:625-652):

    fit(): resume() → per epoch: train(epoch) → save_checkpoint per
    CHECKPOINT_FREQ → valid/test per eval_freq (may raise
    EarlyStopError on which4best stalling) → save_last() → load best →
    test → summary() → eval at best → easy_record_best() → results.

Evaluation follows Coach.evaluate's base behavior (mirrored at
UniSRec/main.py:400-447): reset_ranking_buffers → per batch
`model(data, ranking="full"|"pool")`, full ranking masks seen items to
-1e23 unless `retain_seen`, targets from IUnseen, metric sink
`monitor(..., pool=["HITRATE", "PRECISION", "RECALL", "NDCG", "MRR"])`.

TPU-native engine underneath:
* the train step is one jitted, donated function (grads + optax update
  + metrics in a single XLA program); batches stream through a
  background prefetch thread and land sharded over the `data` mesh axis;
* evaluation densifies ragged seen/unseen lists into padded id arrays
  (bucketed to limit recompiles), builds the seen mask by on-device
  scatter (OOB indices dropped), and computes all rank metrics from one
  top-K pass (launcher/metrics.py);
* checkpointing serializes numpy-ified pytrees; rank-0-only writes with
  barriers mirror freerec.ddp discipline (E4SRec/main.py:224-258).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import utils
from ..data.fields import Field
from ..data.pipes import Size
from ..data.tags import LABEL, SEEN, TaskTag, UNSEEN
from ..parallel import dist, mesh as mesh_lib
from . import metrics as metrics_lib

__all__ = ["Coach", "EarlyStopError", "TrainState"]


class EarlyStopError(Exception):
    """Raised by evaluate() when which4best stalls for
    early_stop_patience evaluations (freerec.launcher.EarlyStopError)."""


class TrainState:
    """Minimal functional train state (params, opt_state, step, stats).

    ``stats`` holds non-param variable collections (``batch_stats`` for
    BatchNorm running averages — DeepFM/DCN with ``batch_norm: True``,
    the reference's Criteo/Frappe configs). Empty for everything else."""

    def __init__(self, params, opt_state, step=0, stats=None):
        self.params = params
        self.opt_state = opt_state
        self.step = step
        self.stats = {} if stats is None else stats

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step, self.stats), None

    @classmethod
    def tree_unflatten(cls, _, leaves):
        return cls(*leaves)


jax.tree_util.register_pytree_node_class(TrainState)


def _is_array(v) -> bool:
    return isinstance(v, (np.ndarray, jax.Array))


def _bucket(n: int, base: int = 16) -> int:
    """Next power-of-two-ish bucket ≥ n to bound recompiles."""
    out = base
    while out < n:
        out *= 2
    return out


class Coach:
    """Universal trainer. Constructor takes **kwargs (UniSRec passes
    `datasets=` instead of `dataset=`, UniSRec/main.py:469)."""

    def __init__(
        self,
        dataset=None,
        trainpipe=None,
        validpipe=None,
        testpipe=None,
        model=None,
        cfg=None,
        **kwargs,
    ):
        self.dataset = dataset
        self.trainpipe = trainpipe
        self.validpipe = validpipe
        self.testpipe = testpipe
        self.model = model
        self.cfg = cfg
        for key, value in kwargs.items():
            setattr(self, key, value)

        self.mesh = mesh_lib.make_mesh(int(cfg.get("num_model_shards", 1)))
        self.remove_seen = not bool(cfg.get("retain_seen", False))
        self.ranking = cfg.get("ranking", "full")

        # monitor sink state (SURVEY.md §5.5)
        self._meters: Dict[str, Dict[str, utils.AverageMeter]] = {}
        self.history: Dict[str, List[Dict[str, float]]] = {
            "train": [],
            "valid": [],
            "test": [],
        }
        self._registered: Dict[str, Callable] = {}
        self._best_casters: Dict[str, Callable] = {}

        # early stopping state (ETEGRec/train_etegrec.py:576-582)
        self.which4best = str(cfg.get("which4best", "NDCG@10"))
        base, k = metrics_lib.parse_monitor(self.which4best)
        self._best_key = metrics_lib.fmt_metric(base, k)
        # smaller-is-better for any *LOSS metric (LOSS, LOGLOSS,
        # RECON_LOSS, ...) and rates; register_metric can override
        self._best_caster = (
            min if base.endswith("LOSS") or base == "COLLISION_RATE" else max
        )
        self._best: Optional[float] = None
        self._best_epoch = -1
        self._stopping_steps = 0
        self._early_stop_patience = int(cfg.get("early_stop_patience", 1e9) or 1e9)

        self.state: Optional[TrainState] = None
        self._rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
        self._jit_cache: Dict[Any, Callable] = {}
        self._eval_cache: Dict[Any, Any] = {}
        self.start_epoch = 0
        self._wanted = self._parse_monitors(cfg.get("monitors", []))

        self.set_optimizer()
        self.set_lr_scheduler()
        self.set_other()

    # ------------------------------------------------------------- hooks
    def set_optimizer(self) -> None:
        """Default optimizers sgd/adam/adamw with torch-matching
        weight-decay placement (LightGCN/main.py:131-154)."""
        cfg = self.cfg
        lr = self.lr_schedule if getattr(self, "lr_schedule", None) else cfg.lr
        name = str(cfg.get("optimizer", "adam")).lower()
        wd = float(cfg.get("weight_decay", 0.0) or 0.0)
        b1 = float(cfg.get("optim_first_moment_decay", 0.9))
        b2 = float(cfg.get("optim_second_moment_decay", 0.999))
        chain = []
        if name == "sgd":
            if wd:
                chain.append(optax.add_decayed_weights(wd))
            mom = b1 if b1 else None
            chain.append(
                optax.sgd(lr, momentum=mom, nesterov=bool(cfg.get("nesterov", False)))
            )
        elif name == "adam":
            # torch Adam couples wd into the gradient before the moments
            if wd:
                chain.append(optax.add_decayed_weights(wd))
            chain.append(optax.adam(lr, b1=b1, b2=b2))
        elif name == "adamw":
            chain.append(optax.adamw(lr, b1=b1, b2=b2, weight_decay=wd))
        else:
            raise ValueError(f"unknown optimizer {name!r}")
        self.optimizer = optax.chain(*chain)

    def set_lr_scheduler(self) -> None:
        """Maps a cfg.lr_scheduler dict onto an optax schedule; override
        for custom schedules (DeepFM/main.py:251-254)."""
        spec = self.cfg.get("lr_scheduler", None)
        self.lr_schedule = None
        if not spec:
            return
        kind = str(spec.get("which", spec.get("name", ""))).lower()
        lr = float(self.cfg.lr)
        if kind in ("cosine", "cosineannealing"):
            steps = int(spec.get("T_max", self.cfg.epochs)) * max(
                1, int(spec.get("steps_per_epoch", 1))
            )
            self.lr_schedule = optax.cosine_decay_schedule(lr, steps)
        elif kind in ("step", "steplr"):
            step = int(spec.get("step_size", 10))
            gamma = float(spec.get("gamma", 0.1))
            self.lr_schedule = optax.exponential_decay(
                lr, transition_steps=step, decay_rate=gamma, staircase=True
            )
        elif kind in ("warmup_cosine", "warmupcosine"):
            warm = int(spec.get("warmup_steps", 100))
            total = int(spec.get("total_steps", 10000))
            self.lr_schedule = optax.warmup_cosine_decay_schedule(
                0.0, lr, warm, total
            )
        elif kind == "linear":
            # transformers get_scheduler("linear"): warmup to lr then
            # linear decay to 0 over training (ETEGRec/configs/rqvae
            # uses warmup_epochs; steps estimated from the train split)
            spe = max(
                1,
                len(self.dataset.train())
                // max(int(self.cfg.get("batch_size", 1)), 1),
            )
            warm = int(
                spec.get(
                    "warmup_steps",
                    int(spec.get("warmup_epochs", 0)) * spe,
                )
            )
            total = int(spec.get("total_steps", int(self.cfg.epochs) * spe))
            total = max(total, warm + 1)
            self.lr_schedule = optax.join_schedules(
                [optax.linear_schedule(0.0, lr, max(warm, 1)),
                 optax.linear_schedule(lr, 0.0, total - warm)],
                [max(warm, 1)],
            )
        if self.lr_schedule is not None:
            self.set_optimizer()

    def set_other(self) -> None:
        """Custom metrics/state hook (TIGER/train_rqvae.py:224-230)."""

    def post_training(self) -> None:
        """Extra phase after the main epoch loop, before the final evals
        (override point; ETEGRecCoach's code-loss finetune)."""

    # ------------------------------------------------------- rank helpers
    def get_res_sys_arch(self):
        """DDP-unwrap analogue — the model itself (E4SRec/main.py:228)."""
        return self.model

    def dict_to_device(self, data: Dict[Field, Any]) -> Dict[Field, Any]:
        arrays = {
            f: v for f, v in data.items() if _is_array(v) and f != Size
        }
        put = jax.device_put(arrays, mesh_lib.data_sharding(self.mesh))
        out = dict(data)
        out.update(put)
        return out

    # ----------------------------------------------------------- monitor
    def _parse_monitors(self, names: Iterable[str]) -> List[Tuple[str, int]]:
        return [metrics_lib.parse_monitor(n) for n in names]

    def monitor(
        self, *values, n: int = 1, reduction: str = "mean", mode: str = "train",
        pool: Optional[List[str]] = None,
    ) -> None:
        """Metric sink (`monitor(loss, n=B, mode="train", pool=["LOSS"])`
        — SASRec/main.py:252-258)."""
        pool = pool or []
        meters = self._meters.setdefault(mode, {})
        for name, value in zip(pool, values):
            base, k = metrics_lib.parse_monitor(name)
            key = metrics_lib.fmt_metric(base, k)
            meter = meters.setdefault(key, utils.AverageMeter(key))
            if reduction == "mean":
                meter.update(float(value), n)
            else:
                meter.update(float(value), 1)

    def register_metric(
        self, name: str, fn: Optional[Callable] = None, best_caster=max
    ) -> None:
        base, k = metrics_lib.parse_monitor(name)
        key = metrics_lib.fmt_metric(base, k)
        self._registered[key] = fn or (lambda x: x)
        self._best_casters[key] = best_caster

    def _flush(self, mode: str, epoch: int) -> Dict[str, float]:
        meters = self._meters.pop(mode, {})
        summary = {name: meter.avg for name, meter in meters.items()}
        if summary:
            summary["epoch"] = epoch
            self.history[mode].append(summary)
            pretty = "  ".join(
                f"{k}: {v:.5f}" for k, v in summary.items() if k != "epoch"
            )
            utils.infoLogger(f"[Coach] >>> [{mode:>5}] epoch {epoch:<4d} {pretty}")
        return summary

    # ------------------------------------------------------ train engine
    def _init_state(self, batch: Dict[Field, Any]) -> None:
        if self.state is not None:
            return
        self._rng, init_rng, drop_rng = jax.random.split(self._rng, 3)
        arrays = {
            f: jnp.asarray(v)
            for f, v in batch.items()
            if _is_array(v) and f != Size
        }
        # init under jit: eager per-op dispatch is slow over the axon
        # tunnel and some ops (unjitted rfft) are UNIMPLEMENTED on the
        # experimental TPU backend — FFT models would crash at init
        variables = jax.jit(self.model.init)(
            {"params": init_rng, "dropout": drop_rng, "sampling": drop_rng}, arrays
        )
        params = variables["params"]
        # host-side data-dependent re-init hook (k-means codebooks:
        # LETTER/quantizer.py:34-58, R3-VAE/train_r3vae.py:88-98) — runs
        # once, right after param init, before sharding/optimizer init
        post = getattr(self.get_res_sys_arch(), "post_init_params", None)
        if post is not None:
            params = post(params)
        # non-param collections (BatchNorm running stats) ride TrainState
        stats = {k: v for k, v in variables.items() if k != "params"}
        rules = self.model.partition_rules()
        specs = mesh_lib.match_partition_rules(rules, params)
        if int(self.cfg.get("num_model_shards", 1)) > 1:
            # shape leaves as np arrays: tuple leaves would be flattened
            # by later jax.tree.map calls over (params, logical)
            logical = jax.tree.map(
                lambda p: np.asarray(np.shape(p)), params
            )
            params = mesh_lib.shard_params(self.mesh, params, specs)
            # non-dividing vocabs were auto-padded to shard; remember
            # the logical shapes so cast_compute slices the pad rows
            # back off before every flax apply (flax validates param
            # shapes at apply; grads of the slice flow zeros into the
            # pad rows so masters/moments stay padded and sharded)
            if any(
                np.shape(p) != tuple(s)
                for p, s in zip(jax.tree.leaves(params),
                                jax.tree.leaves(logical))
            ):
                self._logical_shapes = logical
        opt_state = self.optimizer.init(params)
        self.state = TrainState(params, opt_state, jnp.asarray(0, jnp.int32), stats)
        n_params = sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(params))
        utils.infoLogger(f"[Coach] >>> model initialized: {n_params:,} params")

    def cast_compute(self, params):
        """Mixed precision without touching model code: float params are
        cast to cfg.compute_dtype inside the differentiated function, so
        every matmul/activation runs in (say) bfloat16 while gradients
        flow through the cast back into float32 master params and
        optimizer state. Models keep f32 where it matters via
        ``preferred_element_type`` on their scoring einsums. Default
        float32 = reference parity (the reference trains f32 end to
        end); flip with --compute-dtype bfloat16.

        Also the unpad seam for auto-padded sharded vocab tables
        (mesh.shard_params): pad rows are sliced off here so flax's
        apply-time shape validation always sees the logical shapes."""
        logical = getattr(self, "_logical_shapes", None)
        if logical is not None:
            try:
                params = jax.tree.map(
                    lambda p, s: p[: int(s[0])]
                    if np.ndim(p) >= 1 and np.shape(p) != tuple(s)
                    else p,
                    params, logical,
                )
            except ValueError:
                pass  # foreign tree (transplants/crosschecks): no pads
        dt = str(self.cfg.get("compute_dtype", "float32") or "float32")
        if dt in ("float32", "f32"):
            return params
        target = jnp.dtype(dt)
        return jax.tree.map(
            lambda p: p.astype(target)
            if hasattr(p, "dtype") and jnp.issubdtype(p.dtype, jnp.floating)
            else p,
            params,
        )

    def loss_of(self, params, batch, rng):
        """Override point: scalar loss + log dict for one batch."""
        loss, logs = self.model.apply(
            {"params": self.cast_compute(params)},
            batch,
            method="fit",
            rngs={"dropout": rng, "sampling": jax.random.fold_in(rng, 1)},
        )
        return loss, logs

    def loss_of_with_stats(self, params, stats, batch, rng):
        """Stats-aware loss: mutable non-param collections (BatchNorm
        running averages) update inside the step and thread back out as
        part of the aux. Used instead of ``loss_of`` whenever the model
        initialized any non-param collection."""
        (loss, logs), new_stats = self.model.apply(
            {"params": self.cast_compute(params), **stats},
            batch,
            method="fit",
            rngs={"dropout": rng, "sampling": jax.random.fold_in(rng, 1)},
            mutable=list(stats.keys()),
        )
        return loss, (logs, new_stats)

    def _loss_and_grad(self, params, stats, batch, rng, has_stats):
        """One differentiated forward: (loss, logs, new_stats, grads).
        Routes through ``loss_of`` (the documented override point) when
        the model has no non-param collections, else through
        ``loss_of_with_stats``."""
        if has_stats:
            def fn(p):
                return self.loss_of_with_stats(p, stats, batch, rng)

            (loss, (logs, new_stats)), grads = jax.value_and_grad(
                fn, has_aux=True
            )(params)
            return loss, logs, new_stats, grads

        def fn(p):
            return self.loss_of(p, batch, rng)

        (loss, logs), grads = jax.value_and_grad(fn, has_aux=True)(params)
        return loss, logs, stats, grads

    def _check_stats_override(self, has_stats: bool) -> None:
        """A subclass that customizes loss_of but not loss_of_with_stats
        would silently train with the WRONG loss for stats-bearing
        models (BatchNorm, eight_bit) — fail loudly instead."""
        if (
            has_stats
            and type(self).loss_of is not Coach.loss_of
            and type(self).loss_of_with_stats is Coach.loss_of_with_stats
        ):
            raise NotImplementedError(
                f"{type(self).__name__} overrides loss_of but the model "
                "initialized non-param collections (BatchNorm running "
                "stats / quantized weights) — override loss_of_with_stats "
                "too, or the custom loss would be silently bypassed"
            )

    def _make_train_step(self):
        accum = max(1, int(self.cfg.get("gradient_accumulation_steps", 1)))
        has_stats = bool(jax.tree.leaves(self.state.stats)) if self.state else False
        self._check_stats_override(has_stats)

        def step(state: TrainState, batch, rng):
            if accum == 1:
                loss, logs, new_stats, grads = self._loss_and_grad(
                    state.params, state.stats, batch, rng, has_stats
                )
            else:
                # microbatch scan over the leading-axis split; stats
                # thread sequentially through the carry (each microbatch
                # updates running stats like accum sequential forwards)
                def micro(carry, mb):
                    grads_acc, loss_sum, stats = carry
                    l, lg, stats, g = self._loss_and_grad(
                        state.params, stats, mb, rng, has_stats
                    )
                    return (
                        jax.tree.map(jnp.add, grads_acc, g),
                        loss_sum + l,
                        stats,
                    ), lg

                split = jax.tree.map(
                    lambda x: x.reshape(accum, x.shape[0] // accum, *x.shape[1:]),
                    batch,
                )
                zeros = jax.tree.map(jnp.zeros_like, state.params)
                (grads, loss, new_stats), logs = jax.lax.scan(
                    micro, (zeros, 0.0, state.stats), split
                )
                grads = jax.tree.map(lambda g: g / accum, grads)
                loss = loss / accum
                logs = jax.tree.map(lambda x: x.mean(), logs)

            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(params, opt_state, state.step + 1, new_stats),
                loss,
                logs,
            )

        return jax.jit(step, donate_argnums=0)

    @property
    def dataloader(self):
        return self._active_pipe

    def train(self, epoch: int) -> Dict[str, float]:
        self.trainpipe.set_seed(int(self.cfg.seed))
        self.trainpipe.set_epoch(epoch)
        self._active_pipe = self.trainpipe
        # tracing hook (SURVEY.md §5.1): --profile <dir> captures a
        # jax.profiler trace of epoch 1 for xprof/tensorboard
        profile_dir = self.cfg.get("profile")
        if profile_dir and epoch == 1 and dist.is_main_process():
            with jax.profiler.trace(str(profile_dir)):
                self.train_per_epoch(epoch)
            return self._flush("train", epoch)
        self.train_per_epoch(epoch)
        if self.state is None:
            raise RuntimeError(
                "trainpipe produced no batches — check the dataset/pipe chain"
            )
        return self._flush("train", epoch)

    def _device_train_epoch(self, epoch: int) -> None:
        """Hot loop for on-device samplers (data/device.py): sampling is
        folded INTO the jitted step, and steps are SCAN-CHUNKED so the
        host dispatches ceil(S/W) programs per epoch instead of S.

        Per-step dispatch was the wall at reference scale: the jitted
        SASRec step is ~3 ms but each dispatch costs tens of ms of
        host+tunnel overhead, and roll-window samplers run hundreds of
        steps per epoch. Chunking is numerics-IDENTICAL to the per-step
        loop: the scan body computes the same sample(epoch_key, i) and
        fold_in(base_rng, state.step) per step — pinned by
        tests/test_device_pipes.py chunk-equivalence."""
        sampler = self.trainpipe
        if self.state is None:
            first = jax.tree.map(
                np.asarray, sampler.sample(sampler.epoch_key(), 0)
            )
            self._init_state({f: jnp.asarray(v) for f, v in first.items()})

        has_stats = bool(jax.tree.leaves(self.state.stats))

        def _chunk_fn(width: int):
            key = ("device_chunk", width)
            if key not in self._jit_cache:
                self._check_stats_override(has_stats)

                def body(carry, step_idx):
                    state, prep, epoch_key, base_rng = carry
                    batch = sampler.sample_prepared(prep, epoch_key, step_idx)
                    # step rng derived ON DEVICE — a host-side split
                    # per step would serialize on the dispatch
                    rng = jax.random.fold_in(base_rng, state.step)
                    loss, _, new_stats, grads = self._loss_and_grad(
                        state.params, state.stats, batch, rng, has_stats
                    )
                    updates, opt_state = self.optimizer.update(
                        grads, state.opt_state, state.params
                    )
                    params = optax.apply_updates(state.params, updates)
                    return (
                        TrainState(params, opt_state, state.step + 1, new_stats),
                        prep, epoch_key, base_rng,
                    ), loss

                def chunk(state, epoch_key, i0, base_rng):
                    # epoch permutation (a 20-150k-key device sort at
                    # Beauty scale) computed ONCE per chunk, not per step
                    prep = sampler.prepare(epoch_key)
                    (state, _, _, _), losses = jax.lax.scan(
                        body, (state, prep, epoch_key, base_rng),
                        i0 + jnp.arange(width, dtype=jnp.int32),
                    )
                    return state, losses

                self._jit_cache[key] = jax.jit(chunk, donate_argnums=0)
            return self._jit_cache[key]

        S = sampler.steps_per_epoch
        W = min(S, int(self.cfg.get("device_steps_per_dispatch") or 32))
        epoch_key = sampler.epoch_key()
        B = sampler.batch_size
        self._rng, base_rng = jax.random.split(self._rng)
        losses = []
        i = 0
        full = _chunk_fn(W)
        while i + W <= S:
            self.state, chunk_losses = full(
                self.state, epoch_key, jnp.asarray(i, jnp.int32), base_rng
            )
            losses.append(chunk_losses)
            i += W
        if i < S:  # remainder chunk (its own one-time compile)
            self.state, chunk_losses = _chunk_fn(S - i)(
                self.state, epoch_key, jnp.asarray(i, jnp.int32), base_rng
            )
            losses.append(chunk_losses)
        # ONE device→host transfer for the whole epoch's losses — per-loss
        # float() would pay a dispatch round-trip each
        for loss in np.asarray(jnp.concatenate(losses)):
            self.monitor(
                float(loss), n=B, reduction="mean", mode="train", pool=["LOSS"]
            )

    def train_per_epoch(self, epoch: int) -> None:
        """Default hot loop; per-model Coaches may override
        (reference requires the override — ours supplies a default)."""
        if getattr(self.trainpipe, "is_device_sampler", False):
            return self._device_train_epoch(epoch)
        if not hasattr(self, "_train_step_fn"):
            self._train_step_fn = None
        for data in self.dataloader:
            n = int(data.get(Size, 1))
            batch = {
                f: jnp.asarray(v)
                for f, v in data.items()
                if _is_array(v) and f != Size
            }
            self._init_state(batch)
            if self._train_step_fn is None:
                self._train_step_fn = self._make_train_step()
            self._rng, rng = jax.random.split(self._rng)
            self.state, loss, logs = self._train_step_fn(self.state, batch, rng)
            self.monitor(
                float(loss), n=n, reduction="mean", mode="train", pool=["LOSS"]
            )

    # ------------------------------------------------------- eval engine
    def _densify_eval_batch(self, data: Dict[Field, Any]):
        """Ragged ISeen/IUnseen tuples → padded id arrays (+ row mask);
        pads eval rows so every batch has the bucketed batch size."""
        model = self.get_res_sys_arch()
        ISeen, IUnseen = model.ISeen, model.IUnseen
        rows = data.get(IUnseen)
        B = int(data.get(Size, len(rows) if rows is not None else 0))

        def pad_ragged(values, fill, bucketed_len=None):
            if isinstance(values, np.ndarray):
                arr = values if values.ndim > 1 else values[:, None]
            else:
                maxlen = max((len(v) for v in values), default=1) or 1
                maxlen = bucketed_len or _bucket(maxlen)
                arr = np.full((len(values), maxlen), fill, dtype=np.int64)
                for i, v in enumerate(values):
                    if len(v):
                        arr[i, : len(v)] = v
            return arr

        seen = data.get(ISeen)
        unseen = data.get(IUnseen)
        out: Dict[str, Any] = {}
        # fill with an always-out-of-bounds id → dropped by the scatter
        # (catalog width varies per dataset under UniSRec-style eval)
        out["seen_ids"] = (
            pad_ragged(seen, fill=2**30) if seen is not None else None
        )
        if unseen is not None:
            if self.ranking == "pool":
                # candidate ids for pool scoring; target is column 0
                out["candidates"] = pad_ragged(unseen, fill=0)
                out["target_ids"] = np.zeros((B, 1), dtype=np.int64)
            else:
                out["target_ids"] = pad_ragged(unseen, fill=-1)

        # model inputs: rectangular fields only
        batch = {
            f: v for f, v in data.items() if _is_array(v) and f != Size
        }
        if self.ranking == "pool" and "candidates" in out:
            batch[IUnseen] = out["candidates"]
        # pad all arrays to a bucketed batch size
        Bb = _bucket(B, base=32)
        valid_rows = np.zeros(Bb, dtype=np.float32)
        valid_rows[:B] = 1.0

        def pad_rows(arr):
            arr = np.asarray(arr)
            if arr.shape[0] == Bb:
                return arr
            reps = np.repeat(arr[:1], Bb - arr.shape[0], axis=0)
            return np.concatenate([arr, reps], axis=0)

        batch = {f: pad_rows(v) for f, v in batch.items()}
        for key in ("seen_ids", "target_ids"):
            if out.get(key) is not None:
                out[key] = pad_rows(out[key])
        return batch, out, valid_rows, B

    def _eval_step_fn(self, ranking: str, marks: Tuple = ()):
        key = ("eval", ranking, self.remove_seen, marks)
        if key not in self._jit_cache:
            model = self.model
            wanted = tuple(
                (b, k) for b, k in self._wanted if b in metrics_lib.RANK_METRICS
            )
            static_marks = dict(marks)

            def step(params, stats, buffers, batch, seen_ids, target_ids, valid_rows):
                method = (
                    "recommend_from_full" if ranking == "full" else "recommend_from_pool"
                )
                batch = {**batch, **static_marks}
                scores = model.apply(
                    {"params": self.cast_compute(params), **stats},
                    batch,
                    buffers,
                    method=method,
                )
                if ranking == "full":
                    # auto-padded sharded tables (mesh.shard_params)
                    # produce phantom zero-score columns past the
                    # catalog; slice back to the logical item count so
                    # rank metrics never see them
                    count = model.Item.count
                    if scores.shape[-1] > count:
                        scores = scores[..., :count]
                if ranking == "full" and self.remove_seen and seen_ids is not None:
                    B = scores.shape[0]
                    rows = jnp.arange(B)[:, None]
                    scores = scores.at[rows, seen_ids].set(
                        -1e23, mode="drop"
                    )
                sums = metrics_lib.rank_metrics(
                    scores, target_ids, wanted, valid_rows
                )
                return sums

            self._jit_cache[key] = jax.jit(step)
        return self._jit_cache[key]

    def evaluate(self, epoch: int, step: int = -1, mode: str = "valid") -> None:
        model = self.get_res_sys_arch()
        if self.dataset is not None and self.dataset.tasktag == TaskTag.PREDICTION:
            return self._evaluate_prediction(epoch, mode)
        pipe = self.validpipe if mode == "valid" else self.testpipe
        if pipe is None:
            return
        pipe.set_seed(int(self.cfg.seed))
        buffers = self.model.apply(
            {"params": self.cast_compute(self.state.params), **self.state.stats},
            method="reset_ranking_buffers",
        )
        pool = [
            metrics_lib.fmt_metric(b, k)
            for b, k in self._wanted
            if b in metrics_lib.RANK_METRICS
        ]
        # eval batches are static per (dataset, split, ranking): densify
        # once and reuse across epochs instead of re-walking the pipe
        cache_key = (mode, self.ranking)
        cached = self._eval_cache.get(cache_key)
        if cached is None:
            cached = []
            for data in pipe:
                marks = tuple(
                    sorted((k, v) for k, v in data.items() if isinstance(k, str))
                )
                batch, aux, valid_rows, B = self._densify_eval_batch(data)
                cached.append(
                    (
                        marks,
                        {f: jnp.asarray(v) for f, v in batch.items()},
                        jnp.asarray(aux["seen_ids"])
                        if aux.get("seen_ids") is not None
                        else None,
                        jnp.asarray(aux["target_ids"]),
                        jnp.asarray(valid_rows),
                        B,
                    )
                )
            self._eval_cache[cache_key] = cached

        # dispatch all batches, fetch all sums in one host sync at the end
        pending = []
        for marks, batch, seen_ids, target_ids, valid_rows, B in cached:
            fn = self._eval_step_fn(self.ranking, marks)
            sums = fn(
                self.state.params, self.state.stats, buffers, batch,
                seen_ids, target_ids, valid_rows,
            )
            pending.append((marks, B, sums))
        # one bulk device→host fetch for every batch's metric sums
        fetched = jax.device_get([s for _, _, s in pending])
        pending = [
            (marks, B, sums)
            for (marks, B, _), sums in zip(pending, fetched)
        ]
        for marks, B, sums in pending:
            sums = {k: float(v) for k, v in sums.items()}
            values = [sums[name] / max(B, 1) for name in pool if name in sums]
            self.monitor(*values, n=B, reduction="mean", mode=mode, pool=pool)
            mark_dict = dict(marks)
            if "dataset" in mark_dict:
                # per-dataset namespaced metrics (UniSRec/main.py:443-446)
                ns_pool = [f"{mark_dict['dataset']}${name}" for name in pool]
                self.monitor(*values, n=B, reduction="mean", mode=mode, pool=ns_pool)

    def _evaluate_prediction(self, epoch: int, mode: str) -> None:
        """CTR eval: accumulate sigmoid scores + labels; global AUC and
        LOGLOSS (DeepFM monitors)."""
        pipe = self.validpipe if mode == "valid" else self.testpipe
        if pipe is None:
            return
        model = self.get_res_sys_arch()
        Label = model.Label
        key = ("pred_eval",)
        if key not in self._jit_cache:
            def step(params, stats, batch):
                return self.model.apply(
                    {"params": self.cast_compute(params), **stats},
                    batch,
                    None,
                    method="recommend_from_pool",
                )

            self._jit_cache[key] = jax.jit(step)
        preds, labels = [], []
        for data in pipe:
            batch = {
                f: jnp.asarray(v)
                for f, v in data.items()
                if _is_array(v) and f != Size
            }
            out = self._jit_cache[key](self.state.params, self.state.stats, batch)
            preds.append(np.asarray(out).reshape(-1))
            labels.append(np.asarray(data[Label]).reshape(-1))
        preds = np.concatenate(preds)
        labels = np.concatenate(labels)
        wanted_names = [metrics_lib.fmt_metric(b, k) for b, k in self._wanted]
        values, pool = [], []
        if "AUC" in wanted_names:
            values.append(metrics_lib.auc(labels, preds))
            pool.append("AUC")
        if "LOGLOSS" in wanted_names:
            values.append(metrics_lib.log_loss(labels, preds))
            pool.append("LOGLOSS")
        self.monitor(*values, n=len(preds), reduction="mean", mode=mode, pool=pool)

    # -------------------------------------------------------- early stop
    def _check_best(self, summary: Dict[str, float], epoch: int) -> None:
        value = summary.get(self._best_key)
        if value is None:
            return
        caster = self._best_casters.get(self._best_key, self._best_caster)
        improved = self._best is None or (
            caster(value, self._best) == value and value != self._best
        )
        if improved:
            self._best = value
            self._best_epoch = epoch
            self._stopping_steps = 0
            self.save_best()
        else:
            self._stopping_steps += 1
            if self._stopping_steps >= self._early_stop_patience:
                raise EarlyStopError(
                    f"{self._best_key} stalled for {self._stopping_steps} evals "
                    f"(best {self._best:.5f} @ epoch {self._best_epoch})"
                )

    # -------------------------------------------------------- persistence
    def _state_dict(self) -> Dict[str, Any]:
        # start every leaf's device→host DMA first so the transfers
        # overlap; the per-leaf np.asarray below then mostly waits on
        # in-flight copies instead of serializing them (the fetch is
        # the checkpoint's train-loop cost — ~10 MB/epoch at Beauty
        # scale rides the TPU tunnel). Still fully synchronous before
        # return: the next train step DONATES these buffers.
        tree = (self.state.params, self.state.opt_state, self.state.stats)
        for leaf in jax.tree.leaves(tree):
            if hasattr(leaf, "copy_to_host_async"):
                try:
                    leaf.copy_to_host_async()
                except Exception:
                    pass
        return {
            "params": jax.tree.map(np.asarray, self.state.params),
            "opt_state": jax.tree.map(np.asarray, self.state.opt_state),
            "step": int(self.state.step),
            "stats": jax.tree.map(np.asarray, self.state.stats),
        }

    def _load_state_dict(self, payload: Dict[str, Any]) -> None:
        params = jax.tree.map(jnp.asarray, payload["params"])
        if payload.get("opt_state") is not None and self.state is not None:
            opt_state = jax.tree.unflatten(
                jax.tree.structure(self.state.opt_state),
                jax.tree.leaves(payload["opt_state"]),
            )
        elif payload.get("opt_state") is not None:
            # fresh process (state not yet materialized): the pickled
            # payload preserved the optax pytree structure — losing the
            # moments here would silently violate the CHECKPOINT_MODULES
            # contract (SURVEY.md §2.5)
            opt_state = jax.tree.map(jnp.asarray, payload["opt_state"])
        else:
            opt_state = self.optimizer.init(params)
        stats = jax.tree.map(jnp.asarray, payload.get("stats") or {})
        self.state = TrainState(
            params, opt_state, jnp.asarray(payload.get("step", 0), jnp.int32), stats
        )

    @dist.main_process_only
    def save(self, filename: Optional[str] = None, best: bool = False) -> None:
        path = self.cfg.CHECKPOINT_PATH
        utils.mkdirs(path)
        filename = filename or (
            self.cfg.BEST_FILENAME if best else self.cfg.SAVED_FILENAME
        )
        payload = {"params": jax.tree.map(np.asarray, self.state.params)}
        if jax.tree.leaves(self.state.stats):
            payload["stats"] = jax.tree.map(np.asarray, self.state.stats)
        utils.export_pickle(payload, os.path.join(path, filename))

    def save_best(self) -> None:
        if self.state is not None:
            self.save(self.cfg.BEST_FILENAME)

    def save_last(self) -> None:
        if self.state is not None:
            self.save(self.cfg.SAVED_FILENAME)

    def load(self, path: Optional[str] = None, filename: Optional[str] = None) -> None:
        path = path or self.cfg.CHECKPOINT_PATH
        filename = filename or self.cfg.SAVED_FILENAME
        payload = utils.import_pickle(os.path.join(path, filename))
        params = jax.tree.map(jnp.asarray, payload["params"])
        opt_state = (
            self.state.opt_state if self.state else self.optimizer.init(params)
        )
        step = self.state.step if self.state else jnp.asarray(0, jnp.int32)
        stats = jax.tree.map(jnp.asarray, payload.get("stats") or {})
        if not jax.tree.leaves(stats) and self.state is not None:
            stats = self.state.stats
        self.state = TrainState(params, opt_state, step, stats)
        dist.synchronize()

    def load_best(self) -> None:
        self.load(filename=self.cfg.BEST_FILENAME)

    @dist.main_process_only
    def save_checkpoint(self, epoch: int) -> None:
        """Async checkpoint: device→host fetch happens here (cheap sync),
        serialization + disk write run in a background thread with an
        atomic rename — training resumes immediately and preemption
        can't truncate the file (SURVEY.md §5.3; the reference only has
        synchronous epoch-granularity torch.save).

        ``--checkpoint-backend orbax`` swaps the array payload onto
        orbax's AsyncCheckpointer (TensorStore/OCDBT storage, its own
        tmp+commit protocol, multi-host aware); the small monitor/epoch
        metadata stays a pickle next to it either way."""
        path = self.cfg.CHECKPOINT_PATH
        utils.mkdirs(path)
        meta = {
            "epoch": epoch,
            "history": {k: list(v) for k, v in self.history.items()},
            "best": (self._best, self._best_epoch, self._stopping_steps),
            "rng": np.asarray(self._rng),
        }
        self._join_checkpoint_writer()
        if self._ckpt_backend() == "orbax":
            import orbax.checkpoint as ocp

            utils.export_pickle(meta, self._orbax_dir() + ".meta")
            self._orbax_ckptr().save(
                self._orbax_dir(),
                args=ocp.args.StandardSave({"state": self._state_dict()}),
                force=True,
            )
            return
        payload = dict(meta, state=self._state_dict())
        import threading

        self._ckpt_thread = threading.Thread(
            target=utils.export_pickle,
            args=(payload, os.path.join(path, self.cfg.CHECKPOINT_FILENAME)),
            daemon=True,
        )
        self._ckpt_thread.start()

    def _ckpt_backend(self) -> str:
        return str(self.cfg.get("checkpoint_backend", "pickle") or "pickle")

    def _orbax_dir(self) -> str:
        return os.path.abspath(
            os.path.join(self.cfg.CHECKPOINT_PATH, "checkpoint.orbax")
        )

    def _orbax_ckptr(self):
        if getattr(self, "_ocp_ckptr", None) is None:
            import orbax.checkpoint as ocp

            self._ocp_ckptr = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler()
            )
        return self._ocp_ckptr

    def _join_checkpoint_writer(self) -> None:
        thread = getattr(self, "_ckpt_thread", None)
        if thread is not None and thread.is_alive():
            thread.join()
        if getattr(self, "_ocp_ckptr", None) is not None:
            self._ocp_ckptr.wait_until_finished()

    def load_checkpoint(self) -> int:
        self._join_checkpoint_writer()
        if self._ckpt_backend() == "orbax":
            return self._load_checkpoint_orbax()
        file_ = os.path.join(self.cfg.CHECKPOINT_PATH, self.cfg.CHECKPOINT_FILENAME)
        payload = utils.import_pickle(file_)
        self._load_state_dict(payload["state"])
        self.history = payload["history"]
        self._best, self._best_epoch, self._stopping_steps = payload["best"]
        saved_rng = jnp.asarray(payload["rng"])
        # the raw key width depends on jax_default_prng_impl (threefry: 2
        # uint32 words, rbg/unsafe_rbg: 4); a checkpoint written under a
        # different impl cannot be reinterpreted — reseed instead of
        # feeding a mis-sized key into fold_in/split
        if saved_rng.shape == jnp.shape(jax.random.PRNGKey(0)):
            self._rng = saved_rng
        else:
            utils.warnLogger(
                "[Coach] >>> checkpoint rng written under a different "
                "prng_impl; reseeding from cfg.seed"
            )
            self._rng = jax.random.PRNGKey(int(self.cfg.get("seed", 0)))
        return int(payload["epoch"])

    def _ensure_state(self) -> None:
        """Materialize TrainState from one batch (orbax restore needs a
        structure template; normally the first train batch does this)."""
        if self.state is not None:
            return
        if hasattr(self.trainpipe, "sample"):  # on-device sampler
            first = jax.tree.map(
                np.asarray, self.trainpipe.sample(self.trainpipe.epoch_key(), 0)
            )
            self._init_state({f: jnp.asarray(v) for f, v in first.items()})
            return
        self.trainpipe.set_seed(int(self.cfg.seed))
        self.trainpipe.set_epoch(0)
        self._init_state(next(iter(self.trainpipe)))

    def _load_checkpoint_orbax(self) -> int:
        import orbax.checkpoint as ocp

        path = self._orbax_dir()
        if not os.path.isdir(path):
            raise FileNotFoundError(path)
        meta = utils.import_pickle(path + ".meta")
        self._ensure_state()
        template = {"state": self._state_dict()}
        restored = self._orbax_ckptr().restore(
            path, args=ocp.args.StandardRestore(template)
        )
        self._load_state_dict(restored["state"])
        self.history = meta["history"]
        self._best, self._best_epoch, self._stopping_steps = meta["best"]
        self._restore_rng(jnp.asarray(meta["rng"]))
        return int(meta["epoch"])

    def _restore_rng(self, saved_rng) -> None:
        # the raw key width depends on jax_default_prng_impl (threefry: 2
        # uint32 words, rbg/unsafe_rbg: 4); a checkpoint written under a
        # different impl cannot be reinterpreted — reseed instead of
        # feeding a mis-sized key into fold_in/split
        if saved_rng.shape == jnp.shape(jax.random.PRNGKey(0)):
            self._rng = saved_rng
        else:
            utils.warnLogger(
                "[Coach] >>> checkpoint rng written under a different "
                "prng_impl; reseeding from cfg.seed"
            )
            self._rng = jax.random.PRNGKey(int(self.cfg.get("seed", 0)))

    def resume(self) -> int:
        if self.cfg.get("resume"):
            try:
                epoch = self.load_checkpoint() + 1
                utils.infoLogger(f"[Coach] >>> resume from epoch {epoch}")
                return epoch
            except FileNotFoundError:
                utils.warnLogger("[Coach] >>> no checkpoint found; fresh start")
        return 0

    # ----------------------------------------------------------- summary
    def summary(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for mode in ("train", "valid", "test"):
            if self.history[mode]:
                out[mode] = {
                    k: v for k, v in self.history[mode][-1].items() if k != "epoch"
                }
        return out

    @dist.main_process_only
    def easy_record_best(self, best_summary: Dict[str, float]) -> None:
        """results.json + SUMMARY.md + monitors.pkl in the benchmark
        store schema (benchmark/*/MF-BPR.json runs[*])."""
        cfg = self.cfg
        utils.mkdirs(cfg.LOG_PATH)
        metrics = self.summary()
        metrics["best"] = best_summary
        # per-run RESOLVED config snapshot — the reference stores the
        # full params dict with every run (benchmark/.../SASRec.json
        # runs[*].params), not only at the entry level; a store row must
        # remain auditable even when later runs of the same entry change
        # hyperparameters (r4: STOSA/FPMC maxlen drift went undetected
        # because runs carried config: null)
        resolved = {
            k: v
            for k, v in cfg.items()
            if isinstance(v, (str, int, float, bool, list, type(None)))
        }
        record = {
            "id": cfg.id,
            "params": {"seed": int(cfg.seed), "config": resolved},
            "metrics": metrics,
        }
        with open(os.path.join(cfg.LOG_PATH, "results.json"), "w") as fh:
            json.dump(record, fh, indent=1)
        if cfg.get("record_benchmark"):
            from .. import benchmark as benchmark_lib

            benchmark_lib.record_run(
                cfg.get("benchmark_root", "./benchmark"),
                cfg.dataset,
                cfg.description,
                record,
                config=resolved,
                tags=list(cfg.get("tags", [])),
                description=cfg.description,
            )
        utils.export_pickle(
            self.history, os.path.join(cfg.LOG_PATH, cfg.MONITOR_FILENAME)
        )
        utils.export_pickle(
            {
                "best": best_summary,
                "which4best": self._best_key,
                "value": self._best,
                "epoch": self._best_epoch,
            },
            os.path.join(cfg.LOG_PATH, cfg.MONITOR_BEST_FILENAME),
        )
        lines = [f"# {cfg.description}", ""]
        for mode, vals in metrics.items():
            lines.append(f"## {mode}")
            lines.append("")
            for k, v in sorted(vals.items()):
                if k != "epoch":
                    lines.append(f"- {k}: {v:.5f}")
            lines.append("")
        with open(os.path.join(cfg.LOG_PATH, cfg.SUMMARY_FILENAME), "w") as fh:
            fh.write("\n".join(lines))

    # --------------------------------------------------------------- fit
    def fit(self) -> Dict[str, float]:
        cfg = self.cfg
        self.start_epoch = self.resume()
        eval_freq = max(1, int(cfg.get("eval_freq", 1)))
        t0 = time.monotonic()
        epoch = self.start_epoch
        try:
            for epoch in range(self.start_epoch, int(cfg.epochs)):
                self.train(epoch)
                if (epoch + 1) % int(cfg.get("CHECKPOINT_FREQ", 1)) == 0:
                    self.save_checkpoint(epoch)
                if (epoch + 1) % eval_freq == 0:
                    if cfg.get("eval_valid", True):
                        self.evaluate(epoch, mode="valid")
                        summary = self._flush("valid", epoch)
                        self._check_best(summary, epoch)
                    if cfg.get("eval_test", False):
                        self.evaluate(epoch, mode="test")
                        self._flush("test", epoch)
        except EarlyStopError as exc:
            utils.infoLogger(f"[Coach] >>> early stop: {exc}")
        except KeyboardInterrupt:
            utils.warnLogger("[Coach] >>> interrupted; saving last state")

        self._join_checkpoint_writer()
        self.save_last()
        # optional extra training phase (ETEGRec's code-loss finetune,
        # train_etegrec.py:583-624); default no-op
        self.post_training()

        # final eval at last state
        if self.validpipe is not None:
            self.evaluate(epoch, mode="valid")
            summary = self._flush("valid", epoch)
            if self._best is None:
                self._check_best(summary, epoch)
        if self.testpipe is not None:
            self.evaluate(epoch, mode="test")
            self._flush("test", epoch)

        # eval at best checkpoint (→ the "best" block in results.json)
        best_summary: Dict[str, float] = {}
        try:
            self.load_best()
            if self.testpipe is not None:
                self.evaluate(epoch, mode="test")
                best_summary = {
                    k: v
                    for k, v in self._flush("test", epoch).items()
                    if k != "epoch"
                }
                # keep "test" history pointing at the last-state eval
                if self.history["test"]:
                    self.history["test"].pop()
        except FileNotFoundError:
            pass

        self.easy_record_best(best_summary)
        elapsed = time.monotonic() - t0
        utils.infoLogger(
            f"[Coach] >>> done in {elapsed:.1f}s; best {self._best_key}="
            f"{self._best if self._best is not None else float('nan')} "
            f"@ epoch {self._best_epoch}"
        )
        dist.synchronize()
        return best_summary
