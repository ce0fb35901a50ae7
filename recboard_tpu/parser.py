"""Config system: argparse + YAML overlay + frozen compile.

freerec parity (SURVEY.md §2.6): ``Parser().add_argument/set_defaults/
compile()``; attribute access ``cfg.x``; ``cfg.get(k, default)``
(DeepFM/main.py:283); post-compile mutation ``cfg.sk_epsilons = [...]``
(TIGER/train_rqvae.py:70-71); ``--config=configs/X.yaml`` merges YAML
over set_defaults over argparse defaults; hyphenated CLI flags map to
snake_case keys (CONTRIBUTING.md "Config Files"); ``compile()`` seeds,
selects device, generates a timestamp run id and materializes
LOG_PATH / CHECKPOINT_PATH constants (resolved-config snapshot in
benchmark/Amazon2014Beauty_550_LOU/SASRec.json).
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Any, Dict, List, Optional

import yaml

from . import utils

__all__ = ["Parser", "Config", "CORE_DEFAULTS"]

# Common keys from the resolved-config snapshot
# (benchmark/Amazon2014Beauty_550_LOU/SASRec.json "config").
CORE_DEFAULTS: Dict[str, Any] = dict(
    root="./data",
    dataset="Amazon2014Beauty_550_LOU",
    tasktag="NEXTITEM",
    config=None,
    ranking="full",
    retain_seen=False,
    epochs=100,
    batch_size=256,
    optimizer="adam",
    lr=1e-3,
    weight_decay=0.0,
    optim_first_moment_decay=0.9,
    optim_second_moment_decay=0.999,
    nesterov=False,
    gradient_accumulation_steps=1,
    seed=1,
    eval_freq=5,
    eval_valid=True,
    eval_test=False,
    early_stop_patience=30,
    monitors=["LOSS", "HitRate@10", "HitRate@20", "NDCG@10", "NDCG@20"],
    which4best="NDCG@10",
    num_workers=0,
    verbose=False,
    resume=False,
    benchmark=True,  # reference parity: cudnn.benchmark analogue (no-op on TPU)
    record_benchmark=False,  # append results to the benchmark store
    benchmark_root="./benchmark",
    tags=[],
    log2console=True,
    log2file=True,
    profile=None,  # directory for a jax.profiler trace of epoch 1
    prng_impl=None,  # 'rbg' is ~1.5x faster for on-device sampling on TPU
    description="RecBoardTPU",
    device=None,
    ddp_backend="gspmd",  # reference default "nccl"; on TPU collectives are GSPMD/ICI
    id=None,
    # TPU-native additions (absent in the reference):
    data_axis="data",  # mesh axis names
    model_axis="model",
    num_model_shards=1,  # table model-parallel shards
    param_dtype="float32",
    compute_dtype="float32",  # flip to bfloat16 for large runs
    on_device_sampling=False,  # sample negatives inside the jitted step
    # scan-chunk width for on-device epochs: steps per host dispatch
    # (per-step dispatch costs tens of ms of host+tunnel overhead at
    # reference scale; numerics are identical at any width)
    device_steps_per_dispatch=32,
    checkpoint_freq=1,
    log_path="./logs",
    checkpoint_path="./infos",
)

TIME_FMT = "%m%d%H%M%S"


class Config(dict):
    """Attribute-accessible config with freerec's access patterns."""

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as exc:
            raise AttributeError(key) from exc

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __delattr__(self, key: str) -> None:
        del self[key]


class Parser:
    """CLI+YAML config parser; ``compile()`` freezes into a Config."""

    def __init__(self, description: Optional[str] = None):
        self._parser = argparse.ArgumentParser(
            description=description, conflict_handler="resolve"
        )
        self._defaults: Dict[str, Any] = {}
        for key, value in CORE_DEFAULTS.items():
            flag = "--" + key.replace("_", "-")
            if isinstance(value, bool):
                self._parser.add_argument(
                    flag, type=_str2bool, default=value, nargs="?", const=True
                )
            elif isinstance(value, list):
                self._parser.add_argument(flag, type=_str2list, default=value)
            elif value is None:
                self._parser.add_argument(flag, default=None)
            else:
                self._parser.add_argument(flag, type=type(value), default=value)
        self.cfg = Config()

    def add_argument(self, *flags: str, **kwargs) -> None:
        self._parser.add_argument(*flags, **kwargs)

    def set_defaults(self, **kwargs) -> None:
        self._defaults.update(kwargs)

    def compile(self, args: Optional[List[str]] = None) -> "Config":
        namespace, _unknown = self._parser.parse_known_args(args)
        cfg = Config(vars(namespace))

        # precedence: CLI > YAML > set_defaults > argparse defaults
        cli_set = _explicit_cli_keys(self._parser, args)
        # unknown CLI flags pass through as typed config keys (the
        # reference adds per-model argparse args in each main.py; here
        # any --some-hyperparam reaches the model without declaration)
        extra = _parse_unknown_args(_unknown)
        cfg.update(extra)
        cli_set |= set(extra)
        for key, value in self._defaults.items():
            if key not in cli_set:
                cfg[key] = value
        if cfg.get("config"):
            with open(cfg["config"]) as fh:
                overlay = yaml.safe_load(fh) or {}
            for key, value in overlay.items():
                key = key.replace("-", "_")
                if key not in cli_set:
                    cfg[key] = value

        impl = cfg.get("prng_impl")
        if impl is None:
            # threefry is the wrong default on TPU: dropout/negative-mask
            # bit generation dominates small-model steps (measured on a
            # v5e, SASRec B=1024: 5.7 -> 3.7 ms/step) and its unrolled
            # lowering costs minutes of XLA compile time per jit. XLA's
            # hardware-backed generator is 1.55x faster end-to-end and
            # compiles in seconds; CPU (tests) keeps threefry.
            import jax

            if jax.default_backend() == "tpu":
                impl = "unsafe_rbg"
        if impl:
            import jax

            jax.config.update("jax_default_prng_impl", impl)
            cfg["prng_impl"] = impl
        cfg["seed"] = utils.set_seed(int(cfg.get("seed", 1)))
        if cfg.get("id") is None:
            cfg["id"] = time.strftime(TIME_FMT)
        cfg["DATA_DIR"] = os.path.join(cfg["root"], "Processed", cfg["dataset"])
        cfg["LOG_PATH"] = os.path.join(
            cfg.get("log_path", "./logs"), cfg["description"], cfg["dataset"], cfg["id"]
        )
        cfg["CHECKPOINT_PATH"] = os.path.join(
            cfg.get("checkpoint_path", "./infos"), cfg["description"], cfg["dataset"], "0"
        )
        cfg["CHECKPOINT_FREQ"] = int(cfg.get("checkpoint_freq", 1))
        cfg["CHECKPOINT_MODULES"] = ["model", "optimizer", "lr_scheduler"]
        cfg["MONITOR_FILENAME"] = "monitors.pkl"
        cfg["MONITOR_BEST_FILENAME"] = "best.pkl"
        cfg["SAVED_FILENAME"] = "model.safetensors"
        cfg["BEST_FILENAME"] = "best.safetensors"
        cfg["CHECKPOINT_FILENAME"] = "checkpoint.pkl"
        cfg["SUMMARY_FILENAME"] = "SUMMARY.md"
        if cfg.get("log2file") or cfg.get("log2console"):
            utils.mkdirs(cfg["LOG_PATH"])
            utils.set_logger(
                cfg["LOG_PATH"],
                log2file=bool(cfg.get("log2file", True)),
                log2console=bool(cfg.get("log2console", True)),
            )
            with open(os.path.join(cfg["LOG_PATH"], "config.yaml"), "w") as fh:
                yaml.safe_dump(
                    {k: v for k, v in cfg.items() if _yaml_safe(v)}, fh, sort_keys=True
                )
        self.cfg = cfg
        return cfg


def _yaml_safe(value: Any) -> bool:
    if isinstance(value, (str, int, float, bool, type(None))):
        return True
    if isinstance(value, (list, tuple)):
        return all(_yaml_safe(v) for v in value)
    if isinstance(value, dict):
        return all(isinstance(k, str) and _yaml_safe(v) for k, v in value.items())
    return False


def _str2bool(value: str) -> bool:
    if isinstance(value, bool):
        return value
    return value.lower() in ("1", "true", "yes", "y", "on")


def _str2list(value: str) -> List[str]:
    if isinstance(value, list):
        return value
    return [v.strip() for v in value.split(",") if v.strip()]


def _parse_unknown_args(tokens: List[str]) -> dict:
    """`--key value` / `--key=value` pairs argparse did not declare →
    {key: typed value} (yaml typing: ints/floats/bools/lists parse)."""
    out = {}
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        if not tok.startswith("--"):
            i += 1
            continue
        body = tok[2:]
        if "=" in body:
            key, raw = body.split("=", 1)
            i += 1
        elif i + 1 < len(tokens) and not tokens[i + 1].startswith("--"):
            key, raw = body, tokens[i + 1]
            i += 2
        else:
            key, raw = body, "true"
            i += 1
        try:
            value = yaml.safe_load(raw)
        except yaml.YAMLError:
            value = raw
        out[key.replace("-", "_")] = value
    return out


def _explicit_cli_keys(
    parser: argparse.ArgumentParser, args: Optional[List[str]]
) -> set:
    """Keys the user explicitly passed on the CLI (so YAML/set_defaults
    must not override them)."""
    import sys

    argv = list(sys.argv[1:] if args is None else args)
    keys = set()
    for token in argv:
        if token.startswith("--"):
            keys.add(token[2:].split("=")[0].replace("-", "_"))
    return keys
