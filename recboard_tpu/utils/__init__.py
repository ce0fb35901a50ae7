"""Utility layer: logging, pickling, timing, filesystem helpers.

freerec parity (reconstructed interface, SURVEY.md §1 L0 "utils"):
`import_pickle`, `export_pickle`, `infoLogger`, `debugLogger`,
`timemeter`, `mkdirs` — call sites e.g. TIGER/train_rqvae.py:84,
DeepFM/main.py:259, HSTU/sampler.py:71.
"""

from __future__ import annotations

import functools
import logging
import os
import pickle
import random
import sys
import time
from typing import Any, Iterable, List

import numpy as np

__all__ = [
    "AverageMeter",
    "activate_benchmark",
    "debugLogger",
    "export_pickle",
    "import_pickle",
    "infoLogger",
    "listmap",
    "mkdirs",
    "set_color",
    "set_logger",
    "set_seed",
    "timemeter",
    "warnLogger",
]

LOGGER_NAME = "recboard_tpu"

_COLORS = {
    "red": "\033[1;31m",
    "green": "\033[1;32m",
    "yellow": "\033[1;33m",
    "blue": "\033[1;34m",
    "cyan": "\033[1;36m",
    "reset": "\033[0m",
}


def set_color(text: str, color: str = "cyan") -> str:
    if not sys.stdout.isatty():
        return text
    return f"{_COLORS.get(color, '')}{text}{_COLORS['reset']}"


def _get_logger() -> logging.Logger:
    logger = logging.getLogger(LOGGER_NAME)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter("%(asctime)s %(message)s", "%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


def set_logger(
    path: str | None = None,
    log2file: bool = True,
    log2console: bool = True,
    level: int = logging.INFO,
) -> logging.Logger:
    """(Re)configure the framework logger; mirrors freerec's
    log2file/log2console config switches (resolved config snapshot in
    benchmark/Amazon2014Beauty_550_LOU/SASRec.json)."""
    logger = logging.getLogger(LOGGER_NAME)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(message)s", "%Y-%m-%d %H:%M:%S")
    if log2console:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(fmt)
        logger.addHandler(handler)
    if log2file and path is not None:
        mkdirs(path)
        fh = logging.FileHandler(os.path.join(path, "log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if not logger.handlers:
        logger.addHandler(logging.NullHandler())
    logger.setLevel(level)
    logger.propagate = False
    return logger


def infoLogger(words: str) -> str:
    _get_logger().info(words)
    return words


def debugLogger(words: str) -> str:
    _get_logger().debug(words)
    return words


def warnLogger(words: str) -> str:
    _get_logger().warning(set_color(words, "yellow"))
    return words


def timemeter(fn):
    """Decorator logging wall time of a call (freerec.utils.timemeter,
    used at HSTU/sampler.py:71,131)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        start = time.monotonic()
        result = fn(*args, **kwargs)
        elapsed = time.monotonic() - start
        infoLogger(f"[Timer] >>> {fn.__qualname__} took {elapsed:.4f}s")
        return result

    return wrapper


def mkdirs(*paths: str) -> None:
    for path in paths:
        os.makedirs(path, exist_ok=True)


def export_pickle(data: Any, file_: str, atomic: bool = True) -> None:
    """Pickle with an atomic rename — a preempted write never leaves a
    truncated checkpoint behind (SURVEY.md §5.3)."""
    mkdirs(os.path.dirname(os.path.abspath(file_)))
    # pid-suffixed tmp: two processes racing to produce the same file
    # (parallel sweeps preparing shared side inputs) each write their
    # own tmp and the replace stays atomic for both
    target = f"{file_}.tmp{os.getpid()}" if atomic else file_
    with open(target, "wb") as fh:
        pickle.dump(data, fh, pickle.HIGHEST_PROTOCOL)
    if atomic:
        os.replace(target, file_)


def import_pickle(file_: str) -> Any:
    with open(file_, "rb") as fh:
        return pickle.load(fh)


def listmap(fn, *iterables: Iterable) -> List:
    """Eager map (freerec's `listmap`, HSTU/sampler.py:21)."""
    return list(map(fn, *iterables))


def set_seed(seed: int) -> int:
    """Seed host-side RNGs. Device-side randomness uses explicit
    jax.random keys derived from the same seed (threaded by the Coach)."""
    if seed == -1:
        seed = int.from_bytes(os.urandom(4), "little")
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return seed


def activate_benchmark(_: bool) -> None:
    """No-op on TPU: XLA compilation replaces cudnn.benchmark autotuning."""


class AverageMeter:
    """Weighted running mean used by the monitor sink."""

    def __init__(self, name: str):
        self.name = name
        self.reset()

    def reset(self) -> None:
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1) -> None:
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
