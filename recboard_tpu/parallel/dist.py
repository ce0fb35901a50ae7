"""Distributed process/rank utilities — the freerec.ddp analogue.

freerec parity: `is_distributed`, `is_main_process`, `main_process_only`
(decorator), `synchronize` (E4SRec/main.py:224-258,
TIGER/train_rqvae.py:210). On TPU the communication backend is not NCCL
but GSPMD collectives over ICI/DCN (SURVEY.md §5.8): there is one Python
process per *host*, `jax.distributed.initialize()` wires multi-host
slices, and rank discipline (rank-0-only checkpoint/log writes,
barriers after save/load) is what these helpers provide.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import numpy as np

__all__ = [
    "initialize",
    "is_distributed",
    "is_main_process",
    "main_process_only",
    "rank",
    "world_size",
    "synchronize",
]

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (`jax.distributed.initialize`). Safe to call on a
    single host (no-op unless env/args request multi-process)."""
    global _initialized
    if _initialized:
        return
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    _initialized = True


def world_size() -> int:
    return jax.process_count()


def rank() -> int:
    return jax.process_index()


def is_distributed() -> bool:
    return jax.process_count() > 1


def is_main_process() -> bool:
    return jax.process_index() == 0


def main_process_only(fn):
    """Run only on host 0 (reference: @main_process_only on
    save_sid_vocab, TIGER/train_rqvae.py:210); other hosts get None."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return fn(*args, **kwargs)
        return None

    return wrapper


def synchronize() -> None:
    """Cross-host barrier after save/load (E4SRec/main.py:240,258): a
    tiny psum across all devices forces every host to rendezvous."""
    if not is_distributed():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("recboard_tpu.synchronize")


def broadcast_host_array(x: np.ndarray) -> np.ndarray:
    """Host-0's array to all hosts (checkpoint resume consistency)."""
    if not is_distributed():
        return x
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(x))
