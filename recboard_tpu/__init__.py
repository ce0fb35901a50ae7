"""recboard_tpu — a TPU-native recommender-system framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
MTandHJ/RecBoard (and its underlying `freerec` training framework):
tagged tabular datasets, a composable sampling-pipe DSL, model base
classes for general/sequential/prediction recommenders, loss criterions,
sparse-graph utilities, a `Coach` training loop with monitoring /
checkpointing / early stopping / full-vs-pool ranking evaluation, and a
mesh/sharding layer replacing torch-DDP with GSPMD collectives over
ICI/DCN.

Reference behavioral contract: /root/reference (RecBoard @ 2026-06-30);
e.g. every reference entry point pins `freerec.declare(version="1.0.1")`
(MF-BPR/main.py:7). We keep the same top-level module layout so users of
the reference find the same concepts in the same places.
"""

__version__ = "0.1.0"

from . import utils  # noqa: F401  (re-export order matters: utils first)
from . import parser  # noqa: F401
from . import data  # noqa: F401
from . import criterions  # noqa: F401
from . import graph  # noqa: F401
from . import models  # noqa: F401
from . import launcher  # noqa: F401
from . import parallel  # noqa: F401
from .parallel import dist  # noqa: F401  (freerec.ddp analogue)

ddp = dist  # freerec.ddp-compatible alias (E4SRec/main.py:224-258)


def declare(version: str = __version__) -> None:
    """Version pin analogue of ``freerec.declare`` (MF-BPR/main.py:7).

    Raises if the requested major.minor is newer than what is installed,
    mirroring the reference's guard against running a model written for a
    newer framework.
    """
    def key(v: str):
        return tuple(int(x) for x in v.split(".")[:2])

    if key(version) > key(__version__):
        raise RuntimeError(
            f"recboard_tpu=={__version__} is older than the declared {version}."
        )
