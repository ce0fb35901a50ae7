"""Compute ops: jnp reference implementations + Pallas TPU kernels."""

from . import attention  # noqa: F401
from . import dropout  # noqa: F401
from . import losses  # noqa: F401
from . import rel_bias  # noqa: F401
from . import spmm  # noqa: F401
