"""Mesh / collectives / sharded tables — the TPU comm layer
(SURVEY.md §5.8 "TPU-native equivalent")."""

from . import dist  # noqa: F401
from . import mesh  # noqa: F401
from . import tables  # noqa: F401
from . import topk  # noqa: F401
from .mesh import make_mesh  # noqa: F401
