"""Model layer: architecture base classes + the model zoo."""

from .base import GenRecArch, PredRecArch, RecSysArch, SeqRecArch  # noqa: F401
from . import zoo  # noqa: F401
