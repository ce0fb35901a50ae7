"""Training launcher: Coach, metrics, early stopping."""

from . import metrics  # noqa: F401
from .coach import Coach, EarlyStopError, TrainState  # noqa: F401
