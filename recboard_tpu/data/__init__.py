"""Data layer: tags, fields, datasets, sampling pipes, preprocessing."""

from . import tags  # noqa: F401
from . import fields  # noqa: F401
from . import datasets  # noqa: F401
from . import pipes  # noqa: F401
from . import postprocessing  # noqa: F401
from . import preprocessing  # noqa: F401
from . import synthetic  # noqa: F401
from .fields import Field, FieldTuple  # noqa: F401
from .pipes import Size  # noqa: F401
