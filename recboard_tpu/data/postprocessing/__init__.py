"""freerec-layout compatibility package.

The reference imports sampler/source classes from
`freerec.data.postprocessing.{source,sampler}` (HSTU/sampler.py:10-11,
TIGER/train_rqvae.py:152-167); we expose the same names from the same
sub-paths so extension code written against the reference layout ports
mechanically.
"""

from . import sampler  # noqa: F401
from . import source  # noqa: F401
