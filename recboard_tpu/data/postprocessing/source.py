from ..pipes import OrderedSource, RandomShuffledSource  # noqa: F401
