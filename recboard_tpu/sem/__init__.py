"""Semantic-ID (generative recommendation) stack: quantizers, k-means
SID generation, the SID protocol converter + trie, T5-style seq2seq,
and constrained beam search (SURVEY.md §3.3)."""

from . import quantizers  # noqa: F401
from . import kmeans  # noqa: F401
from . import converter  # noqa: F401
from . import seq2seq  # noqa: F401
