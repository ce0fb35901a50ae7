"""Model base classes — the four architecture contracts.

freerec parity (SURVEY.md §2.3): `RecSysArch` (generic), `GenRecArch`
(general CF), `SeqRecArch` (next-item, NUM_PADS/PADDING_VALUE class
constants — overridable as in BERT4Rec/main.py:39-41), `PredRecArch`
(CTR, pool-only eval). Models implement `sure_trainpipe`, optionally
`sure_valid/testpipe`, `encode`, `fit`, `recommend_from_full`,
`recommend_from_pool`, and optionally `reset_ranking_buffers`
(LightGCN/main.py:110-115).

TPU-first deviations from the torch contract:

* Models are flax.linen Modules — parameters are pytrees, every method
  runs under `model.apply(variables, ..., method=...)` inside jit.
* `fit(data)` returns ``(total_loss, {name: value})`` instead of a bare
  loss dict; the Coach differentiates the scalar and logs the dict
  (the reference's per-model Coach overrides combine the dict manually,
  e.g. rec_loss + weight-decayed emb_loss).
* `reset_ranking_buffers` returns a *buffers pytree* (precomputed
  user/item embeddings for graph models) that the Coach threads into
  `recommend_from_*` — the functional replacement for the reference's
  mutable `self.ranking_buffer`.
* Eval batches arrive densified: ragged ISeen/IUnseen are delivered as
  padded id arrays (+ the Coach builds seen masks by scatter on device),
  because XLA needs static shapes (SURVEY.md §7 hard part #4).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..data.datasets import RecDataSet
from ..data.fields import Field
from ..data.pipes import Size
from ..data.tags import (
    ID,
    ITEM,
    LABEL,
    NEGATIVE,
    POSITIVE,
    SEEN,
    SEQUENCE,
    UNSEEN,
    USER,
)

__all__ = ["RecSysArch", "GenRecArch", "SeqRecArch", "PredRecArch"]

Batch = Dict[Field, jnp.ndarray]
LossAndLog = Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]


class RecSysArch(nn.Module):
    """Root contract: holds the dataset schema, exposes canonical
    fields, dispatches train vs. ranking modes
    (TIGER/train_t5.py:276-280 overrides `forward(data, ranking)`)."""

    dataset: RecDataSet

    # ------------------------------------------------------------ fields
    @property
    def fields(self):
        return self.dataset.fields

    @property
    def User(self) -> Field:
        return self.fields[USER, ID]

    @property
    def Item(self) -> Field:
        return self.fields[ITEM, ID]

    @property
    def ISeq(self) -> Field:
        return self.Item.fork(SEQUENCE)

    @property
    def IPos(self) -> Field:
        return self.Item.fork(POSITIVE)

    @property
    def INeg(self) -> Field:
        return self.Item.fork(NEGATIVE)

    @property
    def IUnseen(self) -> Field:
        return self.Item.fork(UNSEEN)

    @property
    def ISeen(self) -> Field:
        return self.Item.fork(SEEN)

    @property
    def Label(self) -> Optional[Field]:
        return self.fields[LABEL]

    @property
    def Size(self) -> Field:
        return Size

    # ---------------------------------------------------------- contract
    def fit(self, data: Batch) -> LossAndLog:
        raise NotImplementedError

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        raise NotImplementedError

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        raise NotImplementedError

    def reset_ranking_buffers(self) -> Any:
        """Precompute eval-time state (graph models compute K-hop
        embeddings once per evaluation); default: nothing."""
        return ()

    # --------------------------------------- sharded-serving protocol
    def encode_queries(self, data: Batch) -> jnp.ndarray:
        """(B, D) query vectors whose dot with `item_table()` gives the
        full-catalog scores — the hook `recommend --sharded-rank` uses
        to route serving through parallel/topk.rank_top_k_row_sharded
        (scores stay item-sharded; the full (B, V) matrix never exists
        on one chip). Optional: only two-tower-style models (dot-product
        scorers) can support it."""
        raise NotImplementedError

    def item_table(self) -> jnp.ndarray:
        """(V, D) item matrix paired with `encode_queries` (row-sharded
        over the model axis by partition_rules)."""
        raise NotImplementedError

    def __call__(self, data: Batch, ranking: Optional[str] = None):
        """Train/eval dispatch for init and generic callers."""
        if ranking == "full":
            return self.recommend_from_full(data)
        if ranking == "pool":
            return self.recommend_from_pool(data)
        return self.fit(data)

    # ------------------------------------------------------- parallelism
    def partition_rules(self):
        """(regex, PartitionSpec) rules for pjit param placement; default
        shards any >=2-D 'embeddings' table by rows over `model` and
        replicates the rest (parallel/mesh.match_partition_rules)."""
        from jax.sharding import PartitionSpec

        # only true nn.Embed tables (leaf param 'embedding'): a Dense
        # kernel inside an embeddings-named module (DeepFM's continuous
        # Price field: embeddings_Price/kernel, shape (1, D)) is a
        # projection, not a vocab — row-sharding it is meaningless and
        # r4's broader r"embeddings" rule made the dryrun warn about it
        return [
            (r"embeddings.*embedding$", PartitionSpec("model", None)),
        ]

    # ---------------------------------------------------------- pipes
    def sure_trainpipe(self, *args, **kwargs):
        raise NotImplementedError


class GenRecArch(RecSysArch):
    """General CF (MF, graph CF). Default eval pipes exist in the base —
    models only define the trainpipe (MF-BPR/main.py:145-146)."""

    def sure_validpipe(self, ranking: str = "full", batch_size: int = 512):
        return (
            self.dataset.valid()
            .ordered_user_ids_source()
            .valid_sampling_(ranking)
            .batch_(batch_size)
            .tensor_()
        )

    def sure_testpipe(self, ranking: str = "full", batch_size: int = 512):
        return (
            self.dataset.test()
            .ordered_user_ids_source()
            .test_sampling_(ranking)
            .batch_(batch_size)
            .tensor_()
        )


class SeqRecArch(RecSysArch):
    """Next-item sequential. Item id 0..NUM_PADS-1 are specials; real
    ids are offset by NUM_PADS in pipes (`add_`, SASRec/main.py:149)."""

    NUM_PADS: int = 1
    PADDING_VALUE: int = 0

    def sure_validpipe(
        self, maxlen: int, ranking: str = "full", batch_size: int = 512
    ):
        return (
            self.dataset.valid()
            .ordered_user_ids_source()
            .valid_sampling_(ranking)
            .lprune_(maxlen, modified_fields=(self.ISeq,))
            .add_(self.NUM_PADS, modified_fields=(self.ISeq,))
            .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def sure_testpipe(
        self, maxlen: int, ranking: str = "full", batch_size: int = 512
    ):
        return (
            self.dataset.test()
            .ordered_user_ids_source()
            .test_sampling_(ranking)
            .lprune_(maxlen, modified_fields=(self.ISeq,))
            .add_(self.NUM_PADS, modified_fields=(self.ISeq,))
            .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )


class PredRecArch(RecSysArch):
    """CTR/CVR prediction: fields come from the YAML `fields:` schema,
    eval is pool-style scoring of the labeled rows (DeepFM/main.py:28)."""

    def sure_validpipe(self, batch_size: int = 4096):
        return self.dataset.valid().ordered_inter_source().batch_(batch_size).tensor_()

    def sure_testpipe(self, batch_size: int = 4096):
        return self.dataset.test().ordered_inter_source().batch_(batch_size).tensor_()
