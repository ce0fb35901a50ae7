"""SEvo: SASRec trained with graph-smoothed embedding updates.

Reference: SEvo/main.py:74-240 (the model IS SASRec) + SEvo/optims/* —
the novelty lives in the optimizer: the item-embedding adam delta is
smoothed over an item co-occurrence graph each step. Here that is the
`optims.sevo_adam` optax transform; `SEvoCoach` wires it up by labeling
the item-embedding table 'smooth'.
"""

from __future__ import annotations

import jax

from ... import optims
from ...launcher import Coach
from . import register
from .sasrec import SASRec


@register("SEvo")
class SEvo(SASRec):
    """Architecture identical to SASRec; pair with SEvoCoach."""

    beta: float = 0.99
    smooth_layers: int = 3
    aggr: str = "neumann"
    hops: int = 2


class SEvoCoach(Coach):
    """Coach whose optimizer smooths item-embedding updates over the
    item graph (SEvo/optims/Adam.py:96-109)."""

    def set_optimizer(self) -> None:
        model = self.model
        adj = optims.build_item_graph(
            self.dataset,
            hops=getattr(model, "hops", 2),
            maxlen=getattr(model, "maxlen", None),
            num_pads=model.NUM_PADS,
        )

        def label_fn(params):
            def label(path, leaf):
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                return "smooth" if "item_embeddings" in name else "plain"

            return jax.tree_util.tree_map_with_path(label, params)

        cfg = self.cfg
        self.optimizer = optims.sevo_optimizer(
            lr=float(cfg.lr),
            adj=adj,
            label_fn=label_fn,
            kind=str(cfg.get("optimizer", "adam")).lower(),
            momentum=float(cfg.get("optim_first_moment_decay", 0.9) or 0.0),
            beta=getattr(model, "beta", 0.99),
            L=getattr(model, "smooth_layers", 3),
            aggr=getattr(model, "aggr", "neumann"),
            b1=float(cfg.get("optim_first_moment_decay", 0.9)),
            b2=float(cfg.get("optim_second_moment_decay", 0.999)),
            weight_decay=float(cfg.get("weight_decay", 0.0) or 0.0),
        )


# the generic runner must use the smoothing coach — the model alone
# is just SASRec (the novelty LIVES in the optimizer)
SEvo.COACH = SEvoCoach
