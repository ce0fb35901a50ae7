"""Graph collaborative-filtering family: GCN, NGCF, SimGCL, SGL, GTE.

All share the LightGCN scaffolding: (U+I)-node normalized bipartite
adjacency closed over as an XLA constant, K-hop gather+segment-sum
propagation, BPR + embedding-L2 losses (each reference Coach combines
`rec_loss + weight_decay * emb_loss` with the optimizer's decay off).

References: GCN/main.py:27-110; NGCF/main.py:40-110 (left-normalized
adj with self-loops, LeakyReLU(W1(Ax+x)+W2(Ax∘x)), L2-normalize,
concat layers); SimGCL/main.py:34-150 (noise-perturbed views, InfoNCE
over in-batch negatives); SGL/main.py:33-175 (node/edge-dropout
subgraph views); GTE/main.py:29-113 (training-free propagation,
epochs=0).

TPU notes: SGL's per-epoch subgraph resampling becomes per-step
on-device resampling — edge *structure* stays static (XLA constant),
only Bernoulli edge weights and the degree renormalization (two
segment-sums) are recomputed inside the jitted step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import criterions
from ...graph import SparseAdj
from ..base import Batch, GenRecArch, SeqRecArch
from ..modules import xavier_normal
from . import register


def _split_ui(embds: jnp.ndarray, num_users: int):
    return embds[:num_users], embds[num_users:]


def _l2norm(x, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def _bpr_and_reg(user_embds, item_embds, raw_user, raw_item, data, model):
    users = data[model.User]
    positives = data[model.IPos]
    negatives = data[model.INeg]
    u = user_embds[users][:, None, :]
    p = item_embds[positives]
    n = item_embds[negatives]
    rec_loss = criterions.bpr_with_logits(
        jnp.einsum("bkd,bkd->bk", u, p),
        jnp.einsum("bkd,bkd->bk", jnp.broadcast_to(u, n.shape), n),
    )
    emb_loss = criterions.BaseCriterion.regularize(
        [raw_user[users], raw_item[positives], raw_item[negatives]], rtype="l2"
    ) / users.shape[0]
    return rec_loss, emb_loss


class _GraphRecBase(GenRecArch):
    """Shared trainpipe + ranking plumbing for graph CF models."""

    @classmethod
    def build_adj(cls, dataset) -> SparseAdj:
        """Default propagation operator: sym-normalized bipartite adj
        (used by the generic runner to construct `adj`)."""
        return dataset.train().to_normalized_adj("sym")

    def sure_trainpipe(self, batch_size: int):
        return (
            self.dataset.train()
            .choiced_user_ids_source()
            .gen_train_sampling_pos_()
            .gen_train_sampling_neg_(num_negatives=1)
            .batch_(batch_size)
            .tensor_()
        )

    def reset_ranking_buffers(self) -> Any:
        return self.encode()

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        user_embds, item_embds = buffers if buffers else self.encode()
        q = user_embds[data[self.User]]
        return jnp.einsum(
            "bd,nd->bn", q, item_embds, preferred_element_type=jnp.float32
        )

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        user_embds, item_embds = buffers if buffers else self.encode()
        q = user_embds[data[self.User]]
        return jnp.einsum("bd,bkd->bk", q, item_embds[data[self.IUnseen]])


@register("GCN")
class GCN(_GraphRecBase):
    """Classic GCN: per-layer Adj @ x → Linear → ReLU (last layer no
    ReLU) (GCN/main.py:88-100)."""

    embedding_dim: int = 64
    num_layers: int = 3
    weight_decay: float = 1e-4
    adj: Optional[SparseAdj] = None

    def setup(self):
        init = nn.initializers.normal(stddev=1e-4)
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=init
        )
        self.item_embeddings = nn.Embed(
            self.Item.count, self.embedding_dim, embedding_init=init
        )
        self.linears = [
            nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
            for _ in range(self.num_layers)
        ]

    def encode(self):
        x = jnp.concatenate(
            (self.user_embeddings.embedding, self.item_embeddings.embedding), axis=0
        )
        for layer in self.linears[:-1]:
            x = nn.relu(layer(self.adj @ x))
        x = self.linears[-1](self.adj @ x)
        return _split_ui(x, self.User.count)

    def fit(self, data: Batch):
        user_embds, item_embds = self.encode()
        rec_loss, emb_loss = _bpr_and_reg(
            user_embds,
            item_embds,
            self.user_embeddings.embedding,
            self.item_embeddings.embedding,
            data,
            self,
        )
        loss = rec_loss + self.weight_decay * emb_loss
        return loss, {"rec_loss": rec_loss, "emb_loss": emb_loss}


@register("NGCF")
class NGCF(_GraphRecBase):
    """LeakyReLU(W1(Ax+x) + W2(Ax∘x)) layers with L2-normalize +
    dropout, concat all layer outputs (NGCF/main.py:40-50). `adj` must
    be the left-normalized bipartite adjacency WITH self loops
    (NGCF/main.py:77-88)."""

    embedding_dim: int = 64
    num_layers: int = 3
    dropout_rate: float = 0.1
    weight_decay: float = 1e-4
    adj: Optional[SparseAdj] = None

    @classmethod
    def build_adj(cls, dataset) -> SparseAdj:
        from ... import graph

        users, items = dataset.train().to_bigraph_edges()
        nu = dataset.fields["USER", "ID"].count
        ni = dataset.fields["ITEM", "ID"].count
        import numpy as np

        n = nu + ni
        rows = np.concatenate([users, np.asarray(items) + nu])
        cols = np.concatenate([np.asarray(items) + nu, users])
        adj = graph.SparseAdj(
            rows, cols, np.ones(len(rows), dtype=np.float32), (n, n)
        )
        adj = graph.add_self_loops(adj)
        return graph.to_normalized(adj, "left")

    def setup(self):
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=xavier_normal
        )
        self.item_embeddings = nn.Embed(
            self.Item.count, self.embedding_dim, embedding_init=xavier_normal
        )
        self.w1 = [
            nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
            for _ in range(self.num_layers)
        ]
        self.w2 = [
            nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
            for _ in range(self.num_layers)
        ]
        self.dropout = nn.Dropout(self.dropout_rate)

    def encode(self, deterministic: bool = True):
        x = jnp.concatenate(
            (self.user_embeddings.embedding, self.item_embeddings.embedding), axis=0
        )
        outs = [x]
        for w1, w2 in zip(self.w1, self.w2):
            z = self.adj @ x
            x = nn.leaky_relu(w1(z + x)) + nn.leaky_relu(w2(z * x))
            x = self.dropout(x, deterministic=deterministic)
            x = _l2norm(x)
            outs.append(x)
        all_embds = jnp.concatenate(outs, axis=-1)
        return _split_ui(all_embds, self.User.count)

    def fit(self, data: Batch):
        user_embds, item_embds = self.encode(deterministic=False)
        rec_loss, emb_loss = _bpr_and_reg(
            user_embds,
            item_embds,
            self.user_embeddings.embedding,
            self.item_embeddings.embedding,
            data,
            self,
        )
        loss = rec_loss + self.weight_decay * emb_loss
        return loss, {"rec_loss": rec_loss, "emb_loss": emb_loss}


@register("SimGCL")
class SimGCL(_GraphRecBase):
    """LightGCN propagation (layer mean WITHOUT the 0-hop term,
    SimGCL/main.py:83-106) + two noise-perturbed views → InfoNCE."""

    embedding_dim: int = 64
    num_layers: int = 3
    eps: float = 0.2
    temperature: float = 0.2
    weight_decay: float = 1e-4
    ssl_weight: float = 0.2
    adj: Optional[SparseAdj] = None

    def setup(self):
        init = nn.initializers.xavier_uniform()
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=init
        )
        self.item_embeddings = nn.Embed(
            self.Item.count, self.embedding_dim, embedding_init=init
        )

    def _all(self):
        return jnp.concatenate(
            (self.user_embeddings.embedding, self.item_embeddings.embedding), axis=0
        )

    def encode(self):
        x = self._all()
        avg = 0.0
        for _ in range(self.num_layers):
            x = self.adj @ x
            avg = avg + x / self.num_layers
        return _split_ui(avg, self.User.count)

    def encode_perturbed(self, rng):
        x = self._all()
        avg = 0.0
        for l in range(self.num_layers):
            x = self.adj @ x
            noise = _l2norm(
                jax.random.uniform(jax.random.fold_in(rng, l), x.shape)
            ) * jnp.sign(x)
            x = x + self.eps * noise
            avg = avg + x / self.num_layers
        u, i = _split_ui(avg, self.User.count)
        return _l2norm(u), _l2norm(i)

    def fit(self, data: Batch):
        user_embds, item_embds = self.encode()
        rec_loss, emb_loss = _bpr_and_reg(
            user_embds,
            item_embds,
            self.user_embeddings.embedding,
            self.item_embeddings.embedding,
            data,
            self,
        )
        rng = self.make_rng("sampling")
        u1, i1 = self.encode_perturbed(jax.random.fold_in(rng, 0))
        u2, i2 = self.encode_perturbed(jax.random.fold_in(rng, 1))
        users = data[self.User]
        positives = data[self.IPos][:, 0]
        ssl_u = jnp.einsum("md,nd->mn", u1[users], u2[users]) / self.temperature
        ssl_i = (
            jnp.einsum("md,nd->mn", i1[positives], i2[positives]) / self.temperature
        )
        targets = jnp.arange(users.shape[0], dtype=jnp.int32)
        ssl_loss = criterions.cross_entropy_with_logits(
            ssl_u, targets
        ) + criterions.cross_entropy_with_logits(ssl_i, targets)
        loss = rec_loss + self.weight_decay * emb_loss + self.ssl_weight * ssl_loss
        return loss, {
            "rec_loss": rec_loss,
            "emb_loss": emb_loss,
            "ssl_loss": ssl_loss,
        }


@register("SGL")
class SGL(_GraphRecBase):
    """LightGCN + dropout-augmented subgraph views → InfoNCE
    (SGL/main.py:87-143). aug_type: 'nd' node dropout, 'ed' edge
    dropout ('rw' per-layer edge dropout).

    TPU design: the undirected edge list is static; each view draws
    Bernoulli edge weights and renormalizes degrees on device inside
    the jitted step (per-step resampling instead of the reference's
    per-epoch `resample()` — structurally identical augmentation)."""

    embedding_dim: int = 64
    num_layers: int = 3
    aug_type: str = "ed"
    ssl_drop_rate: float = 0.1
    temperature: float = 0.2
    weight_decay: float = 1e-4
    ssl_weight: float = 0.1
    adj: Optional[SparseAdj] = None  # sym-normalized, for rec branch

    def setup(self):
        init = nn.initializers.xavier_uniform()
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=init
        )
        self.item_embeddings = nn.Embed(
            self.Item.count, self.embedding_dim, embedding_init=init
        )

    def _all(self):
        return jnp.concatenate(
            (self.user_embeddings.embedding, self.item_embeddings.embedding), axis=0
        )

    def _dropped_adj(self, rng) -> SparseAdj:
        """Bernoulli-mask edges of the *unnormalized* structure, then
        sym-renormalize with on-device segment-sums."""
        adj = self.adj
        n = adj.shape[0]
        if self.aug_type == "nd":
            node_keep = (
                jax.random.uniform(rng, (n,)) > self.ssl_drop_rate
            ).astype(jnp.float32)
            w = node_keep[adj.rows] * node_keep[adj.cols]
        else:
            w = (
                jax.random.uniform(rng, adj.vals.shape) > self.ssl_drop_rate
            ).astype(jnp.float32)
        deg = jax.ops.segment_sum(w, adj.rows, num_segments=n, indices_are_sorted=True)
        deg_in = jax.ops.segment_sum(w, adj.cols, num_segments=n)
        inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
        inv_sqrt_in = jnp.where(
            deg_in > 0, jax.lax.rsqrt(jnp.maximum(deg_in, 1e-12)), 0.0
        )
        vals = inv_sqrt[adj.rows] * w * inv_sqrt_in[adj.cols]
        out = SparseAdj.__new__(SparseAdj)
        out.rows, out.cols, out.vals, out.shape = adj.rows, adj.cols, vals, adj.shape
        return out

    def _propagate(self, adj: SparseAdj):
        x = self._all()
        avg = x / (self.num_layers + 1)
        for _ in range(self.num_layers):
            x = adj @ x
            avg = avg + x / (self.num_layers + 1)
        return avg

    def encode(self):
        return _split_ui(self._propagate(self.adj), self.User.count)

    def encode_view(self, rng):
        if self.aug_type == "rw":
            x = self._all()
            avg = x / (self.num_layers + 1)
            for l in range(self.num_layers):
                x = self._dropped_adj(jax.random.fold_in(rng, l)) @ x
                avg = avg + x / (self.num_layers + 1)
        else:
            avg = self._propagate(self._dropped_adj(rng))
        u, i = _split_ui(avg, self.User.count)
        return _l2norm(u), _l2norm(i)

    def fit(self, data: Batch):
        user_embds, item_embds = self.encode()
        rec_loss, emb_loss = _bpr_and_reg(
            user_embds,
            item_embds,
            self.user_embeddings.embedding,
            self.item_embeddings.embedding,
            data,
            self,
        )
        rng = self.make_rng("sampling")
        u1, i1 = self.encode_view(jax.random.fold_in(rng, 0))
        u2, i2 = self.encode_view(jax.random.fold_in(rng, 1))
        users = data[self.User]
        positives = data[self.IPos][:, 0]
        ssl_u = jnp.einsum("md,nd->mn", u1[users], u2[users]) / self.temperature
        ssl_i = (
            jnp.einsum("md,nd->mn", i1[positives], i2[positives]) / self.temperature
        )
        targets = jnp.arange(users.shape[0], dtype=jnp.int32)
        ssl_loss = criterions.cross_entropy_with_logits(
            ssl_u, targets
        ) + criterions.cross_entropy_with_logits(ssl_i, targets)
        loss = rec_loss + self.weight_decay * emb_loss + self.ssl_weight * ssl_loss
        return loss, {
            "rec_loss": rec_loss,
            "emb_loss": emb_loss,
            "ssl_loss": ssl_loss,
        }


@register("GTE")
class GTE(_GraphRecBase):
    """Training-free propagation baseline (GTE/main.py:29-113):
    user embds start at 0 (U×I), item embds at identity (I×I);
    K residual bipartite propagations; no parameters, epochs=0."""

    num_layers: int = 3
    adj: Optional[SparseAdj] = None  # unnormalized U→I incidence R

    @classmethod
    def build_adj(cls, dataset) -> SparseAdj:
        import numpy as np

        from ... import graph

        users, items = dataset.train().to_bigraph_edges()
        nu = dataset.fields["USER", "ID"].count
        ni = dataset.fields["ITEM", "ID"].count
        return graph.SparseAdj(
            users, items, np.ones(len(users), dtype=np.float32), (nu, ni)
        )

    def setup(self):
        # flax requires at least a deterministic init path; keep a dummy
        self._dummy = self.param("dummy", nn.initializers.zeros, (1,))

    def encode(self):
        R = self.adj  # (U, I) unnormalized incidence
        U, I = self.User.count, self.Item.count
        user_embds = jnp.zeros((U, I), jnp.float32)
        item_embds = jnp.eye(I, dtype=jnp.float32)
        for _ in range(self.num_layers):
            new_user = R @ item_embds + user_embds
            new_item = R.T @ user_embds + item_embds
            user_embds, item_embds = new_user, new_item
        return user_embds, item_embds

    def fit(self, data: Batch):
        zero = self._dummy.sum() * 0.0
        return zero, {"rec_loss": zero}
