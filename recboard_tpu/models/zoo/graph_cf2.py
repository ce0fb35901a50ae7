"""Graph CF family, part 2: JGCF, PairNorm(SGC), UltraGCN, SimpleX,
AlphaRec, CAGCN.

References: JGCF/main.py:39-130 + JGCF/modules.py:8-83 (Jacobi
polynomial filter, fixed cumprod coefficients, low+mid band concat);
PairNorm/main.py:33-170 (SGC propagation + PairNorm);
UltraGCN/main.py:38-200 (degree-weighted BCE + item-item constraint
from top-K co-occurrence, negatives resampled from all items on device);
SimpleX/main.py:36-175 (mean-pooled history ∘ gamma mix, cosine
contrastive loss); AlphaRec/main.py:41-150 (frozen text embeddings →
projector → LightGCN → InfoNCE/tau); CAGCN/main.py:44-150 +
CAGCN/utils.py:8-202 (trend-reweighted adjacency).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import criterions
from ...graph import SparseAdj
from ..base import Batch, GenRecArch
from ..modules import xavier_normal
from . import register
from .graph_cf import _GraphRecBase, _bpr_and_reg, _l2norm, _split_ui


@register("JGCF")
class JGCF(_GraphRecBase):
    """Jacobi polynomial graph filter; concat(low band, weight4mid *
    x - low) (JGCF/main.py:101-109)."""

    embedding_dim: int = 64
    num_layers: int = 3
    alpha: float = 1.0
    beta: float = 1.0
    scaling_factor: float = 3.0
    weight4mid: float = 0.1
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

    def _jacobi(self, x: jnp.ndarray) -> jnp.ndarray:
        a, b = self.alpha, self.beta
        A = self.adj
        zs = [x]
        for l in range(1, self.num_layers + 1):
            if l == 1:
                z = (a - b) / 2 * zs[-1] + (a + b + 2) / 2 * (A @ zs[-1])
            else:
                c0 = 2 * l * (l + a + b) * (2 * l + a + b - 2)
                c1 = (2 * l + a + b - 1) * (a**2 - b**2)
                c2 = (2 * l + a + b - 1) * (2 * l + a + b) * (2 * l + a + b - 2)
                c3 = 2 * (l + a - 1) * (l + b - 1) * (2 * l + a + b)
                z = (c1 * zs[-1] + c2 * (A @ zs[-1]) - c3 * zs[-2]) / c0
            zs.append(z)
        # fixed coefficients: cumprod(tanh(min(1/s, 1)) * s) (JGCF/modules.py:64-80)
        gamma = min(1.0 / self.scaling_factor, 1.0)
        coef_step = float(np.tanh(gamma) * self.scaling_factor)
        coefs = coef_step ** np.arange(1, self.num_layers + 2)
        stacked = jnp.stack(zs, axis=1)  # (N, L+1, D)
        return (stacked * jnp.asarray(coefs, jnp.float32)[None, :, None]).mean(1)

    def encode(self):
        x = jnp.concatenate(
            (self.user_embeddings.embedding, self.item_embeddings.embedding), axis=0
        )
        low = self._jacobi(x)
        mid = self.weight4mid * x - low
        out = jnp.concatenate([low, mid], axis=1)
        return _split_ui(out, self.User.count)

    def fit(self, data: Batch):
        user_embds, item_embds = self.encode()
        rec_loss, emb_loss = _bpr_and_reg(
            user_embds, item_embds,
            self.user_embeddings.embedding, self.item_embeddings.embedding,
            data, self,
        )
        loss = rec_loss + self.weight_decay * emb_loss
        return loss, {"rec_loss": rec_loss, "emb_loss": emb_loss}


@register("PairNorm")
class PairNormSGC(_GraphRecBase):
    """SGC propagation with PairNorm after every hop, then dropout +
    linear (PairNorm/main.py:80-150)."""

    embedding_dim: int = 64
    num_layers: int = 3
    norm_mode: str = "PN"
    norm_scale: float = 10.0
    dropout_rate: float = 0.1
    weight_decay: float = 0.0
    adj: Optional[SparseAdj] = None

    def setup(self):
        init = nn.initializers.normal(stddev=1e-4)
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=init
        )
        self.item_embeddings = nn.Embed(
            self.Item.count, self.embedding_dim, embedding_init=init
        )
        self.dropout = nn.Dropout(self.dropout_rate)
        self.linear = nn.Dense(self.embedding_dim, kernel_init=xavier_normal)

    def _pairnorm(self, x: jnp.ndarray) -> jnp.ndarray:
        col_mean = x.mean(axis=0)
        if self.norm_mode == "PN":
            x = x - col_mean
            rownorm_mean = jnp.sqrt(1e-6 + jnp.square(x).sum(axis=1).mean())
            return self.norm_scale * x / rownorm_mean
        if self.norm_mode == "PN-SI":
            x = x - col_mean
            rn = jnp.sqrt(1e-6 + jnp.square(x).sum(axis=1, keepdims=True))
            return self.norm_scale * x / rn
        if self.norm_mode == "PN-SCS":
            rn = jnp.sqrt(1e-6 + jnp.square(x).sum(axis=1, keepdims=True))
            return self.norm_scale * x / rn - col_mean
        return x

    def encode(self, deterministic: bool = True):
        x = jnp.concatenate(
            (self.user_embeddings.embedding, self.item_embeddings.embedding), axis=0
        )
        x = self._pairnorm(x)
        for _ in range(self.num_layers):
            x = self.adj @ x
            x = self._pairnorm(x)
        x = self.dropout(x, deterministic=deterministic)
        x = self.linear(x)
        return _split_ui(x, self.User.count)

    def fit(self, data: Batch):
        user_embds, item_embds = self.encode(deterministic=False)
        users = data[self.User]
        u = user_embds[users][:, None, :]
        p = item_embds[data[self.IPos]]
        n = item_embds[data[self.INeg]]
        rec_loss = criterions.bpr_with_logits(
            jnp.einsum("bkd,bkd->bk", u, p),
            jnp.einsum("bkd,bkd->bk", jnp.broadcast_to(u, n.shape), n),
        )
        return rec_loss, {"rec_loss": rec_loss}


@register("UltraGCN")
class UltraGCN(_GraphRecBase):
    """MF with degree-weighted BCE + item-item neighbor constraint
    (UltraGCN/main.py:38-200); negatives drawn on device from the full
    catalog when unseen_only=False (CoachForUltraGCN.sample_negs_from_all)."""

    embedding_dim: int = 64
    num_negs: int = 1500
    num_neighbors: int = 10
    w1: float = 1e-6
    w2: float = 1.0
    w3: float = 1e-6
    w4: float = 1.0
    item_weight: float = 5e-4  # lambda for the I-I constraint
    neg_weight: float = 300.0
    init_weight: float = 1e-4
    unseen_only: bool = False
    user_beta: Optional[np.ndarray] = None  # (U,)
    item_beta: Optional[np.ndarray] = None  # (I,)
    ii_weights: Optional[np.ndarray] = None  # (I, K)
    ii_indices: Optional[np.ndarray] = None  # (I, K)

    @classmethod
    def build_side_info(cls, dataset, num_neighbors: int = 10, chunk: int = 1024):
        """(user_beta, item_beta, ii_weights, ii_indices) — degree betas
        (UltraGCN/main.py:85-99) + top-K rows of the normalized
        co-occurrence G = D_r^-? R^T R (main.py:100-115)."""
        users, items = dataset.train().to_bigraph_edges()
        U = dataset.fields["USER", "ID"].count
        I = dataset.fields["ITEM", "ID"].count
        user_deg = np.bincount(users, minlength=U).astype(np.float64)
        item_deg = np.bincount(items, minlength=I).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            user_beta = np.sqrt(user_deg + 1) / user_deg
            item_beta = (item_deg + 1) ** -0.5
        user_beta[~np.isfinite(user_beta)] = 0.0
        item_beta[~np.isfinite(item_beta)] = 0.0

        # co-occurrence G = R^T R computed in item chunks
        R = np.zeros((U, I), dtype=np.float32)
        R[users, items] = 1.0
        ii_weights = np.zeros((I, num_neighbors), dtype=np.float32)
        ii_indices = np.zeros((I, num_neighbors), dtype=np.int64)
        # degs[i] = Σ_j G[i,j] where G = RᵀR; (RᵀR)·1 == Rᵀ(R·1)
        degs = (R.T @ R.sum(axis=1, keepdims=True)).ravel().astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            row_beta_full = np.sqrt(degs + 1) / degs
        row_beta_full[~np.isfinite(row_beta_full)] = 0.0
        col_beta = 1.0 / np.sqrt(degs + 1)
        for lo in range(0, I, chunk):
            hi = min(lo + chunk, I)
            G = R[:, lo:hi].T @ R  # (chunk, I)
            ii_weights_chunk = row_beta_full[lo:hi, None] * G * col_beta[None, :]
            idx = np.argpartition(-ii_weights_chunk, num_neighbors - 1, axis=1)[
                :, :num_neighbors
            ]
            vals = np.take_along_axis(ii_weights_chunk, idx, axis=1)
            order = np.argsort(-vals, axis=1)
            ii_indices[lo:hi] = np.take_along_axis(idx, order, axis=1)
            ii_weights[lo:hi] = np.take_along_axis(vals, order, axis=1)
        return (
            user_beta.astype(np.float32),
            item_beta.astype(np.float32),
            ii_weights,
            ii_indices,
        )

    def setup(self):
        init = nn.initializers.normal(stddev=self.init_weight)
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=init
        )
        self.item_embeddings = nn.Embed(
            self.Item.count, self.embedding_dim, embedding_init=init
        )

    def sure_trainpipe(self, batch_size: int):
        pipe = self.dataset.train().shuffled_pairs_source()
        if self.unseen_only:
            pipe = pipe.gen_train_sampling_neg_(num_negatives=self.num_negs)
        return pipe.batch_(batch_size).tensor_()

    def encode(self):
        return self.user_embeddings.embedding, self.item_embeddings.embedding

    def fit(self, data: Batch):
        user_embds, item_embds = self.encode()
        users = data[self.User]
        positives = data[self.Item]  # (B, 1) from the pairs source
        if self.INeg in data:
            negatives = data[self.INeg]
        else:
            negatives = jax.random.randint(
                self.make_rng("sampling"),
                (users.shape[0], self.num_negs),
                0,
                self.Item.count,
            )
        u = user_embds[users][:, None, :]
        pos_logits = jnp.einsum("bkd,bkd->bk", u, item_embds[positives])
        neg_logits = jnp.einsum(
            "bkd,bkd->bk",
            jnp.broadcast_to(u, (users.shape[0], negatives.shape[1], u.shape[-1])),
            item_embds[negatives],
        )
        user_beta = jnp.asarray(self.user_beta)
        item_beta = jnp.asarray(self.item_beta)
        pos_w = self.w1 + self.w2 * user_beta[users][:, None] * item_beta[positives]
        neg_w = self.w3 + self.w4 * user_beta[users][:, None] * item_beta[negatives]
        rec_pos_loss = criterions.bce_with_logits(
            pos_logits, jnp.ones_like(pos_logits), reduction="none"
        )
        rec_pos_loss = (rec_pos_loss * pos_w).sum()
        rec_neg_loss = criterions.bce_with_logits(
            neg_logits, jnp.zeros_like(neg_logits), reduction="none"
        )
        rec_neg_loss = ((rec_neg_loss * neg_w).mean(axis=-1)).sum()

        if self.item_weight > 0.0 and self.ii_indices is not None:
            p = positives[:, 0]
            neighbors = item_embds[jnp.asarray(self.ii_indices)[p]]  # (B, K, D)
            weights = jnp.asarray(self.ii_weights)[p]  # (B, K)
            scores = jnp.einsum("bkd,bd->bk", neighbors, u[:, 0, :])
            ii_loss = (-weights * jax.nn.log_sigmoid(scores)).sum()
        else:
            ii_loss = 0.0
        # combined as in CoachForUltraGCN (UltraGCN/main.py:204-208)
        loss = (
            rec_pos_loss
            + rec_neg_loss * self.neg_weight
            + ii_loss * self.item_weight
        )
        return loss, {
            "rec_pos_loss": rec_pos_loss,
            "rec_neg_loss": rec_neg_loss,
            "ii_loss": ii_loss,
        }


@register("SimpleX")
class SimpleX(_GraphRecBase):
    """gamma·user + (1-gamma)·Linear(mean of interacted item embds),
    cosine-contrastive loss with margin and negative weight
    (SimpleX/main.py:36-175)."""

    # defaults mirror the reference CLI defaults (SimpleX/main.py:14-20;
    # its Yelp quality config overrides gamma=.5, weight=100)
    embedding_dim: int = 64
    gamma: float = 1.0
    margin: float = 0.9
    weight_for_negative: float = 150.0
    num_negs: int = 1000
    dropout_rate: float = 0.1
    unseen_only: bool = False
    adj: Optional[SparseAdj] = None  # left-normalized U→I mean operator

    @classmethod
    def build_adj(cls, dataset) -> SparseAdj:
        from ... import graph

        users, items = dataset.train().to_bigraph_edges()
        U = dataset.fields["USER", "ID"].count
        I = dataset.fields["ITEM", "ID"].count
        adj = graph.SparseAdj(
            users, items, np.ones(len(users), dtype=np.float32), (U, I)
        )
        return graph.to_normalized(adj, "left")  # row-mean aggregation

    def setup(self):
        init = nn.initializers.normal(stddev=1e-4)
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=init
        )
        self.item_embeddings = nn.Embed(
            self.Item.count, self.embedding_dim, embedding_init=init
        )
        self.agg_linear = nn.Dense(
            self.embedding_dim, use_bias=False, kernel_init=xavier_normal
        )
        self.dropout = nn.Dropout(self.dropout_rate)

    def sure_trainpipe(self, batch_size: int):
        pipe = self.dataset.train().shuffled_pairs_source()
        if self.unseen_only:
            pipe = pipe.gen_train_sampling_neg_(num_negatives=self.num_negs)
        return pipe.batch_(batch_size).tensor_()

    def encode(self, deterministic: bool = True):
        items = self.item_embeddings.embedding
        agg = self.agg_linear(self.adj @ items)  # (U, D) mean-of-history
        users = self.gamma * self.user_embeddings.embedding + (1 - self.gamma) * agg
        users = _l2norm(users)
        users = self.dropout(users, deterministic=deterministic)
        return users, _l2norm(items)

    def fit(self, data: Batch):
        user_embds, item_embds = self.encode(deterministic=False)
        users = data[self.User]
        positives = data[self.Item]
        if self.INeg in data:
            negatives = data[self.INeg]
        else:
            negatives = jax.random.randint(
                self.make_rng("sampling"),
                (users.shape[0], self.num_negs),
                0,
                self.Item.count,
            )
        candidates = jnp.concatenate([positives, negatives], axis=1)
        scores = jnp.einsum(
            "bd,bkd->bk", user_embds[users], item_embds[candidates]
        )
        # cosine contrastive loss (SimpleX/main.py:62-87)
        loss_pos = nn.relu(1.0 - scores[:, 0])
        loss_neg = nn.relu(scores[:, 1:] - self.margin).mean(axis=-1)
        rec_loss = (loss_pos + loss_neg * self.weight_for_negative).mean()
        return rec_loss, {"rec_loss": rec_loss}


@register("AlphaRec")
class AlphaRec(_GraphRecBase):
    """Frozen text item features → projector → LightGCN → InfoNCE/tau
    (AlphaRec/main.py:41-150). `item_features`: (I, F) frozen language-
    model embeddings; user features = mean of interacted item features
    (left-normalized incidence @ features)."""

    embedding_dim: int = 64
    num_layers: int = 2
    num_negs: int = 256
    tau: float = 0.15
    projector: str = "mlp"
    adj: Optional[SparseAdj] = None
    item_features: Optional[np.ndarray] = None
    user_features_arr: Optional[np.ndarray] = None  # precomputed history means

    @classmethod
    def build_features(cls, dataset, item_features: np.ndarray):
        """user features = left-normalized incidence @ item features
        (AlphaRec/main.py:62-75)."""
        from ... import graph

        users, items = dataset.train().to_bigraph_edges()
        U = dataset.fields["USER", "ID"].count
        I = dataset.fields["ITEM", "ID"].count
        R = graph.to_normalized(
            graph.SparseAdj(
                users, items, np.ones(len(users), dtype=np.float32), (U, I)
            ),
            "left",
        )
        user_features = np.asarray(R @ jnp.asarray(item_features, jnp.float32))
        return item_features, user_features

    def setup(self):
        F = int(self.item_features.shape[1])
        if self.projector == "linear":
            self.proj = [nn.Dense(self.embedding_dim, kernel_init=xavier_normal)]
        else:
            self.proj = [
                nn.Dense(F // 2, kernel_init=xavier_normal),
                nn.Dense(self.embedding_dim, kernel_init=xavier_normal),
            ]

    def sure_trainpipe(self, batch_size: int):
        return (
            self.dataset.train()
            .choiced_user_ids_source()
            .gen_train_sampling_pos_()
            .gen_train_sampling_neg_(num_negatives=self.num_negs, unseen_only=True)
            .batch_(batch_size)
            .tensor_()
        )

    def _project(self, x):
        if len(self.proj) == 1:
            return self.proj[0](x)
        h = nn.leaky_relu(self.proj[0](x))
        return self.proj[1](h)

    def encode(self):
        item_feats = jnp.asarray(self.item_features, jnp.float32)
        user_feats = jnp.asarray(self.user_features_arr, jnp.float32)
        u = self._project(user_feats)
        i = self._project(item_feats)
        x = jnp.concatenate([u, i], axis=0)
        avg = x / (self.num_layers + 1)
        for _ in range(self.num_layers):
            x = self.adj @ x
            avg = avg + x / (self.num_layers + 1)
        uf, it = _split_ui(avg, self.User.count)
        return _l2norm(uf), _l2norm(it)

    def fit(self, data: Batch):
        user_embds, item_embds = self.encode()
        users = data[self.User]
        items = jnp.concatenate([data[self.IPos], data[self.INeg]], axis=-1)
        logits = (
            jnp.einsum("bd,bkd->bk", user_embds[users], item_embds[items]) / self.tau
        )
        labels = jnp.zeros((users.shape[0],), dtype=jnp.int32)
        rec_loss = criterions.cross_entropy_with_logits(logits, labels)
        return rec_loss, {"rec_loss": rec_loss}


@register("CAGCN")
class CAGCN(_GraphRecBase):
    """LightGCN propagation on a trend-reweighted adjacency
    (CAGCN/main.py:44-150); trend = per-edge mean similarity of the
    co-interacted neighborhood (jaccard/salton/lhn/cn —
    CAGCN/utils.py:28-202), fused with the sym edge weight."""

    embedding_dim: int = 64
    num_layers: int = 3
    weight_decay: float = 1e-4
    trend_coeff: float = 2.0
    adj: Optional[SparseAdj] = None  # prebuilt trend-reweighted adjacency

    @classmethod
    def build_adj(
        cls, dataset, trend_type: str = "jc", trend_coeff: float = 1.0,
        fusion: bool = True,
    ) -> SparseAdj:
        from ... import graph

        users, items = dataset.train().to_bigraph_edges()
        U = dataset.fields["USER", "ID"].count
        I = dataset.fields["ITEM", "ID"].count
        R = np.zeros((U, I), dtype=np.float32)
        R[users, items] = 1.0

        rows, cols, trend = [], [], []
        # user → item edges weighted by mean item-item similarity
        for u in range(U):
            s = np.flatnonzero(R[u])
            if not len(s):
                continue
            Usub = R[:, s].T  # (k, U)
            inter = Usub @ Usub.T
            if trend_type == "cn":
                w = inter.mean(axis=1)
            else:
                sizes = Usub.sum(axis=1)
                union = sizes[:, None] + sizes[None, :] - inter
                if trend_type == "jc":
                    sim = inter / np.maximum(union, 1e-12)
                elif trend_type == "sc":
                    sim = inter / np.maximum(
                        np.sqrt(sizes[:, None] * sizes[None, :]), 1e-12
                    )
                else:  # lhn
                    sim = inter / np.maximum(sizes[:, None] * sizes[None, :], 1e-12)
                w = sim.mean(axis=1)
            rows.extend([u] * len(s))
            cols.extend((s + U).tolist())
            trend.extend(w.tolist())
        # item → user edges weighted by mean user-user similarity
        for i in range(I):
            s = np.flatnonzero(R[:, i])
            if not len(s):
                continue
            Isub = R[s, :]  # (k, I)
            inter = Isub @ Isub.T
            if trend_type == "cn":
                w = inter.mean(axis=1)
            else:
                sizes = Isub.sum(axis=1)
                union = sizes[:, None] + sizes[None, :] - inter
                if trend_type == "jc":
                    sim = inter / np.maximum(union, 1e-12)
                elif trend_type == "sc":
                    sim = inter / np.maximum(
                        np.sqrt(sizes[:, None] * sizes[None, :]), 1e-12
                    )
                else:
                    sim = inter / np.maximum(sizes[:, None] * sizes[None, :], 1e-12)
                w = sim.mean(axis=1)
            rows.extend([i + U] * len(s))
            cols.extend(s.tolist())
            trend.extend(w.tolist())

        rows = np.asarray(rows)
        cols = np.asarray(cols)
        trend = np.asarray(trend, dtype=np.float64)
        n = U + I
        deg = np.bincount(cols, minlength=n).astype(np.float64)
        with np.errstate(divide="ignore"):
            dis = deg**-0.5
        dis[~np.isfinite(dis)] = 0.0
        edge_weight = dis[rows] * dis[cols]
        edge_norm = np.zeros(n)
        np.add.at(edge_norm, rows, edge_weight)
        trend_norm = np.zeros(n)
        np.add.at(trend_norm, rows, trend)
        with np.errstate(divide="ignore", invalid="ignore"):
            if fusion:
                vals = trend_coeff * trend / trend_norm[rows] + edge_weight
            else:
                vals = trend_coeff * trend * edge_norm[rows] / trend_norm[rows]
        vals[~np.isfinite(vals)] = 0.0
        return graph.SparseAdj(rows, cols, vals.astype(np.float32), (n, n))

    def setup(self):
        init = nn.initializers.normal(stddev=1e-4)
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=init
        )
        self.item_embeddings = nn.Embed(
            self.Item.count, self.embedding_dim, embedding_init=init
        )

    def encode(self):
        x = jnp.concatenate(
            (self.user_embeddings.embedding, self.item_embeddings.embedding), axis=0
        )
        avg = x / (self.num_layers + 1)
        for _ in range(self.num_layers):
            x = self.adj @ x
            avg = avg + x / (self.num_layers + 1)
        return _split_ui(avg, self.User.count)

    def fit(self, data: Batch):
        user_embds, item_embds = self.encode()
        rec_loss, emb_loss = _bpr_and_reg(
            user_embds, item_embds,
            self.user_embeddings.embedding, self.item_embeddings.embedding,
            data, self,
        )
        loss = rec_loss + self.weight_decay * emb_loss
        return loss, {"rec_loss": rec_loss, "emb_loss": emb_loss}
