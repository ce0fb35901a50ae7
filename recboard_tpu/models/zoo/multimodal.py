"""Multimodal family: MMGCN, LATTICE, FREEDOM, BM3, MGCN.

All consume frozen-ish visual/textual item feature matrices (the
reference loads pickles produced by encode_*_features notebooks and
wraps them in trainable nn.Embedding — here they are trainable flax
params initialized from the provided arrays).

References: MMGCN/main.py:46-290 (per-modality GCN towers fused with ID
embds); LATTICE/main.py:60-230 (learnable modality kNN item graph
blended with the frozen one); FREEDOM/main.py:60-330 (frozen modality
kNN graph + degree-sampled UI graph); BM3/main.py:51-220 (BYOL-style
bootstrapped targets, no negatives); MGCN/main.py:40-310 (gated
purifier + behavior-aware fusion + InfoNCE).

TPU notes: item-item kNN propagation is row-gather + weighted sum
(y[i] = Σ_k w[i,k]·x[nbr[i,k]]) — no scatter, fully dense MXU/VPU work;
with top-k rows the degree is exactly k so the sym normalization
reduces to w/k. FREEDOM's per-epoch multinomial edge sampling becomes
per-step on-device Bernoulli keeps with matching expected degree
(structure static, weights re-normalized in-jit like SGL).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import criterions
from ...graph import SparseAdj
from ..base import Batch
from ..modules import xavier_normal
from . import register
from .graph_cf import _GraphRecBase, _l2norm, _split_ui

Array = np.ndarray


def _np_l2norm(x: Array) -> Array:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def knn_graph_np(features: Array, k: int) -> Tuple[Array, Array]:
    """(indices (I,k), weights (I,k)): top-k cosine neighbors with the
    1/k 'degree' normalization (FREEDOM/main.py:117-136 — asymmetric)."""
    f = _np_l2norm(np.asarray(features, np.float64))
    sim = f @ f.T
    idx = np.argpartition(-sim, kth=min(k, sim.shape[1] - 1), axis=1)[:, :k]
    w = np.take_along_axis(sim, idx, axis=1)
    return idx.astype(np.int32), (w / k).astype(np.float32)


def knn_propagate(x: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """y[i] = Σ_k w[i,k] · x[idx[i,k]] — the row-sparse item graph SpMM."""
    return jnp.einsum("ik,ikd->id", w, x[idx])


def knn_graph_jax(features: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable learnable kNN graph (LATTICE/main.py:109-129):
    top-k of the cosine similarity, weights = sim/k."""
    f = _l2norm(features)
    sim = jnp.einsum("id,jd->ij", f, f, preferred_element_type=jnp.float32)
    w, idx = jax.lax.top_k(sim, k)
    return idx, w / k


class _MMBase(_GraphRecBase):
    """Shared pairs-source trainpipe (positives travel under Item)."""

    def sure_trainpipe(self, batch_size: int):
        return (
            self.dataset.train()
            .shuffled_pairs_source()
            .gen_train_sampling_neg_(num_negatives=1)
            .batch_(batch_size)
            .tensor_()
        )

    def _positives(self, data: Batch):
        return data[self.Item] if self.Item in data else data[self.IPos]


@register("MMGCN")
class MMGCN(_MMBase):
    """Per-modality GCN towers over the left-normalized UI adjacency,
    fused with ID embeddings, averaged over modalities."""
    REQUIRES_MODALITY = True

    embedding_dim: int = 64
    num_layers: int = 3
    fusion_mode: str = "cat"
    weight_decay: float = 1e-4
    vfeat_hidden: int = 256
    adj: Optional[SparseAdj] = None  # left-normalized (U+I) adjacency
    vfeats: Optional[Array] = None
    tfeats: Optional[Array] = None

    @classmethod
    def build_adj(cls, dataset) -> SparseAdj:
        return dataset.train().to_normalized_adj("left")

    def setup(self):
        init = nn.initializers.normal(stddev=1e-4)
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=init
        )
        self.item_embeddings = nn.Embed(
            self.Item.count, self.embedding_dim, embedding_init=init
        )
        towers = []
        if self.vfeats is not None:
            self.v_projector = nn.Dense(self.vfeat_hidden, kernel_init=xavier_normal)
            towers.append(("v", self.vfeat_hidden))
        if self.tfeats is not None:
            towers.append(("t", int(self.tfeats.shape[1])))
        self._towers = tuple(towers)
        for name, fdim in towers:
            setattr(
                self,
                f"{name}_user",
                self.param(f"{name}_user", xavier_normal, (self.User.count, fdim)),
            )
            setattr(
                self,
                f"{name}_aggr",
                [
                    nn.Dense(fdim if l == 0 else self.embedding_dim,
                             kernel_init=xavier_normal)
                    for l in range(self.num_layers)
                ],
            )
            setattr(
                self,
                f"{name}_m2id",
                [nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
                 for _ in range(self.num_layers)],
            )
            setattr(
                self,
                f"{name}_fusion",
                [nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
                 for _ in range(self.num_layers)],
            )

    def _tower(self, name: str, m_item: jnp.ndarray, id_embds: jnp.ndarray):
        x = jnp.concatenate([getattr(self, f"{name}_user"), m_item], axis=0)
        x = _l2norm(x)
        for l in range(self.num_layers):
            aggr = getattr(self, f"{name}_aggr")[l]
            m2id = getattr(self, f"{name}_m2id")[l]
            fusion = getattr(self, f"{name}_fusion")[l]
            h = nn.leaky_relu(self.adj @ aggr(x))
            x_hat = nn.leaky_relu(m2id(x)) + id_embds
            if self.fusion_mode == "cat":
                x = nn.leaky_relu(fusion(jnp.concatenate([h, x_hat], axis=-1)))
            else:
                x = nn.leaky_relu(fusion(h) + x_hat)
        return x

    def encode(self):
        id_embds = jnp.concatenate(
            (self.user_embeddings.embedding, self.item_embeddings.embedding), axis=0
        )
        outs = []
        for name, _ in self._towers:
            feats = jnp.asarray(
                self.vfeats if name == "v" else self.tfeats, jnp.float32
            )
            if name == "v":
                feats = self.v_projector(feats)
            outs.append(self._tower(name, feats, id_embds))
        avg = sum(outs) / len(outs)
        return _split_ui(avg, self.User.count)

    def fit(self, data: Batch):
        user_embds, item_embds = self.encode()
        users = data[self.User]
        positives = self._positives(data)
        negatives = data[self.INeg]
        u = user_embds[users][:, None, :]
        rec_loss = criterions.bpr_with_logits(
            jnp.einsum("bkd,bkd->bk", u, item_embds[positives]),
            jnp.einsum(
                "bkd,bkd->bk",
                jnp.broadcast_to(u, (*negatives.shape, u.shape[-1])),
                item_embds[negatives],
            ),
        )
        emb_loss = criterions.BaseCriterion.regularize(
            [
                self.user_embeddings(users),
                self.item_embeddings(positives),
                self.item_embeddings(negatives),
            ],
            rtype="l2",
        ) / users.shape[0]
        for name, _ in self._towers:
            emb_loss = emb_loss + jnp.square(getattr(self, f"{name}_user")).mean()
        loss = rec_loss + self.weight_decay * emb_loss
        return loss, {"rec_loss": rec_loss, "emb_loss": emb_loss}


@register("LATTICE")
class LATTICE(_MMBase):
    """UI LightGCN + learnable modality kNN item graph
    (origin_ratio · frozen + (1-ratio) · learned from projected feats)."""
    REQUIRES_MODALITY = True

    embedding_dim: int = 64
    num_ui_layers: int = 2
    num_ii_layers: int = 1
    knn_k: int = 10
    origin_ratio: float = 0.5
    weight_decay: float = 1e-4
    adj: Optional[SparseAdj] = None
    vfeats: Optional[Array] = None
    tfeats: Optional[Array] = None
    v_origin: Optional[Tuple[Array, Array]] = None  # knn_graph_np output
    t_origin: Optional[Tuple[Array, Array]] = None

    def sure_trainpipe(self, batch_size: int):
        return (
            self.dataset.train()
            .choiced_user_ids_source()
            .gen_train_sampling_pos_()
            .gen_train_sampling_neg_(num_negatives=1)
            .batch_(batch_size)
            .tensor_()
        )

    def setup(self):
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=xavier_normal
        )
        self.item_embeddings = nn.Embed(
            self.Item.count, self.embedding_dim, embedding_init=xavier_normal
        )
        mods = []
        if self.vfeats is not None:
            self.v_projector = nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
            self.v_table = self.param(
                "v_feats", lambda k, s: jnp.asarray(self.vfeats, jnp.float32),
                self.vfeats.shape,
            )
            mods.append("v")
        if self.tfeats is not None:
            self.t_projector = nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
            self.t_table = self.param(
                "t_feats", lambda k, s: jnp.asarray(self.tfeats, jnp.float32),
                self.tfeats.shape,
            )
            mods.append("t")
        self._mods = tuple(mods)
        self.alpha = self.param("alpha", lambda k, s: jnp.full(s, 0.5), (2,))

    def _ii_propagate(self, item_embds: jnp.ndarray) -> jnp.ndarray:
        weight = nn.softmax(self.alpha)
        contribs = []
        for i, name in enumerate(self._mods):
            table = self.v_table if name == "v" else self.t_table
            proj = self.v_projector if name == "v" else self.t_projector
            o_idx, o_w = (self.v_origin if name == "v" else self.t_origin)
            l_idx, l_w = knn_graph_jax(proj(table), self.knn_k)
            x = item_embds
            for _ in range(self.num_ii_layers):
                origin = knn_propagate(x, jnp.asarray(o_idx), jnp.asarray(o_w))
                learned = knn_propagate(x, l_idx, l_w)
                x = self.origin_ratio * origin + (1 - self.origin_ratio) * learned
            contribs.append(weight[i] * x)
        return sum(contribs)

    def encode(self):
        x = jnp.concatenate(
            (self.user_embeddings.embedding, self.item_embeddings.embedding), axis=0
        )
        avg = x / (self.num_ui_layers + 1)
        for _ in range(self.num_ui_layers):
            x = self.adj @ x
            avg = avg + x / (self.num_ui_layers + 1)
        u, it = _split_ui(avg, self.User.count)
        ii = self._ii_propagate(self.item_embeddings.embedding)
        return u, it + _l2norm(ii)

    def fit(self, data: Batch):
        user_embds, item_embds = self.encode()
        users = data[self.User]
        positives = data[self.IPos]
        negatives = data[self.INeg]
        u = user_embds[users][:, None, :]
        rec_loss = criterions.bpr_with_logits(
            jnp.einsum("bkd,bkd->bk", u, item_embds[positives]),
            jnp.einsum(
                "bkd,bkd->bk",
                jnp.broadcast_to(u, (*negatives.shape, u.shape[-1])),
                item_embds[negatives],
            ),
        )
        emb_loss = criterions.BaseCriterion.regularize(
            [
                self.user_embeddings(users),
                self.item_embeddings(positives),
                self.item_embeddings(negatives),
            ],
            rtype="l2",
        ) / users.shape[0]
        loss = rec_loss + self.weight_decay * emb_loss
        return loss, {"rec_loss": rec_loss, "emb_loss": emb_loss}


@register("FREEDOM")
class FREEDOM(_MMBase):
    """Frozen modality kNN item graph + degree-sampled UI graph in
    training; modality BPR heads; full Adj at eval."""
    REQUIRES_MODALITY = True

    embedding_dim: int = 64
    num_ui_layers: int = 2
    num_ii_layers: int = 1
    knn_k: int = 10
    weight4mAdj: float = 0.1  # visual weight in the fused kNN graph
    sampling_ratio: float = 0.2
    mod_weight: float = 0.01  # weight of the modality BPR heads
    weight_decay: float = 1e-4
    adj: Optional[SparseAdj] = None  # full sym-normalized (eval)
    vfeats: Optional[Array] = None
    tfeats: Optional[Array] = None
    m_knn: Optional[Tuple[Array, Array]] = None  # fused modality kNN

    @classmethod
    def build_m_knn(cls, vfeats, tfeats, knn_k=10, weight4mAdj=0.1):
        """Fused (idx, w) pair — weights blended where both exist:
        since index sets differ, keep both scaled halves concatenated."""
        parts = []
        if vfeats is not None:
            vi, vw = knn_graph_np(vfeats, knn_k)
            parts.append((vi, vw * (weight4mAdj if tfeats is not None else 1.0)))
        if tfeats is not None:
            ti, tw = knn_graph_np(tfeats, knn_k)
            parts.append((ti, tw * ((1 - weight4mAdj) if vfeats is not None else 1.0)))
        idx = np.concatenate([p[0] for p in parts], axis=1)
        w = np.concatenate([p[1] for p in parts], axis=1)
        return idx, w

    def setup(self):
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=xavier_normal
        )
        self.item_embeddings = nn.Embed(
            self.Item.count, self.embedding_dim, embedding_init=xavier_normal
        )
        if self.vfeats is not None:
            self.v_table = self.param(
                "v_feats", lambda k, s: jnp.asarray(self.vfeats, jnp.float32),
                self.vfeats.shape,
            )
            self.v_projector = nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
        if self.tfeats is not None:
            self.t_table = self.param(
                "t_feats", lambda k, s: jnp.asarray(self.tfeats, jnp.float32),
                self.tfeats.shape,
            )
            self.t_projector = nn.Dense(self.embedding_dim, kernel_init=xavier_normal)

    def _ui_propagate(self, adj):
        x = jnp.concatenate(
            (self.user_embeddings.embedding, self.item_embeddings.embedding), axis=0
        )
        avg = x / (self.num_ui_layers + 1)
        for _ in range(self.num_ui_layers):
            x = adj @ x
            avg = avg + x / (self.num_ui_layers + 1)
        return _split_ui(avg, self.User.count)

    def _sampled_adj(self, rng) -> SparseAdj:
        """Per-step Bernoulli edge keep (≈ the reference's per-epoch
        degree-weighted multinomial, FREEDOM/main.py:216-233) with
        on-device sym renormalization."""
        adj = self.adj
        keep = (
            jax.random.uniform(rng, adj.vals.shape) < self.sampling_ratio
        ).astype(jnp.float32)
        w = adj.vals * 0 + keep  # structure weights ∈ {0,1}
        n = adj.shape[0]
        deg = jax.ops.segment_sum(w, adj.rows, num_segments=n, indices_are_sorted=True)
        deg_in = jax.ops.segment_sum(w, adj.cols, num_segments=n)
        dis = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
        dis_in = jnp.where(deg_in > 0, jax.lax.rsqrt(jnp.maximum(deg_in, 1e-12)), 0.0)
        out = SparseAdj.__new__(SparseAdj)
        out.rows, out.cols = adj.rows, adj.cols
        out.vals = dis[adj.rows] * w * dis_in[adj.cols]
        out.shape = adj.shape
        return out

    def _modal(self):
        v = (
            self.v_projector(self.v_table) if self.vfeats is not None else None
        )
        t = (
            self.t_projector(self.t_table) if self.tfeats is not None else None
        )
        return v, t

    def _ii(self, item_embds):
        idx = jnp.asarray(self.m_knn[0])
        w = jnp.asarray(self.m_knn[1])
        x = item_embds
        for _ in range(self.num_ii_layers):
            x = knn_propagate(x, idx, w)
        return x

    def encode(self, train_adj: Optional[SparseAdj] = None):
        u, it = self._ui_propagate(train_adj if train_adj is not None else self.adj)
        ii = self._ii(self.item_embeddings.embedding)
        v, t = self._modal()
        return u, it + ii, v, t

    def reset_ranking_buffers(self) -> Any:
        u, it, _, _ = self.encode()
        return u, it

    def fit(self, data: Batch):
        adj = self._sampled_adj(self.make_rng("sampling"))
        user_embds, item_embds, v, t = self.encode(train_adj=adj)
        users = data[self.User]
        positives = self._positives(data)
        negatives = data[self.INeg]
        u = user_embds[users][:, None, :]
        rec_loss = criterions.bpr_with_logits(
            jnp.einsum("bkd,bkd->bk", u, item_embds[positives]),
            jnp.einsum(
                "bkd,bkd->bk",
                jnp.broadcast_to(u, (*negatives.shape, u.shape[-1])),
                item_embds[negatives],
            ),
        )
        mod_loss = 0.0
        for feats in (v, t):
            if feats is not None:
                mod_loss = mod_loss + criterions.bpr_with_logits(
                    jnp.einsum("bkd,bkd->bk", u, feats[positives]),
                    jnp.einsum(
                        "bkd,bkd->bk",
                        jnp.broadcast_to(u, (*negatives.shape, u.shape[-1])),
                        feats[negatives],
                    ),
                )
        emb_loss = criterions.BaseCriterion.regularize(
            [
                self.user_embeddings(users),
                self.item_embeddings(positives),
                self.item_embeddings(negatives),
            ],
            rtype="l2",
        ) / users.shape[0]
        loss = rec_loss + self.mod_weight * mod_loss + self.weight_decay * emb_loss
        return loss, {"rec_loss": rec_loss, "mod_loss": mod_loss, "emb_loss": emb_loss}


@register("BM3")
class BM3(_MMBase):
    """BYOL-style bootstrapped latent targets, no negatives
    (BM3/main.py:51-220)."""

    embedding_dim: int = 64
    num_layers: int = 3
    dropout_rate: float = 0.5
    reg_weight: float = 0.1
    second_l: float = 2.0  # weight of the modality losses
    adj: Optional[SparseAdj] = None
    vfeats: Optional[Array] = None
    tfeats: Optional[Array] = None

    def sure_trainpipe(self, batch_size: int):
        return (
            self.dataset.train().shuffled_pairs_source().batch_(batch_size).tensor_()
        )

    def setup(self):
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=xavier_normal
        )
        self.item_embeddings = nn.Embed(
            self.Item.count, self.embedding_dim, embedding_init=xavier_normal
        )
        self.predictor = nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
        if self.vfeats is not None:
            self.v_table = self.param(
                "v_feats", lambda k, s: jnp.asarray(self.vfeats, jnp.float32),
                self.vfeats.shape,
            )
            self.image_trs = nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
        if self.tfeats is not None:
            self.t_table = self.param(
                "t_feats", lambda k, s: jnp.asarray(self.tfeats, jnp.float32),
                self.tfeats.shape,
            )
            self.text_trs = nn.Dense(self.embedding_dim, kernel_init=xavier_normal)

    def encode(self):
        x = jnp.concatenate(
            (self.user_embeddings.embedding, self.item_embeddings.embedding), axis=0
        )
        avg = x / (self.num_layers + 1)
        for _ in range(self.num_layers):
            x = self.adj @ x
            avg = avg + x / (self.num_layers + 1)
        u, it = _split_ui(avg, self.User.count)
        return u, it + self.item_embeddings.embedding

    @staticmethod
    def _cos(a, b):
        return (_l2norm(a) * _l2norm(b)).sum(-1)

    def fit(self, data: Batch):
        users = data[self.User]
        items = self._positives(data)[:, 0]
        rng = self.make_rng("dropout")
        u_ori, i_ori = self.encode()

        def drop(x, key):
            keep = jax.random.bernoulli(key, 1 - self.dropout_rate, x.shape)
            return jax.lax.stop_gradient(x) * keep / (1 - self.dropout_rate)

        u_tgt = drop(u_ori, jax.random.fold_in(rng, 0))
        i_tgt = drop(i_ori, jax.random.fold_in(rng, 1))
        u_on = self.predictor(u_ori)[users]
        i_on = self.predictor(i_ori)[items]
        u_tgt_b = u_tgt[users]
        i_tgt_b = i_tgt[items]

        loss_ui = 1 - self._cos(u_on, i_tgt_b).mean()
        loss_iu = 1 - self._cos(i_on, u_tgt_b).mean()

        mod = 0.0
        if self.tfeats is not None:
            t_online = self.text_trs(self.t_table)
            t_tgt = drop(t_online, jax.random.fold_in(rng, 2))[items]
            t_on = self.predictor(t_online)[items]
            mod = mod + (1 - self._cos(t_on, i_tgt_b).mean())
            mod = mod + (1 - self._cos(t_on, t_tgt).mean())
        if self.vfeats is not None:
            v_online = self.image_trs(self.v_table)
            v_tgt = drop(v_online, jax.random.fold_in(rng, 3))[items]
            v_on = self.predictor(v_online)[items]
            mod = mod + (1 - self._cos(v_on, i_tgt_b).mean())
            mod = mod + (1 - self._cos(v_on, v_tgt).mean())

        reg = (
            jnp.linalg.norm(u_ori) + jnp.linalg.norm(i_ori)
        ) / i_ori.shape[0]
        loss = loss_ui + loss_iu + self.reg_weight * reg + self.second_l * mod
        return loss, {"rec_loss": loss}


@register("MGCN")
class MGCN(_MMBase):
    """Gated modality purifier + behavior-aware fusion + InfoNCE."""
    REQUIRES_MODALITY = True

    embedding_dim: int = 64
    num_layers: int = 2
    knn_k: int = 10
    temperature: float = 0.2
    cl_weight: float = 0.01
    weight_decay: float = 1e-4
    adj: Optional[SparseAdj] = None  # (U+I) sym-normalized
    r_adj: Optional[SparseAdj] = None  # sym-normalized U→I incidence
    vfeats: Optional[Array] = None
    tfeats: Optional[Array] = None
    v_knn: Optional[Tuple[Array, Array]] = None
    t_knn: Optional[Tuple[Array, Array]] = None

    @classmethod
    def build_r_adj(cls, dataset) -> SparseAdj:
        from ... import graph

        users, items = dataset.train().to_bigraph_edges()
        U = dataset.fields["USER", "ID"].count
        I = dataset.fields["ITEM", "ID"].count
        user_deg = np.bincount(users, minlength=U).astype(np.float64)
        item_deg = np.bincount(items, minlength=I).astype(np.float64)
        with np.errstate(divide="ignore"):
            du = user_deg**-0.5
            di = item_deg**-0.5
        du[~np.isfinite(du)] = 0.0
        di[~np.isfinite(di)] = 0.0
        vals = (du[users] * di[items]).astype(np.float32)
        return graph.SparseAdj(users, items, vals, (U, I))

    def setup(self):
        self.user_embeddings = nn.Embed(
            self.User.count, self.embedding_dim, embedding_init=xavier_normal
        )
        self.item_embeddings = nn.Embed(
            self.Item.count, self.embedding_dim, embedding_init=xavier_normal
        )
        mods = []
        if self.vfeats is not None:
            self.v_table = self.param(
                "v_feats", lambda k, s: jnp.asarray(self.vfeats, jnp.float32),
                self.vfeats.shape,
            )
            self.v_proj = nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
            self.v_gate = nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
            mods.append("v")
        if self.tfeats is not None:
            self.t_table = self.param(
                "t_feats", lambda k, s: jnp.asarray(self.tfeats, jnp.float32),
                self.tfeats.shape,
            )
            self.t_proj = nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
            self.t_gate = nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
            mods.append("t")
        self._mods = tuple(mods)
        self.query_common_1 = nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
        self.query_common_2 = nn.Dense(1, use_bias=False, kernel_init=xavier_normal)
        self.preference_gates = [
            nn.Dense(self.embedding_dim, kernel_init=xavier_normal)
            for _ in range(len(mods))
        ]

    def _purify(self, name, item_embds):
        table = self.v_table if name == "v" else self.t_table
        proj = self.v_proj if name == "v" else self.t_proj
        gate = self.v_gate if name == "v" else self.t_gate
        m = proj(table)
        return item_embds * nn.sigmoid(gate(m))

    def encode(self):
        id_embds = jnp.concatenate(
            (self.user_embeddings.embedding, self.item_embeddings.embedding), axis=0
        )
        item_embds = self.item_embeddings.embedding
        m_list = []
        for name in self._mods:
            knn = self.v_knn if name == "v" else self.t_knn
            m = self._purify(name, item_embds)
            m_i = knn_propagate(m, jnp.asarray(knn[0]), jnp.asarray(knn[1]))
            m_u = self.r_adj @ m_i
            m_list.append(jnp.concatenate([m_u, m_i], axis=0))
        m_embds = jnp.stack(m_list, axis=1)  # (N, X, D)

        x = id_embds
        avg = x / (self.num_layers + 1)
        for _ in range(self.num_layers):
            x = self.adj @ x
            avg = avg + x / (self.num_layers + 1)
        i_embds = avg  # (N, D)

        prefs = jnp.stack(
            [nn.sigmoid(g(i_embds)) for g in self.preference_gates], axis=1
        )
        att = self.query_common_2(nn.tanh(self.query_common_1(m_embds)))  # (N,X,1)
        wc = nn.softmax(att, axis=1)
        shared = (m_embds * wc).sum(1, keepdims=True)
        selfe = m_embds - shared
        fused = jnp.concatenate([shared, selfe * prefs], axis=1).mean(1)

        final = i_embds + fused
        u, it = _split_ui(final, self.User.count)
        return u, it, fused, i_embds

    def reset_ranking_buffers(self) -> Any:
        u, it, _, _ = self.encode()
        return u, it

    def _infonce(self, a, b):
        a, b = _l2norm(a), _l2norm(b)
        pos = jnp.exp((a * b).sum(-1) / self.temperature)
        ttl = jnp.exp(
            jnp.einsum("id,jd->ij", a, b) / self.temperature
        ).sum(axis=1)
        return -jnp.log(jnp.maximum(pos / jnp.maximum(ttl, 1e-20), 1e-20)).mean()

    def fit(self, data: Batch):
        user_embds, item_embds, m_embds, i_embds = self.encode()
        users = data[self.User]
        positives = self._positives(data)
        negatives = data[self.INeg]
        u = user_embds[users][:, None, :]
        candidates = jnp.concatenate([positives, negatives], axis=1)
        scores = jnp.einsum("bkd,bd->bk", item_embds[candidates], u[:, 0, :])
        rec_loss = criterions.bpr_with_logits(scores[:, :1], scores[:, 1:])

        m_u, m_i = _split_ui(m_embds, self.User.count)
        i_u, i_i = _split_ui(i_embds, self.User.count)
        p = positives[:, 0]
        cl_loss = self._infonce(m_u[users], i_u[users]) + self._infonce(
            m_i[p], i_i[p]
        )
        emb_loss = criterions.BaseCriterion.regularize(
            [
                self.user_embeddings(users),
                self.item_embeddings(positives),
                self.item_embeddings(negatives),
            ],
            rtype="l2",
        ) / users.shape[0]
        loss = rec_loss + self.cl_weight * cl_loss + self.weight_decay * emb_loss
        return loss, {"rec_loss": rec_loss, "cl_loss": cl_loss, "emb_loss": emb_loss}
