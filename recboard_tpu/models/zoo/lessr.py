"""LESSR: lossless session-graph encoding with EOPA/SGAT layers.

Reference: LESSR/main.py:34-220 + LESSR/modules.py:7-188 — per session:
unique-item nodes, EOP multigraph (consecutive transitions, edge order
preserved) and shortcut graph (dedup'd pairs); alternating EOPA (GRU
over in-neighbors in edge order) and SGAT (additive attention over
shortcut in-neighbors, with the reference's `v = fc_k(x)` quirk
replicated) layers with feature concatenation; attentive readout
against the last node; CE loss over the catalog.

TPU-first redesign: sessions are padded to maxlen and graphs are dense
per-session tensors — node features (B, L, D), an EOP in-neighbor
index matrix (B, L, L-1) ordered by edge appearance (GRU runs over it
like the reference's to_dense_batch, padding included), and a shortcut
adjacency mask (B, L, L). Graph construction has two equivalent paths
(pinned equal by tests/test_lessr_device.py): the `lessr_graph_` host
pipe transform, and `derive_session_graphs` — the same tensors built
IN-JIT from the padded ISeq, which lets a plain DeviceRollSeqSampler
feed LESSR at reference scale (no per-batch host graphs over the
tunnel). Everything else is static-shape jnp.
BatchNorm is replaced by per-batch masked standardization (no running
stats — noted deviation)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import criterions
from ...data.fields import Field
from ...data.pipes import DataPipe, functional_datapipe
from ...data.tags import ITEM, SEQUENCE
from ..base import Batch, SeqRecArch
from ..modules import xavier_normal
from . import register

# graph fields travel beside the standard ones
NodeItems = Field("LessrNodes", (ITEM, SEQUENCE))
Pos2Node = Field("LessrPos2Node", (SEQUENCE,))
EOPNbr = Field("LessrEOPNbr", (SEQUENCE,))
EOPDeg = Field("LessrEOPDeg", (SEQUENCE,))
ShortMask = Field("LessrShortMask", (SEQUENCE,))
NodeMask = Field("LessrNodeMask", (SEQUENCE,))
LastNode = Field("LessrLastNode", ())


@functional_datapipe("lessr_graph_")
class LessrGraphBuilder(DataPipe):
    """Rows with padded ISeq → dense per-session graph tensors."""

    def __init__(self, source, maxlen: int, padding_value: int = 0):
        super().__init__(source)
        self.maxlen = maxlen
        self.padding_value = padding_value

    def __iter__(self):
        L = self.maxlen
        ISeq = self.Item.fork(SEQUENCE)
        for row in self.source:
            seq = np.asarray(row[ISeq], dtype=np.int64)
            valid = seq != self.padding_value
            items = seq[valid]
            uniq, inverse = np.unique(items, return_inverse=True)
            # first-appearance order for nodes
            first = np.full(len(uniq), len(items), dtype=np.int64)
            np.minimum.at(first, inverse, np.arange(len(items)))
            order = np.argsort(first, kind="stable")
            rank = np.empty_like(order)
            rank[order] = np.arange(len(order))
            node_of = rank[inverse]  # per valid position
            n = len(uniq)

            node_items = np.zeros(L, dtype=np.int64)
            node_items[:n] = uniq[order]
            node_mask = np.zeros(L, dtype=bool)
            node_mask[:n] = True

            pos2node = np.zeros(L, dtype=np.int64)
            pos2node[: len(node_of)] = node_of
            last_node = node_of[-1] if len(node_of) else 0

            # EOP in-neighbors per node, in edge order
            eop_nbr = np.zeros((L, L - 1), dtype=np.int64)
            eop_deg = np.zeros(L, dtype=np.int64)
            for t in range(len(node_of) - 1):
                dst = node_of[t + 1]
                eop_nbr[dst, eop_deg[dst]] = node_of[t]
                eop_deg[dst] += 1

            short = np.zeros((L, L), dtype=bool)
            if len(node_of) > 1:
                short[node_of[1:], node_of[:-1]] = True  # short[dst, src]

            row = dict(row)
            row[NodeItems] = tuple(node_items.tolist())
            row[Pos2Node] = tuple(pos2node.tolist())
            row[EOPNbr] = tuple(tuple(r) for r in eop_nbr.tolist())
            row[EOPDeg] = tuple(eop_deg.tolist())
            row[ShortMask] = tuple(tuple(r) for r in short.tolist())
            row[NodeMask] = tuple(bool(v) for v in node_mask.tolist())
            row[LastNode] = int(last_node)
            yield row


def derive_session_graphs(iseq: jnp.ndarray, padding_value: int = 0):
    """Jit-traceable equivalent of ``lessr_graph_`` — dense session
    graph tensors computed ON DEVICE from the (left-padded) ISeq, so a
    plain device sampler (DeviceRollSeqSampler) can feed LESSR without
    per-batch host graph construction (the reason LESSR was toy-store
    only through r4: the host builder made XL epochs tunnel-bound).

    All O(L^2)/O(L^3-bool) intermediates are static-shape; at L=50,
    B=256 they are <7 MB — noise next to the model's (B, L, L-1, D)
    EOPA gather. Semantics pinned against the host builder by
    tests/test_lessr_device.py."""
    B, L = iseq.shape
    rows = jnp.arange(B)[:, None]
    valid = iseq != padding_value
    # lpad → valid is a suffix; rotate each row so valid items form a
    # PREFIX in original order (the host builder's seq[valid])
    npad = (~valid).sum(-1)
    pos = (jnp.arange(L)[None, :] + npad[:, None]) % L
    seq = jnp.take_along_axis(iseq, pos, axis=1)
    m = jnp.take_along_axis(valid, pos, axis=1)  # prefix True
    k = m.sum(-1)  # session length

    # node ids by first-appearance order (np.unique + stable argsort
    # of first positions in the host builder)
    eq = (seq[:, :, None] == seq[:, None, :]) & m[:, :, None] & m[:, None, :]
    firstpos = jnp.argmax(eq, axis=2)  # first j with seq[j]==seq[i]
    is_first = (firstpos == jnp.arange(L)[None, :]) & m
    cf = jnp.cumsum(is_first, axis=1)
    node_of = jnp.take_along_axis(cf, firstpos, axis=1) - 1  # (B, L)
    n = cf[:, -1]

    node_items = jnp.zeros((B, L), iseq.dtype).at[
        rows, jnp.where(is_first, node_of, L)
    ].set(seq, mode="drop")
    node_mask = jnp.arange(L)[None, :] < n[:, None]
    last_node = jnp.take_along_axis(
        node_of, jnp.maximum(k - 1, 0)[:, None], axis=1
    )[:, 0]

    # EOP multigraph: edges (node_of[t] -> node_of[t+1]) in t order;
    # per-dst in-neighbor slots = count of earlier edges to the same dst
    src = node_of[:, :-1]
    dst = node_of[:, 1:]
    evalid = m[:, 1:]  # t+1 valid ⇒ t valid in the prefix layout
    eqd = (dst[:, :, None] == dst[:, None, :]) & evalid[:, None, :]
    tri = jnp.tril(jnp.ones((L - 1, L - 1), bool), k=-1)
    slot = (eqd & tri[None]).sum(-1)  # (B, L-1)
    eop_nbr = jnp.zeros((B, L, L - 1), iseq.dtype).at[
        rows, jnp.where(evalid, dst, L), slot
    ].set(src, mode="drop")
    eop_deg = jnp.zeros((B, L), iseq.dtype).at[
        rows, jnp.where(evalid, dst, L)
    ].add(evalid.astype(iseq.dtype), mode="drop")

    short = jnp.zeros((B, L, L), bool).at[
        rows, jnp.where(evalid, dst, L), src
    ].set(True, mode="drop")
    return {
        NodeItems: node_items,
        NodeMask: node_mask,
        EOPNbr: eop_nbr,
        EOPDeg: eop_deg,
        ShortMask: short,
        LastNode: last_node,
    }


def _masked_standardize(x, mask, eps=1e-5):
    """BatchNorm-without-running-stats over valid nodes (deviation)."""
    m = mask[..., None].astype(x.dtype)
    count = jnp.maximum(m.sum(axis=(0, 1)), 1.0)
    mean = (x * m).sum(axis=(0, 1)) / count
    var = (jnp.square(x - mean) * m).sum(axis=(0, 1)) / count
    return (x - mean) * jax.lax.rsqrt(var + eps)


class EOPA(nn.Module):
    input_dim: int
    output_dim: int
    dropout_rate: float = 0.0
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x, eop_nbr, eop_deg, node_mask, deterministic=True):
        B, L, D = x.shape
        if self.batch_norm:
            x = _masked_standardize(x, node_mask)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        # gather in-neighbor features: (B, L, L-1, D)
        nbr = jnp.take_along_axis(
            x[:, None, :, :].repeat(L, axis=1), eop_nbr[..., None], axis=2
        )
        nbr = nbr * (
            jnp.arange(L - 1)[None, None, :, None] < eop_deg[..., None, None]
        )
        gru = nn.RNN(
            nn.GRUCell(
                self.input_dim,
                kernel_init=nn.initializers.xavier_uniform(),
                recurrent_kernel_init=nn.initializers.xavier_uniform(),
            )
        )
        hn = gru(nbr.reshape(B * L, L - 1, D))[:, -1, :].reshape(B, L, D)
        out = nn.Dense(self.output_dim, use_bias=False, kernel_init=xavier_normal)(
            x
        ) + nn.Dense(self.output_dim, use_bias=False, kernel_init=xavier_normal)(hn)
        return nn.PReLU()(out)


class SGAT(nn.Module):
    input_dim: int
    hidden_dim: int
    output_dim: int
    dropout_rate: float = 0.0
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x, short_mask, node_mask, deterministic=True):
        if self.batch_norm:
            x = _masked_standardize(x, node_mask)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        q = nn.Dense(self.hidden_dim, kernel_init=xavier_normal, name="fc_q")(x)
        k = nn.Dense(self.hidden_dim, use_bias=False, kernel_init=xavier_normal, name="fc_k")(x)
        v = k  # reference quirk: `v = self.fc_k(x)` (LESSR/modules.py:92)
        # alpha depends only on the SOURCE features (q_j + k_j)
        e = nn.Dense(1, use_bias=False, kernel_init=xavier_normal, name="fc_e")(
            nn.sigmoid(q + k)
        )[..., 0]  # (B, L) per-source score
        scores = jnp.where(short_mask, e[:, None, :], -jnp.inf)  # (B, Ldst, Lsrc)
        alpha = jax.nn.softmax(scores, axis=-1)
        alpha = jnp.where(short_mask, alpha, 0.0)
        out = jnp.einsum("bds,bsh->bdh", alpha, v)
        return nn.PReLU()(out)


class AttnReadout(nn.Module):
    input_dim: int
    hidden_dim: int
    output_dim: int
    dropout_rate: float = 0.0
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x, last_node, node_mask, deterministic=True):
        if self.batch_norm:
            x = _masked_standardize(x, node_mask)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        last = jnp.take_along_axis(x, last_node[:, None, None].repeat(x.shape[-1], -1), axis=1)
        xu = nn.Dense(self.hidden_dim, use_bias=False, kernel_init=xavier_normal)(x)
        xv = nn.Dense(self.hidden_dim, kernel_init=xavier_normal)(last)
        e = nn.Dense(1, use_bias=False, kernel_init=xavier_normal)(
            nn.sigmoid(xu + xv)
        )[..., 0]
        e = jnp.where(node_mask, e, -jnp.inf)
        alpha = jax.nn.softmax(e, axis=-1)
        out = jnp.einsum("bl,blh->bh", alpha, x)
        if self.output_dim != self.input_dim:
            out = nn.Dense(self.output_dim, use_bias=False, kernel_init=xavier_normal)(out)
        return nn.PReLU()(out)


@register("LESSR")
class LESSR(SeqRecArch):
    maxlen: int = 50
    embedding_dim: int = 64
    num_layers: int = 3
    dropout_rate: float = 0.2
    batch_norm: bool = True

    def setup(self):
        self.item_embeddings = nn.Embed(
            self.Item.count + self.NUM_PADS,
            self.embedding_dim,
            embedding_init=xavier_normal,
        )
        layers = []
        input_dim = self.embedding_dim
        for i in range(self.num_layers):
            if i % 2 == 0:
                layers.append(
                    EOPA(input_dim, self.embedding_dim, self.dropout_rate, self.batch_norm)
                )
            else:
                layers.append(
                    SGAT(
                        input_dim, self.embedding_dim, self.embedding_dim,
                        self.dropout_rate, self.batch_norm,
                    )
                )
            input_dim += self.embedding_dim
        self.layers = layers
        self.readout = AttnReadout(
            input_dim, self.embedding_dim, self.embedding_dim,
            self.dropout_rate, self.batch_norm,
        )
        self._final_dim = input_dim + self.embedding_dim
        self.fc_sr = nn.Dense(
            self.embedding_dim, use_bias=False, kernel_init=xavier_normal
        )
        self.final_dropout = nn.Dropout(self.dropout_rate)

    def sure_trainpipe(self, maxlen: int, batch_size: int):
        return (
            self.dataset.train()
            .shuffled_roll_seqs_source(minlen=2, keep_at_least_itself=True)
            .seq_train_yielding_pos_(start_idx_for_target=-1, end_idx_for_input=-1)
            .lprune_(maxlen, modified_fields=(self.ISeq,))
            .add_(offset=self.NUM_PADS, modified_fields=(self.ISeq,))
            .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            .lessr_graph_(maxlen, padding_value=self.PADDING_VALUE)
            .batch_(batch_size)
            .tensor_()
        )

    def sure_validpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 256):
        return (
            self.dataset.valid()
            .ordered_user_ids_source()
            .valid_sampling_(ranking)
            .lprune_(maxlen, modified_fields=(self.ISeq,))
            .add_(self.NUM_PADS, modified_fields=(self.ISeq,))
            .lpad_(maxlen, modified_fields=(self.ISeq,), padding_value=self.PADDING_VALUE)
            # no lessr_graph_: encode derives the graphs in-jit from
            # ISeq (bit-identical tensors, tests/test_lessr_device.py);
            # host graph tuples at 22k eval users were minutes of
            # python per eval
            .batch_(batch_size)
            .tensor_()
        )

    def sure_testpipe(self, maxlen: int, ranking: str = "full", batch_size: int = 256):
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

    def encode(self, data: Batch, deterministic: bool = True):
        if NodeItems not in data:
            # device-sampled batches carry only ISeq: build the session
            # graphs in-jit (derive_session_graphs) instead of on host
            data = {**data, **derive_session_graphs(
                data[self.ISeq], self.PADDING_VALUE
            )}
        node_items = data[NodeItems]
        node_mask = data[NodeMask].astype(bool)
        x = self.item_embeddings(node_items)  # (B, L, D)
        x = jnp.where(node_mask[..., None], x, 0.0)
        for i, layer in enumerate(self.layers):
            if i % 2 == 0:
                out = layer(
                    x, data[EOPNbr], data[EOPDeg], node_mask, deterministic
                )
            else:
                out = layer(x, data[ShortMask].astype(bool), node_mask, deterministic)
            x = jnp.concatenate([out, x], axis=-1)
        sr_g = self.readout(x, data[LastNode], node_mask, deterministic)
        sr_l = jnp.take_along_axis(
            x, data[LastNode][:, None, None].repeat(x.shape[-1], -1), axis=1
        )[:, 0, :]
        sr = jnp.concatenate([sr_l, sr_g], axis=-1)
        if self.batch_norm:
            mean = sr.mean(axis=0, keepdims=True)
            var = jnp.square(sr - mean).mean(axis=0, keepdims=True)
            sr = (sr - mean) * jax.lax.rsqrt(var + 1e-5)
        sr = self.final_dropout(sr, deterministic=deterministic)
        q = self.fc_sr(sr)
        return q, self.item_embeddings.embedding[self.NUM_PADS :]

    def fit(self, data: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        q, item_embds = self.encode(data, deterministic=False)
        logits = jnp.einsum(
            "bd,nd->bn", q, item_embds, preferred_element_type=jnp.float32
        )
        rec_loss = criterions.cross_entropy_with_logits(logits, data[self.IPos][:, 0])
        return rec_loss, {"rec_loss": rec_loss}

    def recommend_from_full(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        q, item_embds = self.encode(data)
        return jnp.einsum(
            "bd,nd->bn", q, item_embds, preferred_element_type=jnp.float32
        )

    def recommend_from_pool(self, data: Batch, buffers: Any = None) -> jnp.ndarray:
        q, item_embds = self.encode(data)
        return jnp.einsum("bd,bkd->bk", q, item_embds[data[self.IUnseen]])
