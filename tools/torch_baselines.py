"""Per-family PyTorch-CPU throughput baselines for bench.py's
``vs_baseline`` claims.

BASELINE.md's acceptance bar is "beat the PyTorch baselines >= 5x on
examples/s/chip — throughput must be measured fresh on both sides since
the reference publishes none". Round <=3 measured only SASRec
(bench.py:bench_torch); this tool measures a reference-style torch step
for one model per remaining hot family, at the same model configs as
tools/tpu_bench.py (Beauty-scale: 12,101-item catalog, maxlen 50, D=64),
on this host's CPU (the only torch device in this image — the
reference's own hardware is CUDA, unavailable).

    python tools/torch_baselines.py [--out benchmark/torch_baselines.json]
        [--models gru4rec,bert4rec,...]

Writes one JSON file: per-model {examples_per_s, batch, steps, note}.
bench.py reads it to emit a per-family ``zoo_vs_baseline`` dict next to
the live TPU zoo numbers.

Each torch model mirrors the reference implementation it stands in for
(file:line cited per function), not our JAX code: gathers and boolean
indexing where the reference gathers, nn.GRU/nn.TransformerEncoder/
torch.sparse.mm/HF T5 where the reference uses them.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_ITEMS = 12_101
MAXLEN = 50
DIM = 64


def _timed(step, batch, steps, warmup=2):
    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return batch * steps / dt


def bench_gru4rec(steps=10):
    """GRU4Rec/main.py (class at :32): emb -> dropout -> nn.GRU ->
    linear -> last position -> BCE on one pos/neg pair."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    B, H = 1024, 128

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(NUM_ITEMS + 1, DIM, padding_idx=0)
            self.emb_dropout = nn.Dropout(0.2)
            self.gru = nn.GRU(DIM, H, num_layers=1, batch_first=True)
            self.hidden_dropout = nn.Dropout(0.2)
            self.dense = nn.Linear(H, DIM)

        def forward(self, seqs, pos, neg):
            x = self.emb_dropout(self.emb(seqs))
            x, _ = self.gru(x)
            q = self.dense(self.hidden_dropout(x[:, -1]))  # (B, D)
            table = self.emb.weight[1:]
            pl = (q[:, None, :] * table[pos]).sum(-1)
            nl = (q[:, None, :] * table[neg]).sum(-1)
            bce = nn.functional.binary_cross_entropy_with_logits
            return bce(pl, torch.ones_like(pl)) + bce(nl, torch.zeros_like(nl))

    model = Model()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    g = torch.Generator().manual_seed(0)
    seqs = torch.randint(1, NUM_ITEMS + 1, (B, MAXLEN), generator=g)
    pos = torch.randint(0, NUM_ITEMS, (B, 1), generator=g)
    neg = torch.randint(0, NUM_ITEMS, (B, 1), generator=g)

    def step():
        opt.zero_grad()
        loss = model(seqs, pos, neg)
        loss.backward()
        opt.step()

    return _timed(step, B, steps), B, "nn.GRU last-position BCE"


def bench_bert4rec(steps=6):
    """BERT4Rec/main.py:31,154-163: bidirectional encoder, random 30%
    in-batch masking, CE over the FULL vocab at masked positions only
    (boolean-indexed gather, the reference's dynamic-shape idiom)."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    B, V = 1024, NUM_ITEMS + 2  # PAD + MASK

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(V, DIM, padding_idx=0)
            self.pos = nn.Embedding(MAXLEN, DIM)
            self.ln = nn.LayerNorm(DIM)
            self.drop = nn.Dropout(0.2)
            layer = nn.TransformerEncoderLayer(
                DIM, 4, dim_feedforward=4 * DIM, dropout=0.2,
                activation="gelu", batch_first=True,
            )
            self.encoder = nn.TransformerEncoder(layer, 2)
            self.fc = nn.Linear(DIM, V)

        def forward(self, seqs, masked, labels):
            x = self.drop(self.ln(self.emb(seqs) + self.pos.weight[None]))
            x = self.encoder(x)
            logits = self.fc(x[masked])  # dynamic gather of masked rows
            return nn.functional.cross_entropy(logits, labels[masked])

    model = Model()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    g = torch.Generator().manual_seed(0)
    seqs = torch.randint(2, V, (B, MAXLEN), generator=g)
    labels = seqs.clone()
    masked = torch.rand((B, MAXLEN), generator=g) < 0.3
    seqs[masked] = 1  # MASK token

    def step():
        opt.zero_grad()
        loss = model(seqs, masked, labels)
        loss.backward()
        opt.step()

    return _timed(step, B, steps), B, "masked-position full-vocab CE"


def bench_bsarec(steps=6):
    """BSARec/modules.py:147-205 + main.py:42: per-block attention +
    low-pass frequency filter branch (rfft/irfft), CE over the full
    catalog at the last position (Beauty config: CE loss)."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    B, C, ALPHA = 1024, 5, 0.7

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.attn = nn.MultiheadAttention(DIM, 1, batch_first=True)
            self.sqrt_beta = nn.Parameter(torch.randn(1, 1, DIM))
            self.ln1 = nn.LayerNorm(DIM)
            self.fc1 = nn.Linear(DIM, 4 * DIM)
            self.fc2 = nn.Linear(4 * DIM, DIM)
            self.ln2 = nn.LayerNorm(DIM)

        def forward(self, x):
            freq = torch.fft.rfft(x, dim=1, norm="ortho")
            keep = C // 2 + 1
            low = torch.zeros_like(freq)
            low[:, :keep] = freq[:, :keep]
            lp = torch.fft.irfft(low, n=x.shape[1], dim=1, norm="ortho")
            hp = x - lp
            fsp = lp + self.sqrt_beta**2 * hp
            att = self.attn(x, x, x, need_weights=False)[0]
            x = self.ln1(ALPHA * fsp + (1 - ALPHA) * att + x)
            return self.ln2(x + self.fc2(nn.functional.gelu(self.fc1(x))))

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(NUM_ITEMS + 1, DIM, padding_idx=0)
            self.pos = nn.Embedding(MAXLEN, DIM)
            self.blocks = nn.ModuleList([Block() for _ in range(2)])
            self.ln = nn.LayerNorm(DIM)

        def forward(self, seqs, pos):
            x = self.emb(seqs) + self.pos.weight[None]
            for b in self.blocks:
                x = b(x)
            q = self.ln(x[:, -1])
            logits = q @ self.emb.weight[1:].T
            return nn.functional.cross_entropy(logits, pos[:, 0])

    model = Model()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    g = torch.Generator().manual_seed(0)
    seqs = torch.randint(1, NUM_ITEMS + 1, (B, MAXLEN), generator=g)
    pos = torch.randint(0, NUM_ITEMS, (B, 1), generator=g)

    def step():
        opt.zero_grad()
        loss = model(seqs, pos)
        loss.backward()
        opt.step()

    return _timed(step, B, steps), B, "attention + FFT filter, full-catalog CE"


def _bipartite_edges():
    """Same interaction graph as tools/tpu_bench.py's _dataset()."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from recboard_tpu.data import synthetic

    ds = synthetic.synthetic_next_item(
        root="/tmp/recboard_tpu_bench2", name="Bench_001_LOU",
        num_users=2048, num_items=NUM_ITEMS, avg_len=50.0, seed=0,
        kcore4user=1, kcore4item=0,
    )
    users, items = ds.train().to_bigraph_edges()
    U = ds.fields["USER", "ID"].count
    I = ds.fields["ITEM", "ID"].count
    return np.asarray(users), np.asarray(items), U, I


def _yelp_edges():
    """Yelp2018-shaped CF graph — same dataset as tpu_bench's
    lightgcn_xl (77k x 45.6k, ~1.7M train edges → ~3.4M nnz sym adj)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from recboard_tpu.data import synthetic
    from recboard_tpu.data.datasets import NextItemRecDataSet

    synthetic.make_synthetic_cf_dataset("/tmp/recboard_tpu_bench2")
    ds = NextItemRecDataSet("/tmp/recboard_tpu_bench2", "SynYelpXL_000_ROU")
    users, items = ds.train().to_bigraph_edges()
    U = ds.fields["USER", "ID"].count
    I = ds.fields["ITEM", "ID"].count
    return np.asarray(users), np.asarray(items), U, I


def bench_lightgcn_xl(steps=6):
    return bench_lightgcn(steps, edges=_yelp_edges())


def bench_lightgcn(steps=10, edges=None):
    """LightGCN/main.py:47-49,82-84: sym-normalized sparse adjacency,
    3-hop propagation via torch.sparse.mm, layer mean, BPR."""
    import torch
    import torch.nn as nn

    users, items, U, I = edges if edges is not None else _bipartite_edges()
    torch.manual_seed(0)
    B, K = 1024, 3

    rows = np.concatenate([users, items + U])
    cols = np.concatenate([items + U, users])
    deg = np.bincount(rows, minlength=U + I).astype(np.float32)
    vals = 1.0 / np.sqrt(np.maximum(deg[rows] * deg[cols], 1.0))
    adj = torch.sparse_coo_tensor(
        torch.tensor(np.stack([rows, cols])), torch.tensor(vals), (U + I, U + I)
    ).coalesce()

    emb = nn.Parameter(torch.randn(U + I, DIM) * 0.1)
    opt = torch.optim.Adam([emb], lr=1e-3)
    g = torch.Generator().manual_seed(0)
    bu = torch.randint(0, U, (B,), generator=g)
    bp = torch.randint(0, I, (B,), generator=g)
    bn = torch.randint(0, I, (B,), generator=g)

    def step():
        opt.zero_grad()
        x, acc = emb, emb
        for _ in range(K):
            x = torch.sparse.mm(adj, x)
            acc = acc + x
        out = acc / (K + 1)
        ue, ie = out[:U], out[U:]
        pos = (ue[bu] * ie[bp]).sum(-1)
        neg = (ue[bu] * ie[bn]).sum(-1)
        loss = -torch.nn.functional.logsigmoid(pos - neg).mean()
        loss.backward()
        opt.step()

    return _timed(step, B, steps), B, f"3-hop sparse.mm ({len(rows)} nnz), BPR"


def bench_hstu(steps=3, B=256):
    """HSTU/main.py:45,157-201 + modules.py:61-206: pointwise SiLU
    attention with relative bucketed time+position bias (torch gather
    indexing, the reference's approach), per-position sampled softmax
    with 512 uniform negatives (the reference default;
    our zoo's negs_mode='per_position').

    B=256 (not the TPU run's 1024): the per-position negative gather
    materializes a (B, L, 512, D) tensor — 6.7 GB at B=1024, past this
    host's comfort; throughput is per-example so the comparison stands.
    """
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    H, DQK, DV, NB, NEGS, T = 2, 4, 4, 4, 512, 0.05

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln = nn.LayerNorm(DIM, eps=1e-6)
            self.uvqk = nn.Linear(DIM, 2 * H * DV + 2 * H * DQK, bias=False)
            self.attn_ln = nn.LayerNorm(H * DV, eps=1e-6)
            self.out = nn.Linear(H * DV, DIM)
            self.pos_w = nn.Parameter(torch.randn(2 * MAXLEN - 1) * 0.02)
            self.ts_w = nn.Parameter(torch.randn(129) * 0.02)

        def forward(self, x, ts):
            Bz, L, _ = x.shape
            y = torch.nn.functional.silu(self.uvqk(self.ln(x)))
            u, v, q, k = torch.split(
                y, [H * DV, H * DV, H * DQK, H * DQK], dim=-1
            )
            q = q.view(Bz, L, H, DQK)
            k = k.view(Bz, L, H, DQK)
            v = v.view(Bz, L, H, DV)
            qk = torch.einsum("bmhd,bnhd->bhmn", q, k)
            m = torch.arange(L)[:, None]
            n = torch.arange(L)[None, :]
            rel_pos = self.pos_w[n - m + MAXLEN - 1]
            ext = torch.cat([ts, ts[:, -1:]], dim=1)
            diff = ext[:, 1:, None] - ext[:, None, :-1]
            bucket = torch.clamp(
                (diff.abs().clamp(min=1).float().log() / 0.301).floor().long(),
                0, 128,
            )
            rel_ts = self.ts_w[bucket]  # (B, L, L) gather from a small table
            att = torch.nn.functional.silu(qk + (rel_pos + rel_ts)[:, None]) / L
            causal = torch.ones(L, L).tril()[None, None]
            o = torch.einsum("bhmn,bnhd->bmhd", att * causal, v)
            z = self.attn_ln(o.reshape(Bz, L, H * DV)) * u
            return x + self.out(z)

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(NUM_ITEMS + 1, DIM, padding_idx=0)
            self.blocks = nn.ModuleList([Block() for _ in range(NB)])
            self.ln = nn.LayerNorm(DIM)

        def forward(self, seqs, pos, negs, ts):
            x = self.emb(seqs)
            for b in self.blocks:
                x = b(x, ts)
            qe = torch.nn.functional.normalize(self.ln(x), dim=-1)
            table = torch.nn.functional.normalize(self.emb.weight[1:], dim=-1)
            pl = (qe * table[pos]).sum(-1) / T  # (B, L)
            nl = torch.einsum("bld,blkd->blk", qe, table[negs]) / T
            logits = torch.cat([pl[..., None], nl], dim=-1)
            return torch.nn.functional.cross_entropy(
                logits.reshape(-1, 1 + NEGS),
                torch.zeros(logits.shape[0] * logits.shape[1], dtype=torch.long),
            )

    model = Model()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    g = torch.Generator().manual_seed(0)
    seqs = torch.randint(1, NUM_ITEMS + 1, (B, MAXLEN), generator=g)
    pos = torch.randint(0, NUM_ITEMS, (B, MAXLEN), generator=g)
    negs = torch.randint(0, NUM_ITEMS, (B, MAXLEN, NEGS), generator=g)
    ts = torch.sort(torch.randint(0, 3_000_000, (B, MAXLEN), generator=g), dim=1).values

    def step():
        opt.zero_grad()
        loss = model(seqs, pos, negs, ts)
        loss.backward()
        opt.step()

    return _timed(step, B, steps, warmup=1), B, "per-position 512-neg sampled softmax"


def _converter():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from recboard_tpu.sem.converter import SemIDConverter

    codes = np.random.default_rng(0).integers(0, 256, size=(NUM_ITEMS, 3))
    return SemIDConverter.from_codes(codes)


def bench_tiger(steps=3):
    """TIGER/train_t5.py:16-176: HF T5ForConditionalGeneration seq2seq
    CE over the SID block, at the zoo TIGER config (d_model 128, 6+6
    layers, d_ff 256, d_kv 64, 4 heads; tools/tpu_bench.py bench_tiger:
    B=256, encoder L = maxlen * tokens_per_item)."""
    import torch
    from transformers import T5Config, T5ForConditionalGeneration

    conv = _converter()
    W = conv.item_token_ids.shape[1]
    torch.manual_seed(0)
    B = 256
    cfgt = T5Config(
        vocab_size=int(conv.vocab_size), d_model=128, d_kv=64, d_ff=256,
        num_layers=6, num_decoder_layers=6, num_heads=4, dropout_rate=0.1,
        decoder_start_token_id=int(conv.pad_id), pad_token_id=int(conv.pad_id),
    )
    model = T5ForConditionalGeneration(cfgt)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    g = torch.Generator().manual_seed(0)
    table = torch.tensor(np.asarray(conv.item_token_ids, np.int64))
    seqs = torch.randint(0, NUM_ITEMS, (B, MAXLEN), generator=g)
    input_ids = table[seqs].reshape(B, -1)
    labels = table[torch.randint(0, NUM_ITEMS, (B,), generator=g)]

    def step():
        opt.zero_grad()
        loss = model(input_ids=input_ids, labels=labels).loss
        loss.backward()
        opt.step()

    return _timed(step, B, steps, warmup=1), B, f"HF T5 seq2seq CE, enc L={MAXLEN * W}"


def bench_tiger_serve(steps=2, B=8):
    """TIGER/train_t5.py:187-210: HF generate() constrained beam search
    (num_beams=10, prefix_allowed_tokens_fn over a Python SID trie) —
    the reference's serving path verbatim. B=8: the per-beam Python
    trie callback makes larger batches pointless on CPU; queries/s is
    per-example."""
    import torch
    from transformers import T5Config, T5ForConditionalGeneration

    conv = _converter()
    torch.manual_seed(0)
    cfgt = T5Config(
        vocab_size=int(conv.vocab_size), d_model=128, d_kv=64, d_ff=256,
        num_layers=6, num_decoder_layers=6, num_heads=4, dropout_rate=0.0,
        decoder_start_token_id=int(conv.pad_id), pad_token_id=int(conv.pad_id),
        eos_token_id=int(conv.pad_id),
    )
    model = T5ForConditionalGeneration(cfgt).eval()
    table = torch.tensor(np.asarray(conv.item_token_ids, np.int64))
    g = torch.Generator().manual_seed(0)
    seqs = torch.randint(0, NUM_ITEMS, (B, MAXLEN), generator=g)
    input_ids = table[seqs].reshape(B, -1)

    # Python prefix trie over the dense trie arrays (reference
    # converter.py:329-371 builds the same structure as a dict trie)
    allowed = np.asarray(conv.allowed)
    next_node = np.asarray(conv.next_node)
    start = int(conv.start_id)

    def prefix_fn(batch_id, ids):
        node = 0
        for t in ids[1:].tolist():
            nxt = next_node[node, t] if t < next_node.shape[1] else -1
            if nxt < 0:
                return [int(conv.pad_id)]
            node = nxt
        toks = np.flatnonzero(allowed[node]).tolist()
        return toks or [int(conv.pad_id)]

    W = conv.item_token_ids.shape[1]

    def step():
        with torch.no_grad():
            model.generate(
                input_ids=input_ids, num_beams=10, num_return_sequences=10,
                max_new_tokens=W + 2, prefix_allowed_tokens_fn=prefix_fn,
            )

    return _timed(step, B, steps, warmup=1), B, "HF beam=10 w/ trie callback"


def bench_sasrec_serve(steps=6):
    """SASRec/main.py:223-236 eval hot loop: encode the query batch,
    score the FULL catalog, top-10 — torch side of bench.py's
    sasrec_serve."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    B = 1024
    # same 2-block model body as bench.py's bench_torch

    class FFN(nn.Module):
        def __init__(self, d):
            super().__init__()
            self.c1 = nn.Conv1d(d, d, 1)
            self.c2 = nn.Conv1d(d, d, 1)

        def forward(self, x):
            return x + self.c2(torch.relu(self.c1(x.transpose(-1, -2)))).transpose(-1, -2)

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            d = DIM
            self.emb = nn.Embedding(NUM_ITEMS + 1, d, padding_idx=0)
            self.pos = nn.Embedding(MAXLEN, d)
            self.ln_q = nn.ModuleList([nn.LayerNorm(d) for _ in range(2)])
            self.attn = nn.ModuleList(
                [nn.MultiheadAttention(d, 1, batch_first=True) for _ in range(2)]
            )
            self.ln_f = nn.ModuleList([nn.LayerNorm(d) for _ in range(2)])
            self.ffn = nn.ModuleList([FFN(d) for _ in range(2)])
            self.last = nn.LayerNorm(d)
            self.register_buffer(
                "mask", torch.ones(MAXLEN, MAXLEN, dtype=torch.bool).triu(1)
            )

        def forward(self, seqs):
            x = self.emb(seqs) * DIM**0.5 + self.pos.weight[None]
            for i in range(2):
                q = self.ln_q[i](x)
                x = self.attn[i](q, x, x, attn_mask=self.mask, need_weights=False)[0] + x
                x = self.ffn[i](self.ln_f[i](x))
            u = self.last(x)[:, -1]
            scores = u @ self.emb.weight[1:].T
            return scores.topk(10, dim=-1).indices

    model = Model().eval()
    g = torch.Generator().manual_seed(0)
    seqs = torch.randint(1, NUM_ITEMS + 1, (B, MAXLEN), generator=g)

    def step():
        with torch.no_grad():
            model(seqs)

    return _timed(step, B, steps), B, "full-catalog score + top-10"


BENCHES = {
    "gru4rec": bench_gru4rec,
    "bert4rec": bench_bert4rec,
    "bsarec": bench_bsarec,
    "lightgcn": bench_lightgcn,
    "lightgcn_xl": bench_lightgcn_xl,
    "hstu": bench_hstu,
    "tiger": bench_tiger,
    "tiger_serve": bench_tiger_serve,
    "sasrec_serve": bench_sasrec_serve,
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmark/torch_baselines.json")
    ap.add_argument("--models", default=",".join(BENCHES))
    args = ap.parse_args(argv)

    import platform

    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    results = {
        "_meta": {
            "command": "python tools/torch_baselines.py",
            "device": "cpu",
            "torch": torch.__version__,
            "cpu_count": os.cpu_count(),
            "platform": platform.platform(),
            "date": time.strftime("%Y-%m-%d"),
            "note": (
                "reference-style torch steps at the tools/tpu_bench.py "
                "configs; CPU is the only torch device in this image "
                "(the reference's own hardware is CUDA, unavailable)"
            ),
        }
    }
    if os.path.isfile(args.out):
        results.update(
            {k: v for k, v in json.load(open(args.out)).items() if k != "_meta"}
        )
    for name in args.models.split(","):
        name = name.strip()
        t0 = time.perf_counter()
        eps, batch, note = BENCHES[name]()
        results[name] = {
            "examples_per_s": round(eps, 1),
            "batch": batch,
            "note": note,
        }
        print(
            json.dumps({"model": name, **results[name],
                        "wall_s": round(time.perf_counter() - t0, 1)}),
            flush=True,
        )
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
