"""Cross-framework parity harness (the RecBole-interop analogue).

Reference test strategy #2 (SURVEY.md §4): SASRec/run_sasrec_recbole.py
re-runs SASRec with another framework's modules under the same data/
eval protocol to A/B the pipeline. Here the "other framework" is a
PyTorch (CPU) SASRec fed by the SAME recboard_tpu datapipes and scored
by the SAME metric code — so a metric gap isolates model-math
differences, not protocol differences.

Usage: python tools/crosscheck_sasrec.py [--epochs 30] [--maxlen 12]
Prints one JSON line with both frameworks' valid NDCG@10/HR@10.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_dataset(root: str):
    from recboard_tpu.data import synthetic
    from recboard_tpu.data.datasets import NextItemRecDataSet

    name = "CrossCheck_000_LOU"
    synthetic.make_synthetic_dataset(
        root, name, num_users=150, num_items=60, avg_len=12.0, seed=3,
        markov_strength=0.7, group_strength=0.2,
    )
    return NextItemRecDataSet(root, name)


def eval_full(score_fn, pipe, Item, ks=(10,)):
    """Shared eval loop: full ranking + seen masking + HR/NDCG."""
    import numpy as np

    hits = {k: [] for k in ks}
    ndcg = {k: [] for k in ks}
    for batch in pipe:
        from recboard_tpu.data.pipes import Size

        seqs = np.asarray(batch[Item.fork_seq])
        scores = score_fn(seqs)  # (B, N)
        seen = batch[Item.fork_seen]
        targets = batch[Item.fork_unseen]
        for i in range(len(scores)):
            row = scores[i].copy()
            row[list(seen[i])] = -1e23
            t = targets[i][0]
            rank = int((row > row[t]).sum())
            for k in ks:
                hits[k].append(1.0 if rank < k else 0.0)
                ndcg[k].append(1.0 / np.log2(rank + 2) if rank < k else 0.0)
    return {
        **{f"HR@{k}": float(np.mean(hits[k])) for k in ks},
        **{f"NDCG@{k}": float(np.mean(ndcg[k])) for k in ks},
    }


def run_jax(ds, maxlen, epochs, dim, blocks, lr, seed):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from recboard_tpu.data.pipes import Size
    from recboard_tpu.models.zoo import SASRec

    model = SASRec(ds, maxlen=maxlen, embedding_dim=dim, num_blocks=blocks,
                   dropout_rate=0.0)
    pipe = model.sure_trainpipe(maxlen, 64).set_seed(seed)
    params = None
    tx = optax.adam(lr)

    @jax.jit
    def step(params, opt, batch, rng):
        (loss, _), g = jax.value_and_grad(
            lambda p: model.apply({"params": p}, batch, method="fit",
                                  rngs={"dropout": rng}),
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    opt = None
    rng = jax.random.PRNGKey(seed)
    for epoch in range(epochs):
        pipe.set_epoch(epoch)
        for data in pipe:
            batch = {f: jnp.asarray(v) for f, v in data.items()
                     if hasattr(v, "dtype") and f != Size}
            if params is None:
                params = model.init(
                    {"params": jax.random.PRNGKey(seed),
                     "dropout": jax.random.PRNGKey(seed + 1)}, batch
                )["params"]
                opt = tx.init(params)
            rng, k = jax.random.split(rng)
            params, opt, loss = step(params, opt, batch, k)

    @jax.jit
    def score(seqs):
        return model.apply(
            {"params": params}, {model.ISeq: seqs}, None,
            method="recommend_from_full",
        )

    return lambda seqs: np.asarray(score(jnp.asarray(seqs)))


def run_torch(ds, maxlen, epochs, dim, blocks, lr, seed):
    import numpy as np
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    N = ds.fields["ITEM", "ID"].count

    class FFN(nn.Module):
        def __init__(self, d):
            super().__init__()
            self.c1 = nn.Conv1d(d, d, 1)
            self.c2 = nn.Conv1d(d, d, 1)

        def forward(self, x):
            return x + self.c2(torch.relu(self.c1(x.transpose(-1, -2)))).transpose(-1, -2)

    class TorchSASRec(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(N + 1, dim, padding_idx=0)
            self.pos = nn.Embedding(maxlen, dim)
            self.ln_q = nn.ModuleList([nn.LayerNorm(dim, eps=1e-8) for _ in range(blocks)])
            self.attn = nn.ModuleList(
                [nn.MultiheadAttention(dim, 1, batch_first=True) for _ in range(blocks)]
            )
            self.ln_f = nn.ModuleList([nn.LayerNorm(dim, eps=1e-8) for _ in range(blocks)])
            self.ffn = nn.ModuleList([FFN(dim) for _ in range(blocks)])
            self.last = nn.LayerNorm(dim, eps=1e-8)
            self.register_buffer(
                "mask", torch.ones(maxlen, maxlen, dtype=torch.bool).triu(1)
            )

        def encode(self, seqs):
            pad = (seqs == 0).unsqueeze(-1)
            x = self.emb(seqs) * dim**0.5 + self.pos.weight[None]
            x = x.masked_fill(pad, 0.0)
            for i in range(blocks):
                q = self.ln_q[i](x)
                x = self.attn[i](q, x, x, attn_mask=self.mask, need_weights=False)[0] + x
                x = self.ffn[i](self.ln_f[i](x))
                x = x.masked_fill(pad, 0.0)
            return self.last(x), self.emb.weight[1:]

    model = TorchSASRec()
    # reference init (SASRec/main.py:130-141): xavier_normal everywhere
    for m in model.modules():
        if isinstance(m, nn.Linear):
            nn.init.xavier_normal_(m.weight)
            if m.bias is not None:
                nn.init.constant_(m.bias, 0.0)
        elif isinstance(m, nn.Embedding):
            nn.init.xavier_normal_(m.weight)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    bce = nn.functional.binary_cross_entropy_with_logits

    from recboard_tpu.data.pipes import Size
    from recboard_tpu.models.zoo import SASRec as JaxSASRec

    helper = JaxSASRec(ds, maxlen=maxlen)
    pipe = helper.sure_trainpipe(maxlen, 64).set_seed(seed)
    for epoch in range(epochs):
        pipe.set_epoch(epoch)
        for data in pipe:
            seqs = torch.as_tensor(np.asarray(data[helper.ISeq]))
            pos = torch.as_tensor(np.asarray(data[helper.IPos]))
            neg = torch.as_tensor(np.asarray(data[helper.INeg]))
            u, table = model.encode(seqs)
            m = (seqs != 0).float()
            pl = torch.einsum("bld,bld->bl", u, table[pos])
            nl = torch.einsum("bld,bld->bl", u, table[neg])
            loss = (
                bce(pl, torch.ones_like(pl), weight=m, reduction="sum")
                + bce(nl, torch.zeros_like(nl), weight=m, reduction="sum")
            ) / m.sum()
            opt.zero_grad()
            loss.backward()
            opt.step()

    @torch.no_grad()
    def score(seqs):
        u, table = model.encode(torch.as_tensor(seqs))
        return torch.einsum("bd,nd->bn", u[:, -1], table).numpy()

    return score


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--maxlen", type=int, default=12)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--blocks", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--root", default="/tmp/recboard_crosscheck")
    args = ap.parse_args()

    import jax

    if jax.default_backend() not in ("cpu", "tpu"):
        jax.config.update("jax_platforms", "cpu")

    ds = build_dataset(args.root)
    Item = ds.fields["ITEM", "ID"]

    # convenience forks used by eval_full
    from recboard_tpu.data.tags import SEEN, SEQUENCE, UNSEEN

    Item.__class__.fork_seq = property(lambda s: s.fork(SEQUENCE))
    Item.__class__.fork_seen = property(lambda s: s.fork(SEEN))
    Item.__class__.fork_unseen = property(lambda s: s.fork(UNSEEN))

    from recboard_tpu.models.zoo import SASRec

    helper = SASRec(ds, maxlen=args.maxlen)

    def fresh_validpipe():
        return helper.sure_validpipe(args.maxlen, "full", batch_size=128).set_seed(0)

    jax_score = run_jax(ds, args.maxlen, args.epochs, args.dim, args.blocks,
                        args.lr, args.seed)
    jax_metrics = eval_full(jax_score, fresh_validpipe(), Item)

    torch_score = run_torch(ds, args.maxlen, args.epochs, args.dim, args.blocks,
                            args.lr, args.seed)
    torch_metrics = eval_full(torch_score, fresh_validpipe(), Item)

    print(json.dumps({"jax": jax_metrics, "torch": torch_metrics}))


if __name__ == "__main__":
    main()
