"""Throughput benchmark — prints ONE JSON line.

Measures the flagship sequential model (SASRec, Amazon2014Beauty-shaped:
12,101 items, maxlen 50, batch 256, D=64 — the reference's headline
config, SASRec/configs/Amazon2014Beauty_550_LOU.yaml) in training
examples/s on one chip: the full jitted step (fwd + bwd + adam update)
with BCE loss.

The reference publishes no throughput numbers (BASELINE.md), so
`vs_baseline` is measured fresh against the same model/step implemented
in PyTorch on this host's CPU (the only torch device available here —
the reference's own hardware is CUDA, unavailable). Run with
--no-torch-baseline to skip that comparison (vs_baseline = null).
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

NUM_ITEMS = 12_101
MAXLEN = 50
# B=256 (the reference's quality config) leaves the chip latency-bound
# through the axon tunnel (~1.2 ms/step floor); 1024 reaches compute
# utilization (measured: 207k ex/s @256 → 1.25M @1024 → 2.0M @2048).
BATCH = 1024
DIM = 64
BLOCKS = 2


def bench_jax(steps: int = 30, warmup: int = 5) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    if jax.default_backend() == "tpu":
        # threefry dropout-mask generation dominates the step (5.7 vs
        # 3.7 ms measured) and costs minutes of compile; mirror the
        # runner's TPU default (parser.compile).
        jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    from recboard_tpu.data import synthetic
    from recboard_tpu.models.zoo import SASRec

    # enough coverage that (almost) all NUM_ITEMS survive reindexing —
    # ids are then drawn from the model's true table size, so gathers
    # stay in range (an undersized catalog silently shrinks the table)
    ds = synthetic.synthetic_next_item(
        root="/tmp/recboard_tpu_bench2",
        name="Bench_001_LOU",
        num_users=2048,
        num_items=NUM_ITEMS,
        avg_len=50.0,
        seed=0,
        kcore4user=1,
        kcore4item=0,
    )
    model = SASRec(ds, maxlen=MAXLEN, embedding_dim=DIM, num_blocks=BLOCKS)
    num_items = model.Item.count

    rng = np.random.default_rng(0)
    batch = {
        model.ISeq: jnp.asarray(
            rng.integers(1, num_items + 1, size=(BATCH, MAXLEN)), jnp.int32
        ),
        model.IPos: jnp.asarray(
            rng.integers(0, num_items, size=(BATCH, MAXLEN)), jnp.int32
        ),
        model.INeg: jnp.asarray(
            rng.integers(0, num_items, size=(BATCH, MAXLEN)), jnp.int32
        ),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch
    )["params"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def step(carry, i):
        params, opt = carry

        def loss_fn(p):
            loss, _ = model.apply(
                {"params": p},
                batch,
                method="fit",
                rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(0), i)},
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, up), opt), loss

    # scan `steps` optimizer steps inside ONE device program: the axon
    # tunnel adds ~1 ms dispatch latency per call, which at a ~1 ms
    # step makes per-call timing measure the tunnel, not the chip
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_chunk(params, opt, i0):
        (params, opt), losses = jax.lax.scan(
            step, (params, opt), i0 + jnp.arange(steps)
        )
        return params, opt, losses[-1]

    params, opt, loss = run_chunk(params, opt, jnp.int32(0))  # compile+warm
    loss.block_until_ready()
    best = float("inf")
    for k in range(1, 4):  # best-of-3: the tunnel adds 2-4x run noise
        t0 = time.perf_counter()
        params, opt, loss = run_chunk(params, opt, jnp.int32(k * steps))
        loss.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return BATCH * steps / best


def bench_torch(steps: int = 8, warmup: int = 2) -> float:
    """Reference-style SASRec step in PyTorch (CPU) for vs_baseline."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

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
            self.ln_q = nn.ModuleList([nn.LayerNorm(d) for _ in range(BLOCKS)])
            self.attn = nn.ModuleList(
                [nn.MultiheadAttention(d, 1, batch_first=True) for _ in range(BLOCKS)]
            )
            self.ln_f = nn.ModuleList([nn.LayerNorm(d) for _ in range(BLOCKS)])
            self.ffn = nn.ModuleList([FFN(d) for _ in range(BLOCKS)])
            self.last = nn.LayerNorm(d)
            mask = torch.ones(MAXLEN, MAXLEN, dtype=torch.bool).triu(1)
            self.register_buffer("mask", mask)

        def forward(self, seqs, pos, neg):
            x = self.emb(seqs) * DIM**0.5 + self.pos.weight[None]
            for i in range(BLOCKS):
                q = self.ln_q[i](x)
                x = self.attn[i](q, x, x, attn_mask=self.mask, need_weights=False)[0] + x
                x = self.ffn[i](self.ln_f[i](x))
            u = self.last(x)
            table = self.emb.weight[1:]
            pl = torch.einsum("bld,bld->bl", u, table[pos])
            nl = torch.einsum("bld,bld->bl", u, table[neg])
            labels_p = torch.ones_like(pl)
            labels_n = torch.zeros_like(nl)
            bce = nn.functional.binary_cross_entropy_with_logits
            return bce(pl, labels_p) + bce(nl, labels_n)

    model = Model()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    g = torch.Generator().manual_seed(0)
    seqs = torch.randint(1, NUM_ITEMS + 1, (BATCH, MAXLEN), generator=g)
    pos = torch.randint(0, NUM_ITEMS, (BATCH, MAXLEN), generator=g)
    neg = torch.randint(0, NUM_ITEMS, (BATCH, MAXLEN), generator=g)

    def step():
        opt.zero_grad()
        loss = model(seqs, pos, neg)
        loss.backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return BATCH * steps / dt


# bench.py zoo keys → tools/torch_baselines.py keys (identity unless
# listed); the reference-exact per_position HSTU compares against the
# per-position torch step
# both HSTU modes compare against the SAME torch baseline (the
# reference's per-position sampled softmax, HSTU/main.py:157-201):
# per_position is the parity comparison, per_row is what the TPU
# framework recommends at measured 5-seed quality parity — the r4
# artifact omitted per_row from the dict and led with the worst number
_TORCH_KEY = {"hstu_per_position": "hstu", "hstu_per_row": "hstu"}


def bench_zoo(steps: int):
    """Driver-visible throughput for the OTHER hot families (the
    headline covers only SASRec, the fastest; this keeps the slowest
    — BERT4Rec, TIGER — in the round artifact too). Per-model
    try/except so one flaky compile over the tunnel cannot sink the
    headline.

    Returns (zoo, mfu, vs_torch):
    * zoo: examples/s per family. HSTU appears as BOTH labeled modes —
      per_position (the reference default) and per_row (the
      recommended TPU mode, 34x at 5-seed quality parity) — so the
      artifact never advertises a non-default mode silently.
    * mfu: XLA-cost-analysis roofline per model (tools/tpu_bench.py
      LAST_COST): achieved TFLOP/s, % of the v5e bf16 peak, and which
      roofline (hbm/mxu) binds at the step's arithmetic intensity.
    * vs_torch: per-family speedup over the reference-style torch-CPU
      steps recorded in benchmark/torch_baselines.json (regenerate:
      python tools/torch_baselines.py)."""
    import os
    import sys

    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools import tpu_bench

        ds = tpu_bench._dataset()
    except Exception:  # never sink the headline JSON line
        return None, None, None
    baselines = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "benchmark", "torch_baselines.json")) as fh:
            baselines = json.load(fh)
    except Exception:
        pass
    out, mfu, vs = {}, {}, {}
    for name in ("gru4rec", "hstu_per_position", "hstu_per_row", "bsarec",
                 "bert4rec", "lightgcn", "lightgcn_xl", "tiger",
                 "tiger_serve", "sasrec_serve", "etegrec"):
        try:
            # per_position is 381 ms/step — a 60-step chunk x4 would be
            # ~90 s of bench time for one row; 12 steps still amortizes
            # the ~4 ms tunnel dispatch to <1%
            n = 12 if name == "hstu_per_position" else steps
            res = tpu_bench.BENCHES[name](ds, n)
            ms, bsz = res[0], (res[2] if len(res) > 2 else tpu_bench.BATCH)
            out[name] = round(bsz / ms, 1)
            if tpu_bench.LAST_COST:
                mfu[name] = {
                    k: tpu_bench.LAST_COST[k]
                    for k in ("achieved_tflops", "mfu_pct", "flops_dtype",
                              "bound", "pct_of_roofline",
                              "hbm_gbps_logical")
                    if k in tpu_bench.LAST_COST
                }
            base = baselines.get(_TORCH_KEY.get(name, name))
            if base and base.get("examples_per_s"):
                vs[name] = round(out[name] / base["examples_per_s"], 1)
        except Exception:
            out[name] = None
    return out, mfu or None, vs or None


def main():
    ap = argparse.ArgumentParser()
    # 30-step chunks under-amortize the axon tunnel's per-dispatch cost
    # (~4 ms/chunk: measured 281k ex/s at 30 steps vs 323k at 60)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--no-torch-baseline", action="store_true")
    ap.add_argument("--no-zoo", action="store_true",
                    help="skip the per-family zoo sweep (headline only)")
    ap.add_argument("--no-big-catalog", action="store_true",
                    help="skip the 20M-row large-catalog phase")
    ap.add_argument("--big-vocab", type=int, default=20_000_000)
    args = ap.parse_args()

    big = None
    if not args.no_big_catalog:
        # HBM-scale demonstration (BASELINE.json north star): 20M-row
        # item table (5.1 GB f32) trained with O(touched-rows) sparse
        # updates + streamed full-catalog top-10 (tools/big_table_bench).
        # Runs in a SUBPROCESS *before* this process touches the TPU:
        # the axon tunnel is single-client, and sharing the device
        # context with the zoo benches measured 600x slower steps
        # (263 ms vs 0.41 ms standalone).
        try:
            import os
            import subprocess
            import sys

            out = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "big_table_bench.py"),
                 "--vocab", str(args.big_vocab), "--steps", "10"],
                capture_output=True, text=True, timeout=1200,
            )
            rows = [json.loads(ln) for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            tr = next(r for r in rows if r["phase"] == "train")
            sv = next(r for r in rows
                      if r["phase"] == "serve_full_catalog_top10")
            big = {
                "vocab": tr["vocab"], "table_gb": tr["table_gb"],
                "train_examples_per_s": tr["examples_per_s"],
                "train_ms_per_step": tr["ms_per_step"],
                "serve_queries_per_s": sv["queries_per_s"],
                "serve_tflops": sv["achieved_tflops"],
            }
            ap_row = next(
                (r for r in rows
                 if r["phase"] == "serve_full_catalog_top10_approx"), None)
            if ap_row:
                big["serve_queries_per_s_approx"] = ap_row["queries_per_s"]
        except Exception:
            big = None

    value = bench_jax(steps=args.steps)
    vs = None
    if not args.no_torch_baseline:
        try:
            torch_eps = bench_torch()
            vs = value / torch_eps
        except Exception:
            vs = None
    zoo, mfu, zoo_vs = (None,) * 3 if args.no_zoo else bench_zoo(steps=60)
    print(
        json.dumps(
            {
                "metric": "sasrec_train_examples_per_s_per_chip",
                "value": round(value, 1),
                "unit": "examples/s",
                "vs_baseline": round(vs, 2) if vs else None,
                # vs_baseline semantics: speedup over a reference-style
                # torch SASRec step on THIS host's CPU (bench_torch) —
                # the reference's CUDA hardware is not present here
                "baseline": "torch-cpu same-host sasrec step",
                # examples/s/chip for the other hot families at the
                # same Beauty-scale config (B=1024 except TIGER's 256)
                "zoo": zoo,
                # per-family speedups vs reference-style torch-CPU
                # steps (benchmark/torch_baselines.json — same configs)
                "zoo_vs_torch_cpu": zoo_vs,
                # XLA-cost-analysis roofline per family: achieved
                # TFLOP/s, % of the v5e bf16 peak (197 TFLOP/s), and
                # whether HBM bandwidth or the MXU binds at the step's
                # arithmetic intensity (docs/PERF.md "Roofline")
                "mfu": mfu,
                # 20M-row catalog: sparse-AdaGrad training + streamed
                # full-catalog top-10 (the >single-chip-HBM design,
                # parallel/big_table.py)
                "large_catalog": big,
            }
        )
    )


if __name__ == "__main__":
    main()
