"""TPU step-throughput harness for the hot zoo families.

Measures the full jitted training step (fwd + bwd + adam) of several
models at the Beauty-scale config (12.1k-item catalog, maxlen 50,
B=1024, D=64) on whatever backend is active, timing `lax.scan` chunks
so the axon tunnel's ~1 ms/dispatch noise cannot contaminate the
numbers (see CLAUDE.md perf rules — per-dispatch timing is 2-4x noisy).

    python tools/tpu_bench.py [--models sasrec,hstu,...] [--steps 60]

Prints one JSON line per model:
    {"model": ..., "ms_per_step": ..., "examples_per_s": ..., "loss": ...}

This is the regression harness for the round-over-round perf notes;
bench.py (the driver's single headline number) shares its SASRec
config.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 1024
MAXLEN = 50
NUM_ITEMS = 12_101

# Public TPU v5e (v5 lite) peaks — jax-ml.github.io/scaling-book:
# 197 TFLOP/s bf16 MXU, 819 GB/s HBM. f32 matmuls run as multi-pass
# bf16 on the MXU (~1/4 rate), so MFU is reported against the ceiling
# of the dtype the program actually EXECUTES (f32 unless the bench ran
# --compute-dtype bfloat16) — achieved compute above the claimed
# hardware bound is impossible, and reporting f32 flops against the
# bf16 roof (as r4 did) produced pct_of_roofline > 100.
PEAK_BF16_FLOPS = 197e12
PEAK_F32_FLOPS = PEAK_BF16_FLOPS / 4  # multi-pass bf16 emulation
HBM_BYTES_PER_S = 819e9

# filled by _measure for the model just benchmarked: XLA-counted
# flops/bytes per step from the compiled HLO's cost analysis, plus
# derived roofline numbers. bench.py copies it into the driver JSON's
# "mfu" dict.
LAST_COST = {}


def _cost_analysis(compiled, steps: int, dt: float,
                   dtype: str = "float32") -> dict:
    """Roofline accounting from XLA's own cost model.

    Calibration (r5 — the r4 dict reported pct_of_roofline up to 185%):
    XLA's ``bytes accessed`` is the POST-FUSION LOGICAL byte count —
    every fusion input/output at each consumer — not measured DRAM
    transactions; operands that stay resident in VMEM/registers across
    consumers are counted per use, so it is an UPPER bound on true HBM
    traffic. Whenever nbytes/dt exceeds the physical 819 GB/s ceiling,
    that upper bound is PROVEN slack (the chip cannot move that much),
    i.e. part of the counted bytes never left VMEM; the HBM-roofline
    claim `roof = ai * BW` is then meaningless and the only sound
    bound is the compute ceiling of the executed dtype. Entries in
    that regime are classified ``bound: "fused"`` and report
    pct_of_roofline against the compute roof — so every entry is
    ≤ 100 by construction of a *valid* bound, not by cosmetic
    clamping (pinned by tests/test_roofline.py)."""
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca.get("flops", 0.0)) / steps
        nbytes = float(ca.get("bytes accessed", 0.0)) / steps
    except Exception:
        return {}
    if not flops:
        return {}
    peak = PEAK_BF16_FLOPS if dtype == "bfloat16" else PEAK_F32_FLOPS
    achieved = flops / dt
    ai = flops / max(nbytes, 1.0)  # arithmetic intensity (flops/byte)
    ridge = peak / HBM_BYTES_PER_S
    implied_gbps = nbytes / dt / 1e9
    if implied_gbps > HBM_BYTES_PER_S / 1e9:
        # logical bytes exceed what HBM can physically move in dt:
        # the byte count is fusion-inflated, HBM roof invalid
        bound = "fused"
        roof = peak
    elif ai < ridge:
        bound = "hbm"
        roof = ai * HBM_BYTES_PER_S
    else:
        bound = "mxu"
        roof = peak
    return {
        "flops_per_step": round(flops),
        "bytes_per_step": round(nbytes),
        "flops_dtype": dtype,
        "achieved_tflops": round(achieved / 1e12, 3),
        "mfu_pct": round(100 * achieved / peak, 2),
        # logical-byte rate — a true-traffic upper bound, NOT measured
        # DRAM bandwidth (can exceed 819 only via fusion overcount)
        "hbm_gbps_logical": round(implied_gbps, 1),
        "ai_flops_per_byte": round(ai, 1),
        "bound": bound,
        "pct_of_roofline": round(100 * achieved / roof, 1),
    }


def _dataset():
    from recboard_tpu.data import synthetic

    return synthetic.synthetic_next_item(
        root="/tmp/recboard_tpu_bench2",
        name="Bench_001_LOU",
        num_users=2048,
        num_items=NUM_ITEMS,
        avg_len=50.0,
        seed=0,
        kcore4user=1,
        kcore4item=0,
    )


def _measure(model, batch, steps, rngs_extra=()):
    import jax
    import jax.numpy as jnp
    import optax

    params = jax.jit(model.init)(
        {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            **{name: jax.random.PRNGKey(2) for name in rngs_extra},
        },
        batch,
    )["params"]
    tx = optax.adam(1e-3)
    base = jax.random.PRNGKey(7)

    def step(carry, i):
        params, opt = carry

        def loss_fn(p):
            rngs = {"dropout": jax.random.fold_in(base, i)}
            for name in rngs_extra:
                rngs[name] = jax.random.fold_in(base, i + 1_000_000)
            loss, _ = model.apply({"params": p}, batch, method="fit", rngs=rngs)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, up), opt), loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_chunk(params, opt, i0):
        (params, opt), losses = jax.lax.scan(
            step, (params, opt), i0 + jnp.arange(steps)
        )
        return params, opt, losses[-1]

    p, o = params, tx.init(params)
    # cost-analyze ONE step, not the scanned chunk: TPU cost analysis
    # does not scale the scan body by trip count (measured ~16x flop
    # under-count at 60-step chunks), so lower a single-step program —
    # from shape structs, because the real buffers get donated below.
    try:
        structs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), (p, o)
        )

        def one_step(params, opt):
            (params, opt), loss = step((params, opt), jnp.int32(0))
            return params, opt, loss

        compiled = jax.jit(one_step).lower(*structs).compile()
    except Exception:
        compiled = None
    p, o, loss = run_chunk(p, o, jnp.int32(0))
    loss.block_until_ready()
    best = 1e9
    for k in range(1, 4):
        t0 = time.perf_counter()
        p, o, loss = run_chunk(p, o, jnp.int32(k * steps))
        loss.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / steps)
    LAST_COST.clear()
    if compiled is not None:  # post-fusion flops/bytes → roofline
        LAST_COST.update(_cost_analysis(compiled, 1, best))
    return best, float(loss)


def bench_sasrec(ds, steps):
    import jax.numpy as jnp

    from recboard_tpu.models.zoo import SASRec

    model = SASRec(ds, maxlen=MAXLEN, embedding_dim=64, num_blocks=2)
    N = model.Item.count
    rng = np.random.default_rng(0)
    batch = {
        model.ISeq: jnp.asarray(rng.integers(1, N + 1, (BATCH, MAXLEN)), jnp.int32),
        model.IPos: jnp.asarray(rng.integers(0, N, (BATCH, MAXLEN)), jnp.int32),
        model.INeg: jnp.asarray(rng.integers(0, N, (BATCH, MAXLEN)), jnp.int32),
    }
    return _measure(model, batch, steps)


def bench_gru4rec(ds, steps):
    import jax.numpy as jnp

    from recboard_tpu.models.zoo import REGISTRY

    model = REGISTRY["GRU4Rec"](ds, maxlen=MAXLEN, embedding_dim=64)
    N = model.Item.count
    rng = np.random.default_rng(0)
    batch = {
        model.ISeq: jnp.asarray(rng.integers(1, N + 1, (BATCH, MAXLEN)), jnp.int32),
        model.IPos: jnp.asarray(rng.integers(0, N, (BATCH, 1)), jnp.int32),
        model.INeg: jnp.asarray(rng.integers(0, N, (BATCH, 1)), jnp.int32),
    }
    return _measure(model, batch, steps)


def bench_bsarec(ds, steps):
    import jax.numpy as jnp

    from recboard_tpu.models.zoo import REGISTRY

    # reference Beauty config: CE over the full catalog, dropouts 0.5
    model = REGISTRY["BSARec"](ds, maxlen=MAXLEN, embedding_dim=64, num_blocks=2)
    N = model.Item.count
    rng = np.random.default_rng(0)
    batch = {
        model.ISeq: jnp.asarray(rng.integers(1, N + 1, (BATCH, MAXLEN)), jnp.int32),
        model.IPos: jnp.asarray(rng.integers(0, N, (BATCH, 1)), jnp.int32),
        model.INeg: jnp.asarray(rng.integers(0, N, (BATCH, 1)), jnp.int32),
    }
    return _measure(model, batch, steps)


def bench_bert4rec(ds, steps):
    import jax.numpy as jnp

    from recboard_tpu.models.zoo import REGISTRY

    model = REGISTRY["BERT4Rec"](ds, maxlen=MAXLEN, embedding_dim=64)
    N = model.Item.count
    rng = np.random.default_rng(0)
    batch = {
        model.ISeq: jnp.asarray(
            rng.integers(2, N + 2, (BATCH, MAXLEN)), jnp.int32
        ),
    }
    return _measure(model, batch, steps, rngs_extra=("sampling",))


def bench_hstu(ds, steps, negs_mode="shared"):
    import jax.numpy as jnp

    from recboard_tpu.models.zoo import HSTU

    # the reference's Beauty quality config (HSTU/configs/
    # Amazon2014Beauty_550_LOU.yaml), not the 16-block code default
    model = HSTU(
        ds,
        maxlen=MAXLEN,
        embedding_dim=64,
        num_heads=2,
        num_blocks=4,
        linear_hidden_dim=4,
        attention_dim=4,
        num_buckets=128,
        temperature=0.1,
        negs_mode=negs_mode,
    )
    N = model.Item.count
    rng = np.random.default_rng(0)
    times = np.sort(rng.integers(0, 3_000_000, (BATCH, MAXLEN)), axis=1)
    batch = {
        model.ISeq: jnp.asarray(rng.integers(1, N + 1, (BATCH, MAXLEN)), jnp.int32),
        model.IPos: jnp.asarray(rng.integers(0, N, (BATCH, MAXLEN)), jnp.int32),
        model.Time: jnp.asarray(times, jnp.int32),
    }
    return _measure(model, batch, steps, rngs_extra=("sampling",))


def bench_lightgcn(ds, steps):
    import jax.numpy as jnp

    from recboard_tpu.models.zoo import REGISTRY

    adj = ds.train().to_normalized_adj(normalization="sym")
    model = REGISTRY["LightGCN"](ds, embedding_dim=64, adj=adj)
    NU, NI = model.User.count, model.Item.count
    rng = np.random.default_rng(0)
    batch = {
        model.User: jnp.asarray(rng.integers(0, NU, (BATCH,)), jnp.int32),
        model.IPos: jnp.asarray(rng.integers(0, NI, (BATCH, 1)), jnp.int32),
        model.INeg: jnp.asarray(rng.integers(0, NI, (BATCH, 1)), jnp.int32),
    }
    return _measure(model, batch, steps)


def _dataset_yelp():
    """Yelp2018-shaped CF graph (77k x 45.6k, ~1.7M train edges): the
    scale where LightGCN's 3-hop SpMM dominates the step — the 2048-user
    bench graph measured per-step overhead, not the graph (r4 weak #2)."""
    from recboard_tpu.data import synthetic
    from recboard_tpu.data.datasets import NextItemRecDataSet

    synthetic.make_synthetic_cf_dataset("/tmp/recboard_tpu_bench2")
    return NextItemRecDataSet("/tmp/recboard_tpu_bench2", "SynYelpXL_000_ROU")


def bench_lightgcn_xl(ds_unused, steps):
    ds = _dataset_yelp()
    return bench_lightgcn(ds, steps)


def bench_tiger(ds, steps):
    import jax.numpy as jnp

    from recboard_tpu.data.tags import ID, ITEM
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.sem.converter import SemIDConverter

    Item = ds.fields[ITEM, ID]
    codes = np.random.default_rng(0).integers(0, 256, size=(Item.count, 3))
    conv = SemIDConverter.from_codes(codes)
    # reference batch (TIGER/train_t5.py): SID protocol text is ~6
    # tokens/item → encoder L=300; B=1024 un-remat'd attention scores
    # are 2.7 GB/layer and OOM a 16 GB chip
    B = 256
    model = REGISTRY["TIGER"](ds, converter=conv, maxlen=MAXLEN, num_beams=4)
    rng = np.random.default_rng(0)
    batch = {
        model.ISeq: jnp.asarray(rng.integers(0, Item.count, (B, MAXLEN)), jnp.int32),
        model.IPos: jnp.asarray(rng.integers(0, Item.count, (B, 1)), jnp.int32),
    }
    ms, loss = _measure(model, batch, steps)
    return ms, loss, B


def bench_tiger_serve(ds, steps):
    """Serving latency of the jitted trie-constrained beam search
    (recommend_from_full: encode → beam decode → full-catalog score
    scatter; reference TIGER/train_t5.py:187-236) at num_beams=10.
    Returns ms per batch and the query batch size — the zoo dict
    reports queries/s."""
    import jax
    import jax.numpy as jnp

    from recboard_tpu.data.tags import ID, ITEM
    from recboard_tpu.models.zoo import REGISTRY
    from recboard_tpu.sem.converter import SemIDConverter

    Item = ds.fields[ITEM, ID]
    codes = np.random.default_rng(0).integers(0, 256, size=(Item.count, 3))
    conv = SemIDConverter.from_codes(codes)
    B = 256
    model = REGISTRY["TIGER"](ds, converter=conv, maxlen=MAXLEN, num_beams=10)
    rng = np.random.default_rng(0)
    batch = {
        model.ISeq: jnp.asarray(
            rng.integers(0, Item.count, (B, MAXLEN)), jnp.int32
        ),
        model.IPos: jnp.asarray(rng.integers(0, Item.count, (B, 1)), jnp.int32),
    }
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
    )["params"]
    if os.environ.get("TIGER_SERVE_DTYPE") == "bfloat16":
        # serve-side mixed precision A/B: cast float params once (no
        # gradient concerns at inference; ranking ties break the same
        # way because top_k is stable on the f32 score scatter)
        params = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p,
            params,
        )

    def serve(_, x):
        scores = model.apply(
            {"params": params}, {model.ISeq: x}, method="recommend_from_full"
        )
        return None, scores[:, 0].sum()

    @jax.jit
    def run_chunk(x):
        _, outs = jax.lax.scan(serve, None, x)
        return outs.sum()

    xs = jnp.broadcast_to(batch[model.ISeq], (steps, B, MAXLEN))
    run_chunk(xs).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        run_chunk(xs).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / steps)
    LAST_COST.clear()
    try:  # single-call program for cost (scan bodies under-count)
        one = jax.jit(
            lambda x: model.apply(
                {"params": params}, {model.ISeq: x},
                method="recommend_from_full",
            )
        )
        LAST_COST.update(
            _cost_analysis(one.lower(batch[model.ISeq]).compile(), 1, best)
        )
    except Exception:
        pass
    return best, 0.0, B  # seconds/batch, like _measure


def bench_etegrec(ds, steps):
    """Joint generative model at the reference Beauty config
    (ETEGRec/configs/etegrec/Amazon2014Beauty_550_LOU.yaml: 3x256
    codebooks dim 128, T5 128-dim 6+6 layers, B=512); times the rec
    phase (the id phase measures the same, both ~28 ms on the v5e)."""
    import jax
    import jax.numpy as jnp

    from recboard_tpu.data.tags import ID, ITEM
    from recboard_tpu.models.zoo import REGISTRY

    Item = ds.fields[ITEM, ID]
    N = Item.count
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(N, 768)).astype(np.float32)
    model = REGISTRY["ETEGRec"](
        ds, item_features=feats, maxlen=20,
        num_codebooks=3, num_codewords=256, codebook_dim=128,
        hidden_dims=(512, 256), embedding_dim=128, num_heads=4,
        num_layers=6, num_decoder_layers=6, ffn_dim=512, head_dim=64,
    )
    B = 512
    item_code = np.concatenate(
        [np.full((model.NUM_PADS, 4), -1, np.int64),
         np.concatenate([rng.integers(0, 256, (N, 3)),
                         rng.integers(0, 16, (N, 1))], axis=-1)],
        axis=0,
    )
    batch = {
        model.ISeq: jnp.asarray(rng.integers(1, N + 1, (B, 20)), jnp.int32),
        model.IPos: jnp.asarray(rng.integers(0, N, (B, 1)), jnp.int32),
        "item_code": jnp.asarray(item_code),
    }
    ms, loss = _measure(model, batch, steps, rngs_extra=("sampling",))
    return ms, loss, B


def bench_sasrec_serve(ds, steps):
    """Serving throughput of the flagship dense path: encode the query
    batch, score the FULL catalog, take top-10 (the reference's eval
    hot loop, SASRec/main.py:223-236, here the `recommend` CLI's jitted
    program minus seen-masking). Scan-chunk timed like the rest of the
    zoo; `recommend --bench` measures the honest per-dispatch regime
    (docs/PERF.md Serving)."""
    import jax
    import jax.numpy as jnp

    from recboard_tpu.models.zoo import SASRec

    model = SASRec(ds, maxlen=MAXLEN, embedding_dim=64, num_blocks=2)
    N = model.Item.count
    B = 1024
    rng = np.random.default_rng(0)
    seqs = jnp.asarray(rng.integers(1, N + 1, (B, MAXLEN)), jnp.int32)
    params = jax.jit(
        functools.partial(model.init, method="recommend_from_full")
    )(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {model.ISeq: seqs},
    )["params"]

    def serve(_, x):
        scores = model.apply(
            {"params": params}, {model.ISeq: x}, method="recommend_from_full"
        )
        _, idx = jax.lax.top_k(scores, 10)
        return None, idx.sum()

    @jax.jit
    def run_chunk(x):
        _, outs = jax.lax.scan(serve, None, x)
        return outs.sum()

    xs = jnp.broadcast_to(seqs, (steps, B, MAXLEN))
    run_chunk(xs).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        run_chunk(xs).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / steps)
    LAST_COST.clear()
    try:  # single-call program for cost (scan bodies under-count)
        def one(x):
            scores = model.apply(
                {"params": params}, {model.ISeq: x},
                method="recommend_from_full",
            )
            return jax.lax.top_k(scores, 10)

        LAST_COST.update(
            _cost_analysis(jax.jit(one).lower(seqs).compile(), 1, best)
        )
    except Exception:
        pass
    return best, 0.0, B


BENCHES = {
    "sasrec": bench_sasrec,
    "gru4rec": bench_gru4rec,
    "hstu": bench_hstu,
    # labeled negative-sampling modes (docs/PERF.md HSTU ladder):
    # per_position is the reference default (HSTU/main.py:157-162);
    # per_row is the recommended TPU mode (34x at 5-seed quality
    # parity). The driver zoo reports BOTH so the headline never
    # advertises a non-default mode silently.
    "hstu_per_position": functools.partial(bench_hstu, negs_mode="per_position"),
    "hstu_per_row": functools.partial(bench_hstu, negs_mode="per_row"),
    "lightgcn": bench_lightgcn,
    "lightgcn_xl": bench_lightgcn_xl,
    "tiger": bench_tiger,
    "tiger_serve": bench_tiger_serve,
    "sasrec_serve": bench_sasrec_serve,
    "bsarec": bench_bsarec,
    "bert4rec": bench_bert4rec,
    "etegrec": bench_etegrec,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="sasrec,gru4rec,hstu,lightgcn,tiger,bsarec,bert4rec")
    ap.add_argument("--steps", type=int, default=60)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    if jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    ds = _dataset()
    for name in args.models.split(","):
        name = name.strip()
        try:
            out = BENCHES[name](ds, args.steps)
            ms, loss = out[0], out[1]
            bsz = out[2] if len(out) > 2 else BATCH
            print(
                json.dumps(
                    {
                        "model": name,
                        "batch": bsz,
                        "ms_per_step": round(ms * 1e3, 3),
                        "examples_per_s": round(bsz / ms, 1),
                        "loss": round(loss, 4),
                        **LAST_COST,
                    }
                ),
                flush=True,
            )
        except Exception as exc:  # keep going; report the failure
            print(json.dumps({"model": name, "error": repr(exc)[:200]}), flush=True)


if __name__ == "__main__":
    main()
