"""Communication-volume audit: what actually moves over ICI.

Compiles the sharded hot paths on a virtual n-device mesh and parses
the optimized HLO for collective ops (all-gather / all-reduce /
reduce-scatter / all-to-all / collective-permute), reporting each op's
result shape and bytes. This makes the sharding design's communication
contract CHECKABLE, not aspirational:

* GSPMD train step (SASRec, row-sharded item table): the only
  collectives should be the gradient all-reduce over `data` and the
  looked-up-row exchange — never a full-table transfer (the HLO test
  tests/test_sharded_training.py pins the negative; this tool reports
  the positive: what IS communicated and how many bytes).
* explicit shard_map lookups (parallel/tables.py): psum of (B, D)
  partial rows / psum_scatter of the position-sharded variant.
* big-table sparse step (parallel/big_table.py): the scatter update
  stays shard-local.
* sharded full-catalog top-k (parallel/topk.py): B * P * k candidates,
  vs B * V for a naive gather.

    python tools/comm_audit.py [--devices 8] [--json out.json]

Run on CPU (the audit is about compiled HLO structure, not wall time):
the tool force-hosts n virtual devices.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1}

_COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter", "all-to-all",
                "collective-permute")


def _shape_bytes(dtype: str, dims: str) -> int:
    nbytes = _DTYPE_BYTES.get(dtype, 4)
    for d in dims.split(","):
        if d:
            nbytes *= int(d)
    return nbytes


def collectives_in(hlo: str):
    """[(op, result_types, bytes)] for every collective in the HLO.

    Handles both scalar-result ops (`f32[256,64] all-reduce(...)`) and
    XLA's COMBINED tuple-shaped collectives
    (`(f32[64,64], f32[64]) all-reduce(...)`) — gradient syncs are
    usually combined, and a scalar-only parser silently drops them.
    Async pairs (all-reduce-start/-done) are counted once via -start.
    """
    out = []
    for line in hlo.splitlines():
        s = line.strip()
        m = re.match(
            r"(?:ROOT\s+)?\S+\s*=\s*(\([^)]*\)|\w+\[[\d,]*\]\S*)\s+(%?[a-z-]+)",
            s,
        )
        if not m:
            continue
        op = m.group(2).lstrip("%")
        base = re.sub(r"-(start|done)$", "", op)
        if base not in _COLLECTIVES or op.endswith("-done"):
            continue
        result = m.group(1)
        nbytes = 0
        types = re.findall(r"(\w+)\[([\d,]*)\]", result)
        for dtype, dims in types:
            nbytes += _shape_bytes(dtype, dims)
        out.append({"op": base,
                    "result": result[:80],
                    "bytes": nbytes})
    return out


def _summarize(name, hlo):
    cols = collectives_in(hlo)
    per_op = {}
    for c in cols:
        per_op.setdefault(c["op"], {"count": 0, "bytes": 0})
        per_op[c["op"]]["count"] += 1
        per_op[c["op"]]["bytes"] += c["bytes"]
    total = sum(c["bytes"] for c in cols)
    return {"path": name, "collectives": cols, "per_op": per_op,
            "total_bytes": total}


def audit(n_devices: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec

    from recboard_tpu.parallel import mesh as mesh_lib
    from recboard_tpu.parallel import tables, topk
    from recboard_tpu.parallel.big_table import (
        apply_row_grads, init_rowwise_adagrad,
    )

    mesh = mesh_lib.make_mesh(
        num_model_shards=2, devices=jax.devices()[:n_devices]
    )
    P = mesh.shape["model"]
    reports = []

    # ---- 1. GSPMD SASRec train step, row-sharded table --------------
    from recboard_tpu.data import synthetic
    from recboard_tpu.data.pipes import Size
    from recboard_tpu.models.zoo import SASRec

    ds = synthetic.synthetic_next_item(
        root="/tmp/recboard_tpu_graft", name="Graft_128_256_LOU",
        num_users=128, num_items=256, avg_len=10.0, seed=0,
    )
    model = SASRec(ds, maxlen=16, embedding_dim=64, num_blocks=2, num_heads=1)
    pipe = model.sure_trainpipe(16, 32).set_seed(0)
    batch = {f: jnp.asarray(v) for f, v in next(iter(pipe)).items()
             if isinstance(v, np.ndarray) and f != Size}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
    )["params"]
    specs = mesh_lib.match_partition_rules(model.partition_rules(), params)
    params = mesh_lib.shard_params(mesh, params, specs)
    batch = jax.device_put(
        batch, NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
    )
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def step(params, opt, batch):
        def loss_fn(p):
            loss, _ = model.apply(
                {"params": p}, batch, method="fit",
                rngs={"dropout": jax.random.PRNGKey(2)},
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, up), opt, loss

    with mesh:
        hlo = jax.jit(step).lower(params, opt, batch).compile().as_text()
    reports.append(_summarize(
        f"gspmd_sasrec_train_step(B=32,L=16,V=257,D=64,mesh={dict(mesh.shape)})",
        hlo,
    ))

    # ---- 2. explicit shard_map row lookup (psum of rows) ------------
    V, D, B = 1024, 64, 256
    table = jax.device_put(
        jnp.zeros((V, D)), NamedSharding(mesh, tables.row_sharded_spec())
    )
    ids = jnp.zeros((B,), jnp.int32)
    hlo = jax.jit(
        lambda t, i: tables.lookup_row_sharded(mesh, t, i)
    ).lower(table, ids).compile().as_text()
    reports.append(_summarize(
        f"lookup_row_sharded(V={V},D={D},B={B},P={P})", hlo))

    # expectation: one all-reduce of B*D floats (the psum of partial
    # rows); naive all-gather of the table would be V*D
    ids_sh = jax.device_put(
        jnp.zeros((B,), jnp.int32), NamedSharding(mesh, PartitionSpec("model"))
    )
    hlo = jax.jit(
        lambda t, i: tables.lookup_row_sharded_rs(mesh, t, i)
    ).lower(table, ids_sh).compile().as_text()
    reports.append(_summarize(
        f"lookup_row_sharded_rs(V={V},D={D},B={B},P={P})", hlo))

    # ---- 3. sharded full-catalog top-k ------------------------------
    q = jnp.zeros((B, D))
    hlo = jax.jit(
        lambda qq, t: topk.rank_top_k_row_sharded(mesh, qq, t, 10)
    ).lower(q, table).compile().as_text()
    reports.append(_summarize(
        f"rank_top_k_row_sharded(V={V},B={B},k=10,P={P})", hlo))

    # ---- 4. big-table sparse step, row-sharded ----------------------
    from jax.sharding import Mesh

    mmesh = Mesh(np.array(jax.devices()[:n_devices]), ("model",))
    state = init_rowwise_adagrad(jax.random.PRNGKey(3), 4096, D)
    state = type(state)(
        table=jax.device_put(
            state.table, NamedSharding(mmesh, PartitionSpec("model", None))
        ),
        acc=jax.device_put(
            state.acc, NamedSharding(mmesh, PartitionSpec("model"))
        ),
    )
    w = jnp.zeros((D,))
    bids = jnp.zeros((512,), jnp.int32)

    def bstep(state, ids):
        rows = state.table[ids]

        def loss_fn(r):
            return jnp.sum(jnp.tanh(r @ w))

        loss, g = jax.value_and_grad(loss_fn)(rows)
        return apply_row_grads(state, ids, g, lr=0.1), loss

    with mmesh:
        hlo = jax.jit(bstep).lower(state, bids).compile().as_text()
    reports.append(_summarize(
        f"big_table_sparse_step(V=4096,D={D},M=512,P={n_devices})", hlo))
    return reports


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    reports = audit(args.devices)
    for r in reports:
        print(json.dumps({
            "path": r["path"], "per_op": r["per_op"],
            "total_bytes": r["total_bytes"],
        }), flush=True)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(reports, fh, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
