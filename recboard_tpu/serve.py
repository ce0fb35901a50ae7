"""Batch inference ("serving"): top-k recommendations from a finished run.

``python -m recboard_tpu recommend --run <LOG_PATH> [--topk 10] ...``

The reference framework stops at training + ranking evaluation; this is
new TPU-native capability for the deployment half of the lifecycle:
reload a run's resolved config snapshot + best params, rebuild the model
against the same processed dataset, and emit per-user top-k item ids
from one jitted full-catalog scoring program (score → mask-seen →
`lax.top_k`), batched and device-resident end to end.

The serving view is the model's own test pipe (each user's history up to
the split point) so the emitted lists are exactly "what the system would
have recommended"; a HitRate@k of the held-out item is reported on
stderr as a sanity check against the run's recorded metrics.

Output: TSV ``user \t item_1 ... item_k`` (processed dense item ids, the
id space of ``Processed/<name>/item.txt``), or with ``--with-scores``
``user \t item:score ...``.

``--num-model-shards N`` serves from a (data, model) device mesh: params
shard by the model's ``partition_rules()`` (big embedding tables by
rows, parallel/mesh.py) and the one jitted scoring program runs under
GSPMD — the path for catalogs exceeding single-chip HBM.

``--bench`` skips the TSV and prints one JSON line of serving latency
(p50/p95/p99 ms per batch and users/s, timed per dispatch — the honest
serving regime, unlike training throughput which amortizes dispatch
over scan chunks).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional

import numpy as np

from . import utils


def load_run_config(run_dir: str):
    """Resolved config.yaml snapshot -> Config (attr-style dict)."""
    import yaml

    from .parser import Config

    path = os.path.join(run_dir, "config.yaml")
    with open(path) as fh:
        cfg = Config(yaml.safe_load(fh) or {})
    return cfg


def _pad_ragged(rows, fill, width=None):
    width = width or max((len(r) for r in rows), default=1)
    width = max(width, 1)
    out = np.full((len(rows), width), fill, dtype=np.int64)
    for i, r in enumerate(rows):
        out[i, : len(r)] = list(r)[:width]
    return out


def main(argv: Optional[list] = None):
    ap = argparse.ArgumentParser(prog="recboard_tpu recommend")
    ap.add_argument("--run", required=True,
                    help="LOG_PATH of a finished run (contains config.yaml)")
    ap.add_argument("--filename", default=None,
                    help="params pickle under CHECKPOINT_PATH "
                         "(default: best, falling back to last)")
    ap.add_argument("--split", choices=("valid", "test"), default="test")
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--output", default="-", help="TSV path or - for stdout")
    ap.add_argument("--retain-seen", action="store_true",
                    help="do not mask already-seen items")
    ap.add_argument("--with-scores", action="store_true")
    ap.add_argument("--num-model-shards", type=int, default=1,
                    help="shard params over a (data, model) mesh")
    ap.add_argument("--sharded-rank", action="store_true",
                    help="route scoring through the explicit shard_map "
                         "ranker (parallel/topk.rank_top_k_row_sharded): "
                         "the full (B, V) score matrix never exists on "
                         "one chip — the path for catalogs exceeding "
                         "single-chip HBM; requires a model with "
                         "encode_queries/item_table and "
                         "--num-model-shards > 1")
    ap.add_argument("--blocked-topk", type=int, default=0, metavar="ROWS",
                    help="stream the catalog in ROWS-row slabs with a "
                         "running top-k (parallel/big_table.blocked_top_k) "
                         "instead of materializing (B, V) scores — the "
                         "SINGLE-chip path for multi-10M-row catalogs "
                         "(82 GB at B=1024, V=20M would OOM); requires a "
                         "model with encode_queries/item_table")
    ap.add_argument("--bench", action="store_true",
                    help="print one JSON serving-latency line, no TSV")
    ap.add_argument("--bench-batches", type=int, default=64,
                    help="max batches staged on device for --bench "
                         "(bounds HBM use on large splits)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from . import run as run_mod
    from .data.pipes import Size

    cfg = load_run_config(args.run)
    dataset = run_mod.load_dataset(cfg)
    from .data.datasets import TaskTag

    if dataset.tasktag == TaskTag.PREDICTION:
        raise SystemExit(
            "recommend serves ranking models; CTR models predict per-pair "
            "scores (use `run` with --epochs 0 --resume for eval)"
        )
    model = run_mod.build_model(cfg.model, dataset, cfg)
    supported = getattr(type(model), "SUPPORTED_RANKINGS", ("full", "pool"))
    if "full" not in supported:
        raise SystemExit(f"{cfg.model} does not support full-catalog ranking")

    ckpt_dir = cfg.get("CHECKPOINT_PATH") or args.run
    names = [args.filename] if args.filename else [
        cfg.get("BEST_FILENAME", "best.pkl"), cfg.get("SAVED_FILENAME", "model.pkl")
    ]
    payload = None
    for name in names:
        path = os.path.join(ckpt_dir, name)
        if os.path.exists(path):
            payload = utils.import_pickle(path)
            utils.infoLogger(f"[recommend] >>> params from {path}")
            break
    if payload is None:
        raise SystemExit(f"no params pickle under {ckpt_dir} (tried {names})")
    if payload.get("partial"):
        # trainable-subset checkpoint (E4SRecCoach.save): rebuild the
        # frozen backbone exactly as training initialized it — the same
        # seed produces the same rng split as Coach._init_state — then
        # overlay the saved subset; the int8 `quant` collection comes
        # from the payload when present (seed replay otherwise)
        import inspect as _inspect

        utils.infoLogger(
            "[recommend] >>> partial checkpoint: re-initializing the "
            f"frozen backbone from seed {cfg.get('seed', 0)} and merging "
            "the saved trainable subset"
        )
        rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
        _, init_rng, drop_rng = jax.random.split(rng, 3)
        sig_t = _inspect.signature(model.sure_trainpipe)
        tpipe = (
            model.sure_trainpipe(int(cfg.maxlen), int(cfg.batch_size))
            if "maxlen" in sig_t.parameters
            else model.sure_trainpipe(int(cfg.batch_size))
        )
        if hasattr(tpipe, "set_seed"):
            tpipe.set_seed(int(cfg.get("seed", 0)))
        if hasattr(tpipe, "set_epoch"):
            tpipe.set_epoch(0)
        first = next(iter(tpipe))
        arrays = {
            f: jnp.asarray(v)
            for f, v in first.items()
            if isinstance(v, np.ndarray) and f != Size
        }
        variables = jax.jit(model.init)(
            {"params": init_rng, "dropout": drop_rng, "sampling": drop_rng},
            arrays,
        )
        params = jax.tree.map(
            lambda cur, new: cur if new is None else jnp.asarray(new),
            variables["params"],
            payload["params"],
            is_leaf=lambda x: x is None,
        )
        stats = jax.tree.map(
            jnp.asarray,
            payload.get("stats")
            or {k: v for k, v in variables.items() if k != "params"},
        )
    else:
        params = jax.tree.map(jnp.asarray, payload["params"])
        # non-param collections (BatchNorm running stats) ride beside params
        stats = jax.tree.map(jnp.asarray, payload.get("stats") or {})

    if args.num_model_shards > 1:
        from .parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(args.num_model_shards)
        specs = mesh_lib.match_partition_rules(model.partition_rules(), params)
        logical = jax.tree.map(lambda x: np.asarray(np.shape(x)), params)
        params = mesh_lib.shard_params(mesh, params, specs)
        if any(
            np.shape(p) != tuple(s)
            for p, s in zip(jax.tree.leaves(params),
                            jax.tree.leaves(logical))
        ):
            # non-dividing vocabs auto-padded to shard: slice the pad
            # rows off before every flax apply (validates shapes); the
            # padded masters stay sharded, the slice happens in-jit at
            # the scoring sites and once eagerly for the buffers
            def _unpad(p, _s=logical):
                return jax.tree.map(
                    lambda x, s: x[: int(s[0])]
                    if np.ndim(x) >= 1 and np.shape(x) != tuple(s) else x,
                    p, _s,
                )
        else:
            def _unpad(p):
                return p
        n_sharded = sum(
            1 for leaf in jax.tree.leaves(params)
            if getattr(leaf.sharding, "spec", None)
            and any(a is not None for a in tuple(leaf.sharding.spec))
        )
        utils.infoLogger(
            f"[recommend] >>> {n_sharded} param tensors sharded over "
            f"{dict(mesh.shape)} mesh"
            + ("" if n_sharded else " — NOTHING sharded (see warnings)")
        )
    else:
        def _unpad(p):
            return p

    import inspect

    sig = inspect.signature(model.sure_trainpipe)
    maker = model.sure_testpipe if args.split == "test" else model.sure_validpipe
    if "maxlen" in sig.parameters:
        pipe = maker(int(cfg.maxlen), ranking="full",
                     batch_size=int(args.batch_size))
    else:
        pipe = maker(ranking="full", batch_size=int(args.batch_size)) \
            if "batch_size" in inspect.signature(maker).parameters \
            else maker(ranking="full")
    if hasattr(pipe, "set_seed"):
        pipe.set_seed(int(cfg.get("seed", 0)))

    buffers = model.apply(
        {"params": _unpad(params), **stats}, method="reset_ranking_buffers"
    )

    # joint generative models (ETEGRec/DIGER): their constrained beam
    # search consumes the item codes + dense trie that the Coach
    # injects during training — rebuild both from the checkpointed
    # tokenizer so `recommend` serves them too
    gen_extras = {}
    if hasattr(type(model), "current_codes"):
        from .models.zoo.etegrec import ETEGRecCoach, codes_with_check_digit

        codes = np.asarray(
            model.apply({"params": _unpad(params), **stats}, method="current_codes")
        )
        full = codes_with_check_digit(codes, max_rank=model.num_codewords)
        item_code = np.concatenate(
            [np.full((model.NUM_PADS, full.shape[1]), -1, np.int64), full],
            axis=0,
        )
        trie = ETEGRecCoach._build_trie(full, model)
        gen_extras = {
            "item_code": jnp.asarray(item_code),
            "trie": tuple(jnp.asarray(t) for t in trie),
        }
        utils.infoLogger(
            f"[recommend] >>> rebuilt {len(full)} item codes + trie "
            f"({trie[0].shape[0]} nodes) from the tokenizer"
        )

    k = int(args.topk)
    mask_seen = not args.retain_seen

    if args.sharded_rank:
        if args.num_model_shards <= 1:
            raise SystemExit("--sharded-rank requires --num-model-shards > 1")
        from .models.base import RecSysArch as _Base

        if type(model).encode_queries is _Base.encode_queries:
            raise SystemExit(
                f"{cfg.model} does not define encode_queries/item_table "
                "(two-tower dot-product scorers only)"
            )
        from .parallel import tables as tables_lib
        from .parallel.topk import rank_top_k_row_sharded

        n_shards = int(args.num_model_shards)

        @jax.jit
        def score_topk(params, buffers, batch, seen_ids):
            q = model.apply(
                {"params": _unpad(params), **stats}, batch, method="encode_queries"
            )
            table = model.apply(
                {"params": _unpad(params), **stats}, method="item_table"
            )
            V = table.shape[0]
            Vp = tables_lib.pad_vocab(V, n_shards)
            table = jnp.pad(table, ((0, Vp - V), (0, 0)))
            # exact unseen top-k: take k + seen-width candidates, drop
            # the seen ones, re-top-k — ≥k unseen candidates remain
            W = seen_ids.shape[1] if mask_seen else 0
            kk = min(k + W, V)
            vals, idx = rank_top_k_row_sharded(
                mesh, q, table, kk, valid_count=V
            )
            if mask_seen:
                hit = (idx[:, :, None] == seen_ids[:, None, :]).any(-1)
                vals = jnp.where(hit, -jnp.inf, vals)
                vals, pos = jax.lax.top_k(vals, k)
                idx = jnp.take_along_axis(idx, pos, axis=1)
            else:
                vals, idx = vals[:, :k], idx[:, :k]
            return vals, idx
    elif args.blocked_topk:
        from .models.base import RecSysArch as _Base

        if type(model).encode_queries is _Base.encode_queries:
            raise SystemExit(
                f"{cfg.model} does not define encode_queries/item_table "
                "(two-tower dot-product scorers only)"
            )
        from .parallel.big_table import blocked_top_k

        block = int(args.blocked_topk)

        @jax.jit
        def score_topk(params, buffers, batch, seen_ids):
            q = model.apply(
                {"params": _unpad(params), **stats}, batch, method="encode_queries"
            )
            table = model.apply(
                {"params": _unpad(params), **stats}, method="item_table"
            )
            V = table.shape[0]
            # exact unseen top-k: take k + seen-width candidates, drop
            # the seen ones, re-top-k — ≥k unseen candidates remain
            W = seen_ids.shape[1] if mask_seen else 0
            kk = min(k + W, V)
            vals, idx = blocked_top_k(q, table, kk, block_size=block)
            if mask_seen:
                hit = (idx[:, :, None] == seen_ids[:, None, :]).any(-1)
                vals = jnp.where(hit, -jnp.inf, vals)
                vals, pos = jax.lax.top_k(vals, k)
                idx = jnp.take_along_axis(idx, pos, axis=1)
            else:
                vals, idx = vals[:, :k], idx[:, :k]
            return vals, idx
    else:
        @jax.jit
        def score_topk(params, buffers, batch, seen_ids):
            if gen_extras:
                batch = {**batch, **gen_extras}
            scores = model.apply(
                {"params": _unpad(params), **stats}, batch, buffers,
                method="recommend_from_full",
            )
            if mask_seen:
                rows = jnp.arange(scores.shape[0])[:, None]
                scores = scores.at[rows, seen_ids].set(-1e23, mode="drop")
            vals, idx = jax.lax.top_k(scores, k)
            return vals, idx

    def device_batches():
        for data in pipe:
            users = np.asarray(data[model.User]).reshape(-1)
            batch = {
                f: jnp.asarray(v)
                for f, v in data.items()
                if isinstance(v, np.ndarray) and f != Size
            }
            seen = data.get(model.ISeen)
            # bucket the padded-seen width to powers of two: one compiled
            # program per bucket instead of one per batch
            width = 1
            if seen is not None:
                w = max((len(r) for r in seen), default=1)
                while width < w:
                    width *= 2
            seen_ids = jnp.asarray(
                _pad_ragged(seen, fill=2**30, width=width)
                if seen is not None
                else np.full((len(users), 1), 2**30)
            )
            yield users, batch, seen_ids, data

    if args.bench:
        import json
        import time

        if args.with_scores or args.output != "-":
            utils.warnLogger(
                "[recommend] >>> --bench measures latency only; "
                "--output/--with-scores are ignored (rerun without --bench "
                "to emit the TSV)"
            )
        # stage only a bounded prefix: steady-state serving holds ONE
        # batch in HBM; staging the whole split would OOM on large ones
        import itertools

        staged = list(
            itertools.islice(device_batches(), max(int(args.bench_batches), 1))
        )
        if not staged:
            raise SystemExit(
                "no eval batches to serve — the split produced zero users"
            )
        for users, batch, seen_ids, _ in staged:  # compile every bucket
            jax.block_until_ready(score_topk(params, buffers, batch, seen_ids))
        lat, n_users = [], 0
        for users, batch, seen_ids, _ in staged:
            t0 = time.perf_counter()
            jax.block_until_ready(score_topk(params, buffers, batch, seen_ids))
            lat.append(time.perf_counter() - t0)
            n_users += len(users)
        lat_ms = np.sort(np.asarray(lat)) * 1e3
        pct = lambda p: float(np.percentile(lat_ms, p))
        print(json.dumps({
            "metric": "recommend_latency_ms",
            "model": cfg.model, "topk": k, "batches": len(lat),
            "batch_size": int(args.batch_size),
            "p50": round(pct(50), 3), "p95": round(pct(95), 3),
            "p99": round(pct(99), 3),
            "users_per_s": round(n_users / float(np.sum(lat)), 1),
        }))
        return

    out = sys.stdout if args.output == "-" else open(args.output, "w")
    hits = total = 0
    try:
        for users, batch, seen_ids, data in device_batches():
            vals, idx = score_topk(params, buffers, batch, seen_ids)
            vals, idx = np.asarray(vals), np.asarray(idx)
            targets = data.get(model.IUnseen)
            for i, user in enumerate(users):
                if targets is not None and len(targets[i]):
                    total += 1
                    if targets[i][0] in idx[i]:
                        hits += 1
                if args.with_scores:
                    items = "\t".join(
                        f"{it}:{v:.6f}" for it, v in zip(idx[i], vals[i])
                    )
                else:
                    items = "\t".join(str(it) for it in idx[i])
                out.write(f"{user}\t{items}\n")
    finally:
        if out is not sys.stdout:
            out.close()
    if total:
        utils.infoLogger(
            f"[recommend] >>> HitRate@{k} on {args.split} targets: "
            f"{hits / total:.4f} ({total} users)"
        )


if __name__ == "__main__":
    main()
