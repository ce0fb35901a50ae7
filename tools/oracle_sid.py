"""Oracle-SID control for the generative quality gap (r2 verdict).

On reference Beauty, TIGER ≈ SASRec; on the synthetic store TIGER sits
~3.5× below SASRec. Hypothesis: the synthetic SVD/hash features carry
no semantic signal beyond co-occurrence, so ANY learned tokenizer is
feature-bottlenecked — not a bug in the T5/beam stack. This tool
builds the best codes ANY tokenizer could produce on this data — codes
derived directly from the generator's PLANTED structure (the item
group, then a free disambiguator) — and trains the identical stage-B
on them. The resulting number is the tokenizer-independent ceiling of
the SID bottleneck on this dataset; docs/PARITY.md records it.

    python tools/oracle_sid.py [--dataset SynBeauty_000_LOU] [--seeds 1]
        [--epochs 100] [--embedding-dim 32] [--no-run]

Reference contract being probed:
/root/reference/benchmark/Amazon2014Beauty_550_LOU/TIGER.json (TIGER ≈
SASRec on real data); generator structure: data/synthetic.py:25-72.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# SynBeauty_000_LOU build parameters (seed_sweep.py main: seed=7 and the
# sweep's CLI defaults; meta.json's build_command records them)
SYN_BUILDS = {
    "SynBeauty_000_LOU": dict(num_users=800, num_items=300, avg_len=14.0,
                              seed=7, markov_strength=0.45,
                              group_strength=0.45, num_groups=6),
    "SynYelp_000_ROU": dict(num_users=800, num_items=300, avg_len=14.0,
                            seed=7, markov_strength=0.1,
                            group_strength=0.75, num_groups=6),
    # the Beauty-scale store (r4): group-local markov transitions
    "SynBeautyXL_000_LOU": dict(num_users=22363, num_items=12101,
                                avg_len=8.9, seed=7, markov_strength=0.45,
                                group_strength=0.45, num_groups=96,
                                group_markov=True),
}


def planted_structure(dataset: str, root: str):
    """Per-PROCESSED-item planted (group, successor) of the generator.

    Replays the deterministic generator + the exact preprocessing
    (k-core → reindex → user/time sort) and verifies the replay against
    the processed TSVs before trusting the id mapping. Successors are
    remapped into processed-id space (-1 where the successor was
    k-core-filtered away).
    """
    from recboard_tpu.data import synthetic
    from recboard_tpu.data.preprocessing import kcore_filter, reindex

    build = SYN_BUILDS[dataset]
    group_markov = bool(build.get("group_markov", False))
    users, items, ts = synthetic.generate_interactions(
        num_users=build["num_users"], num_items=build["num_items"],
        avg_len=build["avg_len"], seed=build["seed"],
        markov_strength=build["markov_strength"],
        group_strength=build["group_strength"],
        num_groups=build["num_groups"],
        group_markov=group_markov,
    )
    # the generator's planted tables (same rng consumption order as
    # generate_interactions: pop → successor → item_group → user_group
    # [→ per-group successor permutations when group_markov])
    rng = np.random.default_rng(build["seed"])
    _ = 1.0 / np.arange(1, build["num_items"] + 1) ** 0.8
    successor_raw = rng.permutation(build["num_items"])
    item_group_raw = rng.integers(0, build["num_groups"],
                                  size=build["num_items"])
    if group_markov:
        _ = rng.integers(0, build["num_groups"], size=build["num_users"])
        successor_raw = np.arange(build["num_items"])
        for g in range(build["num_groups"]):
            idx = np.flatnonzero(item_group_raw == g)
            if len(idx):
                successor_raw[idx] = rng.permutation(idx)

    extra = {"ts": ts}
    users, items, extra = kcore_filter(users, items, 3, 1, extra)
    items_new, old_items = reindex(items)

    # verify the replay: the processed dataset's (user, item) rows must
    # match what this replay produces after the same reindex+sort
    users_new, _ = reindex(users)
    order = np.lexsort((extra["ts"], users_new))
    got = set(zip(users_new[order].tolist(), items_new[order].tolist()))
    proc = os.path.join(root, "Processed", dataset)
    want = set()
    for split in ("train", "valid", "test"):
        with open(os.path.join(proc, f"{split}.txt")) as fh:
            fh.readline()
            for line in fh:
                parts = line.split("\t")
                want.add((int(parts[0]), int(parts[1])))
    if got != want:
        raise RuntimeError(
            f"replayed generator does not reproduce {dataset}: "
            f"{len(got ^ want)} mismatched (user,item) pairs — build "
            "params drifted; update SYN_BUILDS"
        )
    # successor in processed-id space
    raw_to_new = {int(r): n for n, r in enumerate(old_items)}
    succ = np.array(
        [raw_to_new.get(int(successor_raw[r]), -1) for r in old_items],
        np.int64,
    )
    return item_group_raw[old_items], succ


def oracle_codes(groups: np.ndarray) -> np.ndarray:
    """(N, 2) codes: level-0 = planted group (the learnable semantic
    signal, perfectly encoded), level-1 = rank within the group (a
    collision-free disambiguator — itemhood itself, which every unique
    SID scheme must carry)."""
    N = len(groups)
    codes = np.zeros((N, 2), np.int64)
    codes[:, 0] = groups
    for g in np.unique(groups):
        idx = np.flatnonzero(groups == g)
        codes[idx, 1] = np.arange(len(idx))
    return codes


def chain_codes(succ: np.ndarray) -> np.ndarray:
    """(N, 2) codes aligned with the MARKOV signal: the successor
    permutation decomposes into cycles; level-0 = cycle id, level-1 =
    position along the cycle, so the planted transition becomes the
    code-level rule (same level-0, level-1 -> its cyclic successor).
    Bounds what a tokenizer could do if it could see the transition
    structure (no real tokenizer can — it only sees item FEATURES)."""
    N = len(succ)
    chain = np.full(N, -1, np.int64)
    pos = np.zeros(N, np.int64)
    cid = 0
    for start in range(N):
        if chain[start] >= 0:
            continue
        # walk the cycle/chain containing `start` (succ may have -1
        # holes where the successor was filtered out)
        cur, p = start, 0
        while cur >= 0 and chain[cur] < 0:
            chain[cur] = cid
            pos[cur] = p
            cur = int(succ[cur])
            p += 1
        cid += 1
    return np.stack([chain, pos], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/seed_sweep/data")
    ap.add_argument("--dataset", default="SynBeauty_000_LOU")
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--lr", type=float, default=0.001)
    ap.add_argument("--embedding-dim", type=int, default=32)
    ap.add_argument("--num-layers", type=int, default=1)
    ap.add_argument("--scheme", default="group", choices=("group", "chain"),
                    help="group: planted-group prefix (the semantic "
                         "ceiling); chain: successor-cycle codes (the "
                         "markov-transition ceiling)")
    ap.add_argument("--no-run", action="store_true",
                    help="only write the oracle vocab")
    ap.add_argument("--tpu", action="store_true",
                    help="run stage-B on the TPU (serialize with other "
                         "TPU jobs — the axon tunnel is single-client)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from recboard_tpu.sem.converter import SemIDConverter

    groups, succ = planted_structure(args.dataset, args.root)
    codes = (oracle_codes(groups) if args.scheme == "group"
             else chain_codes(succ))
    proc = os.path.join(args.root, "Processed", args.dataset)
    vocab_path = os.path.join(proc, f"oracle_{args.scheme}_sid_vocab.json")
    SemIDConverter.from_codes(codes).save(vocab_path)
    print(f"[oracle:{args.scheme}] wrote {vocab_path}: {len(codes)} items, "
          f"{int(codes[:, 0].max()) + 1} level-0 codes, "
          f"max level-1 {int(codes[:, 1].max()) + 1}", flush=True)
    if args.no_run:
        return

    import io
    import contextlib
    import runpy

    results = []
    for seed in range(args.seeds):
        sys.argv = [
            "run", "--model", "TIGER", "--root", args.root,
            "--dataset", args.dataset,
            "--sid_vocab_file", f"oracle_{args.scheme}_sid_vocab.json",
            "--epochs", str(args.epochs), "--lr", str(args.lr),
            "--batch-size", "128", "--eval-freq", "3",
            # TPU runs: sample on device and checkpoint coarsely — the
            # per-epoch fetch was the sweep wall (docs/PERF.md)
            "--on-device-sampling", "true", "--checkpoint-freq", "50",
            "--maxlen", "20", "--num_beams", "10",
            "--embedding_dim", str(args.embedding_dim),
            "--num_heads", "2",
            "--ffn_dim", str(args.embedding_dim * 2),
            "--num_encoder_layers", str(args.num_layers),
            "--num_decoder_layers", str(args.num_layers),
            "--seed", str(seed),
            "--description", f"TIGER-oracle-{args.scheme}",
            "--record-benchmark", "false",
            "--log-path", f"/tmp/oracle_sid/logs_{args.scheme}",
            "--checkpoint-path", f"/tmp/oracle_sid/infos_{args.scheme}/s{seed}",
        ]
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
            runpy.run_module("recboard_tpu.run", run_name="__main__")
        line = [ln for ln in buf.getvalue().splitlines() if "best:" in ln]
        best = eval(line[-1].split("best:", 1)[1]) if line else {}
        results.append(best)
        print(f"[oracle:{args.scheme}] seed {seed}: {best}", flush=True)
    print(json.dumps({f"oracle_{args.scheme}": results}), flush=True)


if __name__ == "__main__":
    main()
