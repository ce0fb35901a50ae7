"""Command-line entry points: ``python -m recboard_tpu <command>``.

Commands
--------
make        Build Processed/<name>/ from a raw TSV (the `freerec make`
            analogue: k-core filter + dense reindex + LOU/ROU split,
            SURVEY.md §3.5; build command recorded in meta.json).
run         Train/evaluate a zoo model (recboard_tpu.run).
recommend   Batch inference: top-k recommendations from a finished run
            (recboard_tpu.serve).
benchmark   Aggregate the benchmark store into leaderboard data.
bench       Print the throughput benchmark JSON line.
"""

from __future__ import annotations

import argparse
import os
import sys

from . import utils


def cmd_make(argv):
    ap = argparse.ArgumentParser(prog="recboard_tpu make")
    ap.add_argument("name", help="output dataset name, e.g. Amazon2014Beauty_550_LOU")
    ap.add_argument("raw", help="raw interactions file: a TSV "
                    "(user\titem[\trating[\tts]]), or with --format "
                    "amazon2023 a review .jsonl(.gz), or with --format "
                    "amazon2014 a ratings CSV(.gz)")
    ap.add_argument("--root", default=".")
    ap.add_argument("--format", choices=("tsv", "amazon2023", "amazon2014"),
                    default="tsv",
                    help="raw input format; amazon2023/amazon2014 run the "
                         "data.amazon extractors first (the reference's "
                         "preprocess_amazon2023_context.ipynb extract step)")
    ap.add_argument("--meta-file", default=None,
                    help="amazon2023 item metadata .jsonl(.gz); its "
                         "TITLE/CATEGORIES/BRAND land in item.txt for the "
                         "semantic-feature encoders (sem/encode.py)")
    ap.add_argument("--min-rating", type=float, default=0.0,
                    help="amazon2023: drop reviews below this rating at "
                         "extraction time (star4pos filters post-extract)")
    ap.add_argument("--kcore4user", "-ku", type=int, default=5)
    ap.add_argument("--kcore4item", "-ki", type=int, default=5)
    ap.add_argument("--star4pos", "-sp", type=float, default=0)
    ap.add_argument("--splitting", choices=("LOU", "ROU"), default="LOU")
    ap.add_argument("--ratios", default="8,1,1")
    args = ap.parse_args(argv)
    from .data import preprocessing

    raw, attrs_file = args.raw, None
    if args.format != "tsv":
        import tempfile

        from .data import amazon

        out = os.path.join(tempfile.mkdtemp(prefix="recboard_make_"),
                           "interactions.tsv")
        if args.format == "amazon2023":
            raw = amazon.extract_from_amazon2023(
                args.raw, out, meta_file=args.meta_file,
                min_rating=args.min_rating,
            )
            if args.meta_file:
                attrs_file = raw + ".item.tsv"
        else:
            raw = amazon.extract_from_amazon2014(args.raw, out)
    elif args.meta_file:
        ap.error("--meta-file requires --format amazon2023")
    path = preprocessing.make_from_tsv(
        raw,
        args.root,
        args.name,
        item_attrs_file=attrs_file,
        kcore4user=args.kcore4user,
        kcore4item=args.kcore4item,
        star4pos=args.star4pos,
        splitting=args.splitting,
        ratios=tuple(int(x) for x in args.ratios.split(",")),
    )
    utils.infoLogger(f"[make] >>> built {path}")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return
    cmd, rest = argv[0], argv[1:]
    if cmd == "make":
        cmd_make(rest)
    elif cmd == "run":
        from . import run

        run.main(rest)
    elif cmd == "recommend":
        from . import serve

        serve.main(rest)
    elif cmd == "benchmark":
        from . import benchmark

        benchmark.main(rest)
    elif cmd == "bench":
        import runpy

        sys.argv = ["bench.py"] + rest
        runpy.run_path("bench.py", run_name="__main__")
    else:
        raise SystemExit(
            f"unknown command {cmd!r}; one of: make, run, recommend, benchmark, bench"
        )


if __name__ == "__main__":
    main()
