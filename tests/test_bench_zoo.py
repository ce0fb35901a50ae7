"""The driver-visible bench surface must not rot silently.

bench.py's zoo dict wraps every family in try/except (one flaky TPU
compile must not sink the headline JSON line) — which also means a
broken bench function would just vanish from the round artifact. Pin
the wiring here: every name bench.py asks for exists in
tools.tpu_bench.BENCHES, and the serving bench actually runs end to
end on CPU at a tiny step count.
"""

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _bench_zoo_names():
    """The tuple of names bench_zoo iterates, read from bench.py's AST
    (importing bench.py would pull the torch baseline path)."""
    tree = ast.parse(open(os.path.join(REPO, "bench.py")).read())
    fn = next(
        n for n in ast.walk(tree)
        if isinstance(n, ast.FunctionDef) and n.name == "bench_zoo"
    )
    for node in ast.walk(fn):
        if isinstance(node, ast.Tuple) and all(
            isinstance(e, ast.Constant) for e in node.elts
        ):
            names = [e.value for e in node.elts]
            if "gru4rec" in names:
                return names
    raise AssertionError("bench_zoo's model tuple not found")


def test_bench_zoo_names_exist_in_benches():
    from tools import tpu_bench

    names = _bench_zoo_names()
    missing = [n for n in names if n not in tpu_bench.BENCHES]
    assert not missing, f"bench.py zoo names missing from BENCHES: {missing}"
    # and the headline itself
    assert "sasrec" in tpu_bench.BENCHES


def test_sasrec_serve_bench_runs_on_cpu():
    from tools import tpu_bench

    ds = tpu_bench._dataset()
    ms, _, bsz = tpu_bench.bench_sasrec_serve(ds, steps=2)
    assert ms > 0 and bsz == 1024
    # the roofline accounting must have filled from the compiled HLO
    # (bench.py copies it into the driver JSON's "mfu" dict)
    lc = tpu_bench.LAST_COST
    assert lc.get("flops_per_step", 0) > 0, lc
    assert lc.get("bound") in ("hbm", "mxu", "fused")
    assert 0 < lc.get("pct_of_roofline", 0) <= 100
