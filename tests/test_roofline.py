"""Roofline accounting calibration (tools/tpu_bench._cost_analysis).

r4's mfu dict reported pct_of_roofline up to 185% because XLA's
``bytes accessed`` (post-fusion LOGICAL bytes — an upper bound on true
HBM traffic) was trusted as measured DRAM traffic, and f32-executed
flops were scored against the bf16 peak. The r5 scheme must be
self-consistent on a program of KNOWN shape: a matmul whose flop count
we can write down, driven at synthetic timings that place it in each
regime (hbm-bound, mxu-bound, fusion-overcounted) — and pct_of_roofline
must never exceed 100 in any of them.
"""

import os
import sys

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.tpu_bench import (  # noqa: E402
    HBM_BYTES_PER_S,
    PEAK_BF16_FLOPS,
    PEAK_F32_FLOPS,
    _cost_analysis,
)


def _matmul_compiled(n=256):
    a = jnp.ones((n, n), jnp.float32)
    return jax.jit(lambda x: x @ x).lower(a).compile(), n


def test_known_matmul_flops_and_regimes():
    compiled, n = _matmul_compiled()
    # ground truth: n^3 MACs = 2n^3 flops (XLA counts fused mul+add as 2)
    want_flops = 2 * n**3

    # probe once for the byte count, then drive regime 1 at exactly
    # half the HBM ceiling → hbm- or mxu-bound (valid byte count),
    # pct within (0, 100]
    probe = _cost_analysis(compiled, steps=1, dt=1.0)
    assert probe["flops_per_step"] == want_flops, probe
    nbytes = probe["bytes_per_step"]
    out = _cost_analysis(compiled, steps=1, dt=nbytes / (0.5 * HBM_BYTES_PER_S))
    assert out["flops_dtype"] == "float32"
    assert out["bound"] in ("hbm", "mxu")
    assert 0 < out["pct_of_roofline"] <= 100
    assert out["hbm_gbps_logical"] <= HBM_BYTES_PER_S / 1e9

    # regime 2: a clock so fast the LOGICAL bytes could not physically
    # have moved through HBM → the byte count is proven fusion-inflated
    # and the HBM roof invalid; classification flips to "fused" and the
    # bound becomes the compute ceiling — still ≤ 100 as long as
    # achieved flops stay under the executed-dtype peak
    dt_impossible = nbytes / (2 * HBM_BYTES_PER_S)  # 2x over the ceiling
    # keep achieved compute under the f32 peak or the premise breaks
    if want_flops / dt_impossible < PEAK_F32_FLOPS:
        fast = _cost_analysis(compiled, steps=1, dt=dt_impossible)
        assert fast["bound"] == "fused", fast
        assert fast["hbm_gbps_logical"] > HBM_BYTES_PER_S / 1e9
        assert 0 < fast["pct_of_roofline"] <= 100
        assert fast["pct_of_roofline"] == fast["mfu_pct"] or (
            abs(fast["pct_of_roofline"] - fast["mfu_pct"]) < 0.1
        )


def test_mfu_scored_against_executed_dtype_peak():
    compiled, n = _matmul_compiled()
    dt = 1e-3
    f32 = _cost_analysis(compiled, steps=1, dt=dt, dtype="float32")
    bf16 = _cost_analysis(compiled, steps=1, dt=dt, dtype="bfloat16")
    # same achieved flops; the f32 ceiling is 4x lower → 4x the MFU
    assert abs(f32["mfu_pct"] - 4 * bf16["mfu_pct"]) < 0.05
    assert PEAK_F32_FLOPS * 4 == PEAK_BF16_FLOPS


def test_every_regime_bounded_by_100_over_dt_sweep():
    """Sweep dt across 8 orders of magnitude: no dt may produce
    pct_of_roofline > 100 while achieved compute is physically
    possible (the r4 failure mode was exactly a 'valid-looking' entry
    above 100)."""
    compiled, n = _matmul_compiled()
    flops = 2 * n**3
    for exp in range(-8, 1):
        dt = 10.0**exp
        if flops / dt >= PEAK_F32_FLOPS:
            continue  # physically impossible timing; not a real regime
        out = _cost_analysis(compiled, steps=1, dt=dt)
        assert out["pct_of_roofline"] <= 100, (dt, out)
