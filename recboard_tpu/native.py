"""ctypes bindings for the C++ host-side hot loops (native/).

Builds native/librecboard_native.so on first use (g++, cached beside
the source) and exposes:

* ``sample_negatives(users, num_negs, seen_indptr, seen_items,
  n_items, seed)`` — chunked uniform negative sampling with seen-set
  rejection (the torchdata-worker replacement, SURVEY.md §7 #5);
* ``parse_interactions(path)`` — TSV interaction reader.

Everything degrades to NumPy when the toolchain is unavailable
(``native.available()`` reports which path is active).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from . import utils

__all__ = ["available", "sample_negatives", "parse_interactions", "build"]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SRC = os.path.join(_SRC_DIR, "recboard_native.cpp")
_SO = os.path.join(_SRC_DIR, "librecboard_native.so")


def build(force: bool = False) -> Optional[str]:
    """Compile the shared library (cached by mtime)."""
    if not os.path.isfile(_SRC):
        return None
    if (
        not force
        and os.path.isfile(_SO)
        and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
    ):
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        utils.infoLogger(f"[native] >>> built {_SO}")
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as exc:
        utils.warnLogger(f"[native] >>> build failed ({exc}); using NumPy fallback")
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.sample_negatives.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int64, i64p, i64p,
        ctypes.c_int64, ctypes.c_uint64, i64p,
    ]
    lib.sample_negatives.restype = None
    lib.count_lines.argtypes = [ctypes.c_char_p]
    lib.count_lines.restype = ctypes.c_int64
    lib.parse_interactions.argtypes = [
        ctypes.c_char_p, i64p, i64p, f64p, f64p, ctypes.c_int64
    ]
    lib.parse_interactions.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _as_i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def sample_negatives(
    users: np.ndarray,
    num_negs: int,
    seen_indptr: np.ndarray,
    seen_items: np.ndarray,
    n_items: int,
    seed: int,
) -> np.ndarray:
    """(len(users), num_negs) uniform negatives excluding each user's
    seen items. Native when possible, vectorized NumPy otherwise."""
    users = np.ascontiguousarray(users, dtype=np.int64)
    lib = _load()
    out = np.empty((len(users), num_negs), dtype=np.int64)
    if lib is not None and len(users):
        lib.sample_negatives(
            _as_i64p(users),
            len(users),
            num_negs,
            _as_i64p(np.ascontiguousarray(seen_indptr, np.int64)),
            _as_i64p(np.ascontiguousarray(seen_items, np.int64)),
            n_items,
            ctypes.c_uint64(seed & (2**64 - 1)),
            _as_i64p(out),
        )
        return out
    # NumPy fallback: chunked rejection sampling
    rng = np.random.default_rng(seed)
    out = rng.integers(0, n_items, size=(len(users), num_negs))
    indptr = np.asarray(seen_indptr)
    items = np.asarray(seen_items)
    for _ in range(64):
        bad = np.zeros(out.shape, dtype=bool)
        for i, u in enumerate(users):
            seen = items[indptr[u] : indptr[u + 1]]
            if seen.size:
                idx = np.minimum(np.searchsorted(seen, out[i]), seen.size - 1)
                bad[i] = seen[idx] == out[i]
        n_bad = int(bad.sum())
        if n_bad == 0:
            break
        out[bad] = rng.integers(0, n_items, size=n_bad)
    return out


def parse_interactions(path: str) -> Optional[Tuple[np.ndarray, ...]]:
    """(users, items, col3, col4) from an interactions TSV; None if the
    native library is unavailable (callers fall back to Python I/O)."""
    lib = _load()
    if lib is None:
        return None
    n = lib.count_lines(path.encode())
    if n <= 0:
        return None
    users = np.empty(n, dtype=np.int64)
    items = np.empty(n, dtype=np.int64)
    col3 = np.empty(n, dtype=np.float64)
    col4 = np.empty(n, dtype=np.float64)
    got = lib.parse_interactions(
        path.encode(),
        _as_i64p(users),
        _as_i64p(items),
        col3.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        col4.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
    )
    if got < 0:
        return None
    return users[:got], items[:got], col3[:got], col4[:got]
