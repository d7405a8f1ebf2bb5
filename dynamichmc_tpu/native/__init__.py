"""Native (C++) runtime components, loaded via ctypes.

``fastdiag`` provides batch split rank-normalized R-hat + bulk/tail ESS with
OpenMP parallelism over parameters — the post-processing hot path for
4096-chain fleets. Built on demand with the in-tree Makefile (g++); all
callers fall back to the numpy implementation in ``dynamichmc_tpu.stats``
when the toolchain or binary is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "fastdiag.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the fastdiag shared library; None if
    unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("DYNHMC_NO_NATIVE"):
            return None  # kill-switch: force the numpy fallback
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.ess_rhat_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.ess_rhat_batch.restype = None
        _lib = lib
        return _lib


def ess_rhat_batch(positions: np.ndarray) -> Optional[dict]:
    """(chains, draws, params) -> dict of per-param ess_bulk/ess_tail/rhat,
    or None if the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(positions, np.float64)
    c, n, k = x.shape
    ess_bulk = np.empty(k)
    ess_tail = np.empty(k)
    rhat = np.empty(k)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.ess_rhat_batch(
        x.ctypes.data_as(dp),
        c,
        n,
        k,
        ess_bulk.ctypes.data_as(dp),
        ess_tail.ctypes.data_as(dp),
        rhat.ctypes.data_as(dp),
    )
    return {"ess_bulk": ess_bulk, "ess_tail": ess_tail, "rhat": rhat}
