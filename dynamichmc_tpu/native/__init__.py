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
_CPP = os.path.join(_DIR, "fastdiag.cpp")


def _so_path() -> str:
    """Host-keyed artifact name. The binary is compiled with -march=native,
    and this repo directory travels across heterogeneous hosts (same hazard
    as the XLA compile cache, utils/cache.py): a foreign host must never
    load another machine's ISA-specialized .so (SIGILL instead of the
    promised numpy fallback)."""
    from ..utils.cache import host_fingerprint

    return os.path.join(_DIR, f"fastdiag-{host_fingerprint()}.so")


_lock = threading.Lock()
_lib = None
_tried = False


def _build(so: str) -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _DIR, f"TARGET={os.path.basename(so)}"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(so)
    except Exception:
        return False


def _stale(so: str) -> bool:
    """Rebuild when the source is newer than the binary: a stale artifact
    would silently serve old math."""
    try:
        return os.path.getmtime(_CPP) > os.path.getmtime(so)
    except OSError:
        return True


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
        _SO = _so_path()
        if (not os.path.exists(_SO) or _stale(_SO)) and not _build(_SO):
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
