"""Draw streaming: sink sampling chunks to host storage.

Production runs want more draws than HBM holds (4096 chains x 100-d f32 is
1.6 MB per draw step; a million draws is 1.6 TB). The chunked sampling
executor (engine.execute) can hand each chunk to a sink as it completes —
device memory stays O(chunk) and draws stream to a memory-mapped store that
is directly usable as a numpy array afterwards.
"""

from __future__ import annotations

import json
import os
import numpy as np


class MemmapDrawStore:
    """A (n_chains, n_samples, dim) memory-mapped draw store + sidecar
    logdensities, written chunk-by-chunk by the sampling executor.

    Usage:
        store = MemmapDrawStore(path, n_chains, n_samples, dim)
        run_chains(..., draw_sink=store.sink)
        store.positions[...]   # memmap, (C, N, K)
    """

    def __init__(self, path: str, n_chains: int, n_samples: int, dim: int,
                 dtype=np.float32):
        os.makedirs(path, exist_ok=True)
        self.path = path
        self.n_chains = n_chains
        self.n_samples = n_samples
        self.dim = dim
        self.dtype = np.dtype(dtype)
        self._pos_path = os.path.join(path, "positions.npy")
        self._ld_path = os.path.join(path, "logdensities.npy")
        self.positions = np.lib.format.open_memmap(
            self._pos_path, mode="w+", dtype=self.dtype,
            shape=(n_chains, n_samples, dim),
        )
        self.logdensities = np.lib.format.open_memmap(
            self._ld_path, mode="w+", dtype=self.dtype,
            shape=(n_chains, n_samples),
        )
        self.written = 0
        with open(os.path.join(path, "meta.json"), "w") as fh:
            json.dump(
                {
                    "n_chains": n_chains,
                    "n_samples": n_samples,
                    "dim": dim,
                    "dtype": self.dtype.name,
                },
                fh,
            )

    def sink(self, start: int, positions, logdensities, tree_statistics) -> None:
        """Write one sampling chunk; ``start`` is the absolute draw offset.
        Trailing draws beyond ``n_samples`` (chunk padding) are trimmed."""
        qs = np.asarray(positions)
        lds = np.asarray(logdensities)
        if qs.ndim == 2:  # single chain
            qs, lds = qs[None], lds[None]
        n = min(qs.shape[1], self.n_samples - start)
        if n <= 0:
            return
        self.positions[:, start : start + n] = qs[:, :n].astype(self.dtype)
        self.logdensities[:, start : start + n] = lds[:, :n].astype(self.dtype)
        self.written = max(self.written, start + n)

    def flush(self) -> None:
        self.positions.flush()
        self.logdensities.flush()

    @staticmethod
    def open(path: str) -> "MemmapDrawStore":
        """Re-open an existing store read-only."""
        with open(os.path.join(path, "meta.json")) as fh:
            meta = json.load(fh)
        store = object.__new__(MemmapDrawStore)
        store.path = path
        store.n_chains = meta["n_chains"]
        store.n_samples = meta["n_samples"]
        store.dim = meta["dim"]
        store.dtype = np.dtype(meta["dtype"])
        store._pos_path = os.path.join(path, "positions.npy")
        store._ld_path = os.path.join(path, "logdensities.npy")
        store.positions = np.load(store._pos_path, mmap_mode="r")
        store.logdensities = np.load(store._ld_path, mmap_mode="r")
        store.written = meta["n_samples"]
        return store
