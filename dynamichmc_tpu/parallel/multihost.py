"""Multi-host (multi-process) chain fan-out.

The reference is single-process by design (SURVEY.md §5: no distributed
backend; multi-chain is user-side threading). The TPU-native scale-out path:
``jax.distributed`` + a global mesh over every chip of every host. Chains are
embarrassingly parallel, so the sampling hot loop needs no cross-host
communication at all; the only collectives are (a) pooled-adaptation Welford
reductions, one per tuning block, which ride ICI within a slice and DCN
across slices, and (b) post-hoc diagnostics gathers.

This module cannot be exercised on a single-chip dev box; the sharding path
it drives is the same shard_map program validated on the virtual CPU mesh
(tests/test_parallel.py, __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .chains import CHAIN_AXIS, run_chains
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op if already initialized or running
    single-process). On TPU pods the arguments are auto-detected from the
    environment."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # tolerate re-initialization always, and the backend-already-started
        # error ONLY for the no-coordinator (single-process no-op) case;
        # anything else (bad coordinator, connection refused, backend
        # started before an explicitly-requested multi-process init) must
        # surface, not silently degrade to a single-process run
        msg = str(e).lower()
        benign = "already initialized" in msg or (
            coordinator_address is None and "must be called before" in msg
        )
        if not benign:
            raise
    except ValueError:
        # no coordinator given and none auto-detected from the environment:
        # a plain single-process run — the documented no-op case
        if coordinator_address is not None:
            raise


def global_chain_mesh() -> Mesh:
    """A 1-D mesh over every addressable device of every process."""
    return Mesh(np.asarray(jax.devices()), (CHAIN_AXIS,))


def run_chains_multihost(key, ld, n_chains_per_device: int, n_samples: int,
                         **kwargs):
    """Convenience wrapper: chains sharded over the global mesh, with
    ``n_chains_per_device`` chains on every chip in the job."""
    mesh = global_chain_mesh()
    n_chains = n_chains_per_device * mesh.devices.size
    return run_chains(key, ld, n_chains, n_samples, mesh=mesh, **kwargs)
