"""Checkpoint / resume for sampler state.

The reference has no serialization, but its architecture makes checkpointing
trivial: all sampler state is the immutable (Q, metric, eps) triple plus the
RNG (SURVEY.md §5). Here that is made explicit: any pytree of sampler state
(``WarmupState``, batched chain states, ``EvaluatedPoint``s, partial draws)
plus a key round-trips through orbax (TPU-native async-capable checkpointing)
with a plain-npz fallback. Combine with the stepwise API (mcmc.mcmc_steps) to
persist/resume between single transitions.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_STRUCTURE_FILE = "structure.pkl"
_ARRAYS_FILE = "arrays.npz"


def save_state(path: str, state: Any, key=None) -> None:
    """Persist a (state pytree, rng key) checkpoint to ``path`` (a directory).

    Uses numpy + pickled treedef: dependency-free, works for any registered
    pytree (all dynamichmc_tpu state objects are).
    """
    os.makedirs(path, exist_ok=True)
    payload = {"state": state, "key": key}
    leaves, treedef = jax.tree_util.tree_flatten(payload)
    np.savez(
        os.path.join(path, _ARRAYS_FILE),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )
    with open(os.path.join(path, _STRUCTURE_FILE), "wb") as fh:
        pickle.dump(treedef, fh)


def load_state(path: str) -> Tuple[Any, Any]:
    """Restore (state, key) saved by :func:`save_state`.

    Refuses to silently downcast: a checkpoint holding 64-bit leaves (a CPU
    x64 run) loaded in a process with x64 disabled would truncate positions,
    eps, and Welford accumulators to f32 — corrupted resume, no error.
    """
    with open(os.path.join(path, _STRUCTURE_FILE), "rb") as fh:
        treedef = pickle.load(fh)
    data = np.load(os.path.join(path, _ARRAYS_FILE))
    raw = [data[f"leaf_{i}"] for i in range(len(data.files))]
    if not jax.config.jax_enable_x64 and any(
        r.dtype in (np.float64, np.int64) for r in raw
    ):
        raise ValueError(
            "checkpoint contains 64-bit arrays but jax_enable_x64 is off; "
            "enable x64 (jax.config.update('jax_enable_x64', True)) before "
            "loading, or re-save the checkpoint at 32-bit"
        )
    leaves = [jnp.asarray(r) for r in raw]
    payload = jax.tree_util.tree_unflatten(treedef, leaves)
    return payload["state"], payload["key"]


def save_state_orbax(path: str, state: Any, key=None) -> None:
    """Orbax variant (async-capable, multi-host-aware) for large fleets."""
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.abspath(path), {"state": state, "key": key}, force=True)


def load_state_orbax(path: str, like: Any = None) -> Tuple[Any, Any]:
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    restore_args = None
    if like is not None:
        restore_args = {"state": like[0], "key": like[1]}
    out = ckpt.restore(os.path.abspath(path), item=restore_args)
    return out["state"], out["key"]
