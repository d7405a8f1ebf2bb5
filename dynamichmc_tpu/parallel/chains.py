"""Batched chains: vmap on one chip, shard_map over a TPU mesh.

This is the TPU-native capability the reference delegates to the user
("The specifics of running multiple chains is up to the user",
/root/reference/docs/src/worked_example.md:97, threaded ``tcollect`` in its
tests): here it is first-class. The single-chain runner (warmup fold +
sampling, mcmc.py) is vmapped over a chains axis — per-chain positions,
metrics, stepsizes, divergences and terminations are fully independent — and
optionally shard_mapped over a ``jax.sharding.Mesh`` so chain batches ride
separate devices with **zero collectives in the hot loop** (independent
chains). Collectives appear only when cross-chain pooled metric adaptation is
requested (one pmean per tuning block, over ICI).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import DynamicHMCError
from ..hamiltonian import evaluate
from ..logdensity import LogDensity
from ..mcmc import MCMCResult, _check_stepsize_search, make_runner
from ..metric import Metric, identity_metric
from ..nuts import NUTS
from ..warmup import WarmupStage, WarmupState, default_warmup_stages, random_position

CHAIN_AXIS = "chains"
LOCAL_CHAIN_AXIS = "chains_local"


def chain_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D device mesh over the chains axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CHAIN_AXIS,))


def init_chain_states(
    key: jax.Array,
    ld: LogDensity,
    n_chains: int,
    q: Optional[jnp.ndarray] = None,
    metric: Optional[Metric] = None,
    eps=None,
    dtype=jnp.float32,
) -> WarmupState:
    """Batched initial warmup states: per-chain random positions in [-2, 2]^K
    (mcmc.jl:108), identity metric, optional shared eps.

    Performs the strict initial-point validation (mcmc.jl:131) host-side over
    the whole batch and raises ``DynamicHMCError`` naming the bad chains.
    """
    if q is None:
        keys = jax.random.split(key, n_chains)
        q = jax.vmap(lambda k: random_position(k, ld.dim, dtype))(keys)
    q = jnp.asarray(q, dtype)
    if q.shape != (n_chains, ld.dim):
        raise ValueError(f"q must have shape {(n_chains, ld.dim)}, got {q.shape}")
    Q = jax.jit(jax.vmap(lambda qq: evaluate(ld, qq)))(q)
    lds = np.asarray(Q.logdensity)
    bad = np.nonzero(~np.isfinite(lds))[0]
    if bad.size:
        raise DynamicHMCError(
            "Invalid log posterior at initial positions.",
            chains=bad.tolist(),
            logdensities=lds[bad].tolist(),
        )
    if metric is None:
        metric = identity_metric(ld.dim, dtype=dtype)
    # broadcast the metric (and eps) per chain so every chain adapts its own
    metric = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_chains,) + x.shape), metric
    )
    if eps is not None:
        eps = jnp.broadcast_to(jnp.asarray(eps, dtype), (n_chains,))
    return WarmupState(Q=Q, metric=metric, eps=eps)


def run_chains(
    key: jax.Array,
    ld: LogDensity,
    n_chains: int,
    n_samples: int,
    initialization: dict = {},
    warmup_stages: Optional[Tuple[WarmupStage, ...]] = None,
    algorithm: NUTS = NUTS(),
    dtype=jnp.float32,
    mesh: Optional[Mesh] = None,
    donate_state: bool = False,
) -> MCMCResult:
    """Run ``n_chains`` independently-warmed NUTS chains, batched on device.

    Without ``mesh``: one chip, chains vmapped. With ``mesh``: the chain axis
    is sharded over the mesh's '{CHAIN_AXIS}' axis via shard_map; n_chains
    must be divisible by the mesh size.

    Returns a batched :class:`MCMCResult` with ``positions`` of shape
    (n_chains, n_samples, K).
    """
    if warmup_stages is None:
        warmup_stages = default_warmup_stages()
    init_key, run_key = jax.random.split(jnp.asarray(key))
    states = init_chain_states(init_key, ld, n_chains, dtype=dtype, **initialization)
    chain_keys = jax.random.split(run_key, n_chains)

    lean = dict(
        collect_warmup_positions=False,
        collect_warmup_stats=False,
        keep_warmup_states=False,
    )

    if mesh is None:
        single = make_runner(
            ld,
            algorithm,
            tuple(warmup_stages),
            n_samples,
            chain_axis=(CHAIN_AXIS,),
            **lean,
        )
        fn = jax.jit(jax.vmap(single, axis_name=CHAIN_AXIS))
        history, final_states, inference = fn(chain_keys, states)
    else:
        n_dev = mesh.devices.size
        if n_chains % n_dev:
            raise ValueError(
                f"n_chains={n_chains} not divisible by mesh size {n_dev}"
            )
        single = make_runner(
            ld,
            algorithm,
            tuple(warmup_stages),
            n_samples,
            chain_axis=(LOCAL_CHAIN_AXIS, CHAIN_AXIS),
            **lean,
        )
        local = jax.vmap(single, axis_name=LOCAL_CHAIN_AXIS)
        # check_vma=False: the tree/search while_loop carries are initialized
        # from compile-time constants, which trips the varying-manual-axes
        # analysis; chains are independent so replication checking buys
        # nothing here.
        sharded = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(CHAIN_AXIS), P(CHAIN_AXIS)),
            out_specs=P(CHAIN_AXIS),
            check_vma=False,
        )
        fn = jax.jit(sharded)
        spec = NamedSharding(mesh, P(CHAIN_AXIS))
        chain_keys = jax.device_put(chain_keys, spec)
        states = jax.device_put(states, spec)
        history, final_states, inference = fn(chain_keys, states)

    _check_stepsize_search(
        [(None, results, None) for results, _st in history]
    )
    return MCMCResult(
        positions=inference.positions,
        logdensities=inference.logdensities,
        tree_statistics=inference.tree_statistics,
        metric=final_states.metric,
        eps=final_states.eps,
    )
