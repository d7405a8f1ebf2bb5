"""Sampling drivers and the top-level user API.

TPU re-design of /root/reference/src/mcmc.jl (L4/L5): post-warmup sampling is a
``lax.scan`` over the pure transition ``sample_tree``; the public entry points
``mcmc_with_warmup`` / ``mcmc_keep_warmup`` mirror mcmc.jl:521-584, and the
stepwise ``mcmc_steps``/``mcmc_next_step`` API (mcmc.jl:295-351) is a jitted
``(key, Q) -> (Q', stats)`` closure — which is also the checkpointable unit:
all sampler state is the (Q, metric, eps) pytree plus the RNG key.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .errors import DynamicHMCError
from .hamiltonian import EvaluatedPoint
from .logdensity import LogDensity
from .metric import Metric
from .nuts import NUTS, TreeStatistics, sample_tree
from .utils.pytree import pytree_dataclass
from .warmup import (
    WarmupStage,
    WarmupState,
    default_warmup_stages,
    initialize_warmup_state,
    run_warmup,
)


@pytree_dataclass
class InferenceResult:
    """Draws + per-draw diagnostics. ``positions`` is (N, K) — TPU-friendly
    scan-stacked layout; ``posterior_matrix`` gives the reference's
    [parameter, draw] orientation (mcmc.jl:16-17)."""

    positions: jnp.ndarray  # (N, K) or (chains, N, K)
    logdensities: jnp.ndarray  # (N,) or (chains, N)
    tree_statistics: TreeStatistics  # arrays of shape (N,) / (chains, N)

    @property
    def posterior_matrix(self):
        return jnp.swapaxes(self.positions, -1, -2)


@pytree_dataclass
class MCMCResult:
    """Return value of ``mcmc_with_warmup`` (mcmc.jl:575-584): inference draws
    plus the adapted metric and stepsize."""

    positions: jnp.ndarray
    logdensities: jnp.ndarray
    tree_statistics: TreeStatistics
    metric: Metric
    eps: jnp.ndarray

    @property
    def posterior_matrix(self):
        return jnp.swapaxes(self.positions, -1, -2)

    def summary(self) -> str:
        """Human-readable diagnostics: tree-statistics summary plus, for
        multi-chain results, per-parameter R-hat / ESS extremes."""
        from .diagnostics import summarize_tree_statistics

        parts = [str(summarize_tree_statistics(self.tree_statistics))]
        positions = np.asarray(self.positions)
        if positions.ndim == 3 and positions.shape[0] > 1:
            from .stats import ess_rhat

            st = ess_rhat(positions)
            parts.append(
                f"  R-hat max: {st['rhat'].max():.4f}; bulk ESS min: "
                f"{st['ess_bulk'].min():.0f}; tail ESS min: "
                f"{st['ess_tail'].min():.0f}"
            )
        return "\n".join(parts)


def mcmc(
    key: jax.Array,
    ld: LogDensity,
    algorithm: NUTS,
    state: WarmupState,
    n_samples: int,
    reporter=None,
) -> Tuple[EvaluatedPoint, InferenceResult]:
    """Post-warmup sampling loop (mcmc.jl:366-381) as a ``lax.scan``."""
    stage_reporter = None
    if reporter is not None and reporter.wants_step_callbacks:
        stage_reporter = reporter.make_stage_reporter(
            n_samples, currently_warmup=False
        )

    def step(Q, inp):
        step_key, step_i = inp
        Q_new, stats = sample_tree(
            step_key, algorithm, ld, state.metric, Q, state.eps
        )
        if stage_reporter is not None:
            jax.debug.callback(
                lambda i: stage_reporter.report_step(int(i)), step_i, ordered=False
            )
        return Q_new, (Q_new.q, Q_new.logdensity, stats)

    keys = jax.random.split(key, n_samples)
    Q_final, (qs, lds, stats) = jax.lax.scan(
        step, state.Q, (keys, jnp.arange(n_samples))
    )
    return Q_final, InferenceResult(
        positions=qs, logdensities=lds, tree_statistics=stats
    )


def make_runner(
    ld: LogDensity,
    algorithm: NUTS,
    stages: Tuple[WarmupStage, ...],
    n_samples: int,
    collect_warmup_positions: bool = False,
    collect_warmup_stats: bool = True,
    keep_warmup_states: bool = True,
    chain_axis=None,
    reporter=None,
):
    """Pure (warmup fold + sampling) runner ``(key, state) -> (history,
    final_state, inference)`` for one chain. The building block that
    ``mcmc_with_warmup`` jits and ``parallel.run_chains`` vmaps/shards.

    For large chain batches set ``collect_warmup_stats=False`` and
    ``keep_warmup_states=False`` to keep only the stepsize-search results
    (needed for the host-side failure check) — warmup then carries O(K^2)
    state instead of O(N_warmup) history per chain.
    """

    def run(key, state: WarmupState):
        warmup_key, sample_key = jax.random.split(key)
        history, state = run_warmup(
            warmup_key,
            ld,
            algorithm,
            stages,
            state,
            collect_positions=collect_warmup_positions,
            collect_stats=collect_warmup_stats,
            chain_axis=chain_axis,
            reporter=reporter,
        )
        # Strip the static stage objects: jit outputs must be pure pytrees of
        # arrays; the caller re-attaches stages.
        traced_history = [
            (results, st if keep_warmup_states else None)
            for _stage, results, st in history
        ]
        _, inference = mcmc(
            sample_key, ld, algorithm, state, n_samples, reporter=reporter
        )
        return traced_history, state, inference

    return run


@functools.lru_cache(maxsize=64)
def _fast_single_programs(ld: LogDensity, algorithm: NUTS, schedule, sample_chunk=32):
    """Single-chain fast-engine program bundle (plain jit, no vmap)."""
    from .engine import build_programs

    def wrap(fn, kind):
        return jax.jit(fn)

    return build_programs(
        ld, algorithm, schedule, None, wrap, sample_chunk=sample_chunk
    )


@functools.lru_cache(maxsize=64)
def _build_run(
    ld: LogDensity,
    algorithm: NUTS,
    stages: Tuple[WarmupStage, ...],
    n_samples: int,
    collect_warmup_positions: bool,
    chain_axis: Optional[str],
):
    """Compile-once single-chain runner."""
    return jax.jit(
        make_runner(
            ld,
            algorithm,
            stages,
            n_samples,
            collect_warmup_positions=collect_warmup_positions,
            chain_axis=chain_axis,
        )
    )


def mcmc_keep_warmup(
    key: jax.Array,
    ld: LogDensity,
    n_samples: int,
    initialization: dict = {},
    warmup_stages: Optional[Tuple[WarmupStage, ...]] = None,
    algorithm: NUTS = NUTS(),
    dtype=jnp.float32,
    collect_warmup_positions: bool = True,
    reporter=None,
):
    """Warmup + sampling, returning every intermediate warmup state
    (mcmc.jl:521-532).

    Returns a dict with ``initial_warmup_state``, ``warmup`` (list of
    (stage, results, state-after) triples), ``final_warmup_state`` and
    ``inference``.
    """
    if warmup_stages is None:
        warmup_stages = default_warmup_stages()
    init_key, run_key = jax.random.split(jnp.asarray(key))
    initial_state = initialize_warmup_state(
        init_key, ld, dtype=dtype, **initialization
    )
    if reporter is None:
        run = _build_run(
            ld,
            algorithm,
            tuple(warmup_stages),
            n_samples,
            collect_warmup_positions,
            None,
        )
    else:
        # Reporters are stateful host objects: bypass the compile cache.
        run = jax.jit(
            make_runner(
                ld,
                algorithm,
                tuple(warmup_stages),
                n_samples,
                collect_warmup_positions=collect_warmup_positions,
                reporter=reporter,
            )
        )
    traced_history, final_state, inference = run(run_key, initial_state)
    history = [
        (stage, results, st)
        for stage, (results, st) in zip(warmup_stages, traced_history)
    ]
    _check_stepsize_search(history)
    return {
        "initial_warmup_state": initial_state,
        "warmup": history,
        "final_warmup_state": final_state,
        "inference": inference,
    }


def _check_stepsize_search(history):
    """Host-side check replacing the reference's throw on a failed bracketing
    search (stepsize.jl:56-59)."""
    for _stage, results, _state in history:
        if isinstance(results, dict) and "success" in results:
            success = np.asarray(results["success"])
            if not np.all(success):
                raise DynamicHMCError(
                    "Initial stepsize search reached maximum number of "
                    "iterations without crossing.",
                    eps=np.asarray(results["eps"]),
                    failed_fraction=float(1 - success.mean()),
                )


def mcmc_with_warmup(
    key: jax.Array,
    ld: LogDensity,
    n_samples: int,
    initialization: dict = {},
    warmup_stages: Optional[Tuple[WarmupStage, ...]] = None,
    algorithm: NUTS = NUTS(),
    dtype=jnp.float32,
    reporter=None,
) -> MCMCResult:
    """NUTS with warmup (mcmc.jl:575-584): returns draws, per-draw tree
    statistics, log densities, and the adapted metric + stepsize.

    When the stage tuple is expressible as a normalized schedule (the default
    and fixed-stepsize schedules are) and no step-callback reporter is set,
    runs through the fast engine: one tree-program compilation for the whole
    warmup, chunked into watchdog-safe dispatches.
    """
    from .engine import WarmupSchedule, execute

    stages = tuple(warmup_stages) if warmup_stages is not None else default_warmup_stages()
    schedule = WarmupSchedule.from_stages(stages)
    if schedule is not None and reporter is None:
        init_key, run_key = jax.random.split(jnp.asarray(key))
        state = initialize_warmup_state(init_key, ld, dtype=dtype, **initialization)
        programs = _fast_single_programs(ld, algorithm, schedule)
        key_fold = lambda i: jax.random.fold_in(run_key, i)  # noqa: E731
        metric, eps, search_results, _summaries, inference = execute(
            programs, schedule, key_fold, state.Q, state.metric, state.eps,
            n_samples,
        )
        if search_results is not None:
            _check_stepsize_search([(None, search_results, None)])
        _q_final, positions, logdensities, stats = inference
        return MCMCResult(
            positions=positions,
            logdensities=logdensities,
            tree_statistics=stats,
            metric=metric,
            eps=eps,
        )

    out = mcmc_keep_warmup(
        key,
        ld,
        n_samples,
        initialization=initialization,
        warmup_stages=warmup_stages,
        algorithm=algorithm,
        dtype=dtype,
        collect_warmup_positions=False,
        reporter=reporter,
    )
    inference = out["inference"]
    final = out["final_warmup_state"]
    return MCMCResult(
        positions=inference.positions,
        logdensities=inference.logdensities,
        tree_statistics=inference.tree_statistics,
        metric=final.metric,
        eps=final.eps,
    )


# --- stepwise API ---------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MCMCSteps:
    """Stepwise sampling handle (mcmc.jl:295-341): fixed algorithm, metric and
    stepsize; each ``next_step(key, Q)`` is one transition."""

    ld: LogDensity
    algorithm: NUTS
    metric: Metric
    eps: Any

    def next_step(self, key, Q: EvaluatedPoint):
        """One transition (mcmc.jl:348-351)."""
        return self._jitted(key, Q)

    @functools.cached_property
    def _jitted(self):
        def step(key, Q):
            return sample_tree(key, self.algorithm, self.ld, self.metric, Q, self.eps)

        return jax.jit(step)


def mcmc_steps(
    ld: LogDensity, algorithm: NUTS, metric: Metric, eps
) -> MCMCSteps:
    return MCMCSteps(ld=ld, algorithm=algorithm, metric=metric, eps=eps)


def mcmc_steps_from_state(ld: LogDensity, algorithm: NUTS, state: WarmupState):
    return MCMCSteps(ld=ld, algorithm=algorithm, metric=state.metric, eps=state.eps)


# --- multi-chain result reshapers (mcmc.jl:602-617) -----------------------------


def stack_posterior_matrices(results) -> jnp.ndarray:
    """[draw, chain, parameter] stack for cross-chain diagnostics
    (mcmc.jl:602-604). Accepts a list of results or a batched result whose
    ``positions`` is (chains, N, K)."""
    if isinstance(results, (list, tuple)):
        positions = jnp.stack([r.positions for r in results])  # (C, N, K)
    else:
        positions = results.positions
    return jnp.swapaxes(positions, 0, 1)  # (N, C, K)


def pool_posterior_matrices(results) -> jnp.ndarray:
    """[parameter, pooled_draw] pooling (mcmc.jl:615-617)."""
    if isinstance(results, (list, tuple)):
        positions = jnp.stack([r.positions for r in results])
    else:
        positions = results.positions
    c, n, k = positions.shape
    return positions.reshape(c * n, k).T
