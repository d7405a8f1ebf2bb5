"""Staged warmup: stepsize search, dual-averaging tuning blocks, metric
re-estimation.

TPU re-design of the warmup architecture in /root/reference/src/mcmc.jl:27-457:
``WarmupState`` is folded through a (static) tuple of stages; each ``TuningNUTS``
block is a ``lax.scan`` of NUTS transitions with the dual-averaging state in the
carry, and the metric is re-estimated from *streaming Welford moments* instead
of stored draws (mcmc.jl:209-211,262-286) — O(K)/O(K^2) memory per chain.

Cross-chain metric pooling (a TPU-native addition; the reference adapts each
chain independently): when warmup runs under ``vmap``/``shard_map`` with a
named chain axis, Welford moments can be combined across chains with one
collective per tuning block — zero collectives inside the transition loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .errors import DynamicHMCError
from .hamiltonian import EvaluatedPoint, PhasePoint, evaluate_strict
from .logdensity import LogDensity
from .metric import (
    Metric,
    dense_metric,
    diagonal_metric,
    identity_metric,
    metric_dim,
    rand_p,
)
from .nuts import NUTS, sample_tree
from .stepsize import (
    DualAveraging,
    FixedStepsize,
    InitialStepsizeSearch,
    PooledStepsize,
    find_initial_stepsize,
    local_log_acceptance_ratio,
)
from .utils.pytree import pytree_dataclass
from .utils.welford import (
    WelfordState,
    pool_welford_over_axis,
    welford_covariance,
    welford_init,
    welford_update,
    welford_variance,
)


@pytree_dataclass
class WarmupState:
    """(Q, metric, eps) — the reference's WarmupState (mcmc.jl:72-79).

    ``eps`` is ``None`` before any stepsize has been chosen.
    """

    Q: EvaluatedPoint
    metric: Metric
    eps: Optional[jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class TuningNUTS:
    """Tune stepsize every transition and (optionally) the metric at the end
    of the block (mcmc.jl:178-195).

    metric_kind: 'none' (stepsize only), 'diagonal', or 'dense'.
    lam: shrinkage factor; dense estimates are regularized as
         (1 - lam) * Sigma + lam * diag(Sigma) (mcmc.jl:218-223).
         Default 5/N. Diagonal estimates are not regularized.
    pooled: combine Welford moments across the named chain axis (if any)
         before re-estimating the metric — TPU-native cross-chain adaptation.
    """

    N: int
    metric_kind: str = "none"
    stepsize_adaptation: Union[DualAveraging, FixedStepsize] = DualAveraging()
    lam: Optional[float] = None
    pooled: bool = False

    def __post_init__(self):
        if self.N < 20:
            raise ValueError("N must be >= 20 (variance estimation)")
        if self.metric_kind not in ("none", "diagonal", "dense"):
            raise ValueError("metric_kind must be 'none', 'diagonal' or 'dense'")
        if self.lam is not None and self.lam < 0:
            raise ValueError("lam must be >= 0")

    @property
    def shrinkage(self) -> float:
        return 5.0 / self.N if self.lam is None else self.lam


WarmupStage = Union[None, InitialStepsizeSearch, TuningNUTS]


def default_warmup_stages(
    stepsize_search: Optional[InitialStepsizeSearch] = InitialStepsizeSearch(),
    metric_kind: str = "diagonal",
    stepsize_adaptation: DualAveraging = DualAveraging(),
    init_steps: int = 75,
    middle_steps: int = 25,
    doubling_stages: int = 5,
    terminating_steps: int = 50,
    pooled: bool = False,
    pooled_stepsize: bool = False,
) -> Tuple[WarmupStage, ...]:
    """The Stan-like windowed schedule (mcmc.jl:415-425): stepsize search,
    75 eps-only steps, 25/50/100/200/400 eps+metric blocks, 50 eps-only steps.

    ``pooled`` shares the adapted METRIC across chains (one collective per
    block); ``pooled_stepsize`` additionally shares the dual-averaged
    stepsize, driven by the batch-mean acceptance (see
    :class:`~dynamichmc_tpu.stepsize.PooledStepsize`) — both are TPU-native
    cross-chain additions; the reference adapts each chain separately.
    """
    if pooled_stepsize:
        from .stepsize import PooledStepsize

        stepsize_adaptation = PooledStepsize(stepsize_adaptation)
    middle = tuple(
        TuningNUTS(
            N=middle_steps * 2**i,
            metric_kind=metric_kind,
            stepsize_adaptation=stepsize_adaptation,
            pooled=pooled,
        )
        for i in range(doubling_stages)
    )
    return (
        stepsize_search,
        TuningNUTS(N=init_steps, stepsize_adaptation=stepsize_adaptation),
        *middle,
        TuningNUTS(N=terminating_steps, stepsize_adaptation=stepsize_adaptation),
    )


def fixed_stepsize_warmup_stages(
    metric_kind: str = "diagonal",
    middle_steps: int = 25,
    doubling_stages: int = 5,
    pooled: bool = False,
) -> Tuple[WarmupStage, ...]:
    """Covariance-only tuning at fixed stepsize (mcmc.jl:436-440)."""
    return tuple(
        TuningNUTS(
            N=middle_steps * 2**i,
            metric_kind=metric_kind,
            stepsize_adaptation=FixedStepsize(),
            pooled=pooled,
        )
        for i in range(doubling_stages)
    )


def random_position(key: jax.Array, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform [-2, 2]^K initial position (mcmc.jl:108)."""
    return jax.random.uniform(key, (dim,), dtype, -2.0, 2.0)


def initialize_warmup_state(
    key: jax.Array,
    ld: LogDensity,
    q: Optional[jnp.ndarray] = None,
    metric: Optional[Metric] = None,
    eps=None,
    dtype=jnp.float32,
    strict: bool = True,
) -> WarmupState:
    """mcmc.jl:129-132: default random position, identity metric, no eps.

    ``strict=True`` evaluates the initial point eagerly and raises
    ``DynamicHMCError`` on non-finite results (mcmc.jl:131).
    """
    if q is None:
        q = random_position(key, ld.dim, dtype)
    q = jnp.asarray(q, dtype)
    if metric is None:
        metric = identity_metric(ld.dim, dtype=q.dtype)
    if strict:
        Q = evaluate_strict(ld, q)
    else:
        from .hamiltonian import evaluate

        Q = evaluate(ld, q)
    eps = None if eps is None else jnp.asarray(eps, q.dtype)
    return WarmupState(Q=Q, metric=metric, eps=eps)


# --- metric estimation ----------------------------------------------------------


# (the named-axis Welford combine lives in utils.welford and is shared with
# the engine's per-device mesh pooling)


def estimate_metric(
    welford: WelfordState, kind: str, shrinkage: float, chain_axis: Optional[str]
) -> Metric:
    """Re-estimate the kinetic energy from accumulated moments
    (sample_M^-1 + regularize_M^-1, mcmc.jl:209-223)."""
    if chain_axis is not None:
        welford = pool_welford_over_axis(welford, chain_axis)
    if kind == "diagonal":
        return diagonal_metric(welford_variance(welford))
    if kind == "dense":
        cov = welford_covariance(welford)
        lam = shrinkage
        reg = (1 - lam) * cov + lam * jnp.diag(jnp.diag(cov))
        return dense_metric(reg)
    raise ValueError(kind)


# --- stage execution ------------------------------------------------------------


def warmup_stage(
    key: jax.Array,
    ld: LogDensity,
    algorithm: NUTS,
    stage: WarmupStage,
    state: WarmupState,
    collect_positions: bool = False,
    collect_stats: bool = True,
    chain_axis=None,
    reporter=None,
):
    """Run one warmup stage; returns (results, new_state).

    Jit-compatible (the stage object and flags are static). Results is None
    for a no-op stage, a dict otherwise. ``reporter`` (see reporting.py)
    enables per-transition host callbacks — single-chain interactive use only.
    """
    if stage is None:
        return None, state  # mcmc.jl:99-101

    if isinstance(stage, InitialStepsizeSearch):
        if state.eps is not None:
            raise DynamicHMCError(
                "stepsize eps manually specified, won't perform initial search"
            )
        p = rand_p(key, state.metric, dtype=state.Q.q.dtype)
        z = PhasePoint(Q=state.Q, p=p)
        A, l0 = local_log_acceptance_ratio(ld, state.metric, z)
        eps, success = find_initial_stepsize(stage, A, dtype=state.Q.q.dtype)
        if reporter is not None:
            jax.debug.callback(
                lambda e: reporter.report_message(
                    "found initial stepsize", eps=float(e)
                ),
                eps,
                ordered=False,
            )
        results = {"eps": eps, "success": success, "l0": l0}
        return results, WarmupState(Q=state.Q, metric=state.metric, eps=eps)

    assert isinstance(stage, TuningNUTS)
    if state.eps is None:
        raise DynamicHMCError("no stepsize: run a stepsize search stage first")
    adaptation = stage.stepsize_adaptation
    if isinstance(adaptation, PooledStepsize) and chain_axis is not None:
        # under the vmapped fallback each lane sees a scalar acceptance, so
        # pooling must go through the bound vmap axis — otherwise the
        # "shared" eps silently adapts per-chain
        adaptation = dataclasses.replace(adaptation, axis_name=chain_axis)
    da_state = adaptation.init(state.eps)
    dim = metric_dim(state.metric)
    use_welford = stage.metric_kind != "none"
    welford = welford_init(
        dim, dense=stage.metric_kind == "dense", dtype=state.Q.q.dtype
    )

    stage_reporter = None
    if reporter is not None and reporter.wants_step_callbacks:
        tuning = (
            "stepsize"
            if stage.metric_kind == "none"
            else f"stepsize and {stage.metric_kind} metric"
        )
        stage_reporter = reporter.make_stage_reporter(
            stage.N, currently_warmup=True, tuning=tuning
        )

    def step(carry, inp):
        step_key, step_i = inp
        Q, da, wf = carry
        eps = adaptation.current(da)
        Q_new, stats = sample_tree(step_key, algorithm, ld, state.metric, Q, eps)
        da = adaptation.update(da, stats.acceptance_rate)
        if use_welford:
            wf = welford_update(wf, Q_new.q)
        if stage_reporter is not None:
            jax.debug.callback(
                lambda i, e: stage_reporter.report_step(int(i), eps=float(e)),
                step_i,
                eps,
                ordered=False,
            )
        out = {}
        if collect_stats:
            out = {
                "logdensities": Q_new.logdensity,
                "tree_statistics": stats,
                "epss": eps,
            }
        if collect_positions:
            out["positions"] = Q_new.q
        return (Q_new, da, wf), out

    keys = jax.random.split(key, stage.N)
    (Q, da_state, welford), results = jax.lax.scan(
        step, (state.Q, da_state, welford), (keys, jnp.arange(stage.N))
    )

    if use_welford:
        metric = estimate_metric(
            welford,
            stage.metric_kind,
            stage.shrinkage,
            chain_axis if stage.pooled else None,
        )
    else:
        metric = state.metric

    new_state = WarmupState(Q=Q, metric=metric, eps=adaptation.final(da_state))
    return results, new_state


def run_warmup(
    key: jax.Array,
    ld: LogDensity,
    algorithm: NUTS,
    stages: Tuple[WarmupStage, ...],
    state: WarmupState,
    collect_positions: bool = False,
    collect_stats: bool = True,
    chain_axis=None,
    reporter=None,
):
    """Left-fold of warmup stages (mcmc.jl:450-457). Returns
    (list of (stage, results, state-after), final state)."""
    history = []
    for i, stage in enumerate(stages):
        stage_key = jax.random.fold_in(key, i)
        results, state = warmup_stage(
            stage_key,
            ld,
            algorithm,
            stage,
            state,
            collect_positions=collect_positions,
            collect_stats=collect_stats,
            chain_axis=chain_axis,
            reporter=reporter,
        )
        history.append((stage, results, state))
    return history, state
