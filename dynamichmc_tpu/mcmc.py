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
def _fast_keep_programs(ld: LogDensity, algorithm: NUTS, schedule,
                        chunk: int = 16, sample_chunk: int = 32):
    """Program bundle for the fast (watchdog-safe) keep-warmup path: the
    shared search/metric/sampling programs plus ONE collecting stage program
    (fixed chunk, masked past-end steps)."""
    from .engine import build_programs, make_collecting_stage_driver

    def wrap(fn, kind):
        return jax.jit(fn)

    programs = build_programs(
        ld, algorithm, schedule, None, wrap, sample_chunk=sample_chunk
    )
    collect = jax.jit(
        make_collecting_stage_driver(ld, algorithm, schedule.adaptation, chunk)
    )
    return programs, collect, chunk


@functools.partial(jax.jit, static_argnames="n")
def _concat_trim(pieces, n: int):
    """Assemble dispatch chunks in ONE jitted program. Host-side eager
    per-leaf concatenates are ~0.1-0.3 s tunnel RPCs apiece (the round-2
    seam lesson: ~25 eager concats cost 4.7 s vs 0.04 s jitted)."""
    return jax.tree_util.tree_map(
        lambda *xs: (jnp.concatenate(xs) if len(xs) > 1 else xs[0])[:n],
        *pieces,
    )


def _mcmc_keep_warmup_fast(
    run_key, ld, n_samples, initial_state, warmup_stages, schedule, algorithm,
    collect_warmup_positions: bool,
    log=None,
    step_reporter=None,
):
    """Keep-warmup through the fast engine: one collecting tree program for
    all stages (runtime trip count + masking), dispatched in watchdog-safe
    chunks — compiles in seconds where the scan-based path inlines one tree
    program per stage, and never exceeds the TPU single-dispatch budget.
    ``log`` (``stage_log(reporter)``) emits stage-boundary progress.

    ``step_reporter``: a step-callback reporter (LogProgressReport /
    TqdmProgressReport) replayed at DISPATCH boundaries — each chunk
    completion issues one ``report_step`` with the last finished step, so
    throttled progress lines / tqdm bars advance with correct steps/sec and
    ETA arithmetic (reporting.jl:118-136 semantics at chunk granularity;
    steps physically complete in chunks on this backend, so finer callbacks
    could only lie about timing)."""
    from .engine import _retry_dispatch, promote_metric, welford_zero
    from .stepsize import InitialStepsizeSearch
    from .warmup import WarmupState

    programs, collect, chunk = _fast_keep_programs(ld, algorithm, schedule)
    adaptation = schedule.adaptation

    def key_fold(i):
        return jax.random.fold_in(run_key, i)

    def strong(tree):
        return jax.tree_util.tree_map(lambda x: x.astype(x.dtype), tree)

    Q = initial_state.Q
    # canonicalize a diagonal initial metric to the dense representation up
    # front (numerically a no-op): the first dense re-estimate otherwise
    # flips the metric operand's pytree type and retraces the collecting
    # program mid-run — a multi-minute compile on the tunneled chip
    metric = promote_metric(initial_state.metric, schedule.metric_kind)
    eps = initial_state.eps

    search_results = None
    if schedule.search is not None:
        if eps is not None:
            raise DynamicHMCError(
                "stepsize eps manually specified, won't perform initial search"
            )
        eps, success, l0 = programs.search(key_fold(0), Q, metric)
        search_results = {"eps": eps, "success": success, "l0": l0}
        # fail fast: this is the interactive inspection path, so the host
        # sync is cheap relative to running a whole warmup at a garbage eps
        _check_stepsize_search([(None, search_results, None)])
        if log is not None:
            # reference parity message (mcmc.jl via stepsize search logging)
            log(f"found initial stepsize eps={float(np.asarray(eps)):.4g}")
    elif eps is None:
        raise DynamicHMCError("no stepsize: provide eps or a search stage")
    eps = strong(eps)
    eps_after_search = eps

    block_results = []
    for i, n in enumerate(schedule.block_sizes):
        if log is not None:
            log(f"warmup block {i + 1}/{len(schedule.block_sizes)} "
                f"({n} steps)")
        stage_rep = (
            step_reporter.make_stage_reporter(n, currently_warmup=True)
            if step_reporter is not None else None
        )
        stage_key = key_fold(i + 1)
        da = strong(adaptation.init(eps))
        wf = welford_zero(Q, programs.dense_welford)
        pieces = []
        for start in range(0, n, chunk):
            def run_collect(Q_in=Q, da_in=da, wf_in=wf, start_in=start):
                out = collect(
                    stage_key, Q_in, metric, da_in, wf_in,
                    jnp.int32(start_in), jnp.int32(n),
                )
                jax.block_until_ready(out[1])
                return out

            Q, da, wf, ys = _retry_dispatch(
                run_collect, log=log, what="keep-warmup dispatch"
            )
            if stage_rep is not None:
                stage_rep.report_step(min(start + chunk, n) - 1)
            if not collect_warmup_positions:
                # don't ship positions through the assembly just to drop them
                ys = {k: v for k, v in ys.items() if k != "positions"}
            pieces.append(ys)
        ys = _concat_trim(tuple(pieces), n)
        eps = adaptation.final(da)
        if schedule.update_metric[i]:
            metric = programs.metric_updates[schedule.shrinkages[i]](wf)
        results = {
            "logdensities": ys["logdensities"],
            "tree_statistics": ys["tree_statistics"],
            "epss": ys["epss"],
        }
        if collect_warmup_positions:
            results["positions"] = ys["positions"]
        block_results.append(
            (results, WarmupState(Q=Q, metric=metric, eps=eps))
        )

    # align history with the ORIGINAL stage tuple (None stages are no-ops,
    # the search precedes the tuning blocks; mcmc.jl:450-457)
    history = []
    blocks = iter(block_results)
    state_now = WarmupState(Q=initial_state.Q, metric=initial_state.metric,
                            eps=initial_state.eps)
    for stage in warmup_stages:
        if stage is None:
            history.append((None, None, state_now))
        elif isinstance(stage, InitialStepsizeSearch):
            state_now = WarmupState(
                Q=initial_state.Q, metric=initial_state.metric,
                eps=eps_after_search,
            )
            history.append((stage, search_results, state_now))
        else:
            results, state_now = next(blocks)
            history.append((stage, results, state_now))
    final_state = WarmupState(Q=Q, metric=metric, eps=eps)

    # sampling: fixed-size chunks (same key/fold convention as engine.execute)
    if log is not None:
        log(f"sampling {n_samples} draws")
    sample_rep = (
        step_reporter.make_stage_reporter(n_samples, currently_warmup=False)
        if step_reporter is not None and n_samples > 0 else None
    )
    sample_key = key_fold(len(schedule.block_sizes) + 1)
    n_chunks = -(-n_samples // programs.sample_chunk)
    pieces = []
    for c in range(n_chunks):
        def run_sample(Q_in=Q, c_in=c):
            out = programs.sample(
                sample_key, Q_in, metric, eps,
                jnp.int32(c_in * programs.sample_chunk),
            )
            jax.block_until_ready(out[2])
            return out

        Q, qs, lds, stats = _retry_dispatch(
            run_sample, log=log, what="keep-warmup sampling dispatch"
        )
        if sample_rep is not None:
            sample_rep.report_step(
                min((c + 1) * programs.sample_chunk, n_samples) - 1
            )
        pieces.append((qs, lds, stats))

    if n_chunks == 0:  # warmup-only inspection (n_samples == 0)
        _, qs_s, lds_s, stats_s = jax.eval_shape(
            programs.sample, sample_key, Q, metric, eps, jnp.int32(0)
        )

        def empty(s):
            return jnp.zeros((0,) + s.shape[1:], s.dtype)

        return history, final_state, InferenceResult(
            positions=empty(qs_s),
            logdensities=empty(lds_s),
            tree_statistics=jax.tree_util.tree_map(empty, stats_s),
        )

    qs, lds, stats = _concat_trim(tuple(pieces), n_samples)
    inference = InferenceResult(
        positions=qs, logdensities=lds, tree_statistics=stats
    )
    return history, final_state, inference


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
    inline_reporting: bool = False,
):
    """Warmup + sampling, returning every intermediate warmup state
    (mcmc.jl:521-532).

    Returns a dict with ``initial_warmup_state``, ``warmup`` (list of
    (stage, results, state-after) triples), ``final_warmup_state`` and
    ``inference``.

    Step-callback reporters (LogProgressReport / TqdmProgressReport) run on
    the fast engine by default, with ``report_step`` replayed at dispatch
    boundaries (steps physically complete in chunks on this backend).
    ``inline_reporting=True`` restores true per-step host callbacks via the
    scan path — exact reporting.jl:62-136 cadence, but it inlines one tree
    program per stage (minutes of XLA compile) and is watchdog-UNSAFE on
    the TPU; intended for CPU debugging only.
    """
    from .engine import WarmupSchedule
    from .reporting import NoProgressReport, default_reporter

    if warmup_stages is None:
        warmup_stages = default_warmup_stages()
    from .reporting import stage_log

    default_injected = reporter is None
    if default_injected:
        reporter = default_reporter()  # reporting.jl:184-190 via mcmc.jl:521-532
    init_key, run_key = jax.random.split(jnp.asarray(key))
    initial_state = initialize_warmup_state(
        init_key, ld, dtype=dtype, **initialization
    )
    schedule = WarmupSchedule.from_stages(tuple(warmup_stages))
    wants_steps = (not default_injected) and reporter.wants_step_callbacks
    if schedule is not None and not (inline_reporting and wants_steps):
        # fast engine with per-step history collection: TPU-safe (chunked
        # dispatches, one tree compilation for all stages); explicit
        # step-callback reporters get dispatch-boundary report_step replay
        history, final_state, inference = _mcmc_keep_warmup_fast(
            run_key, ld, n_samples, initial_state, tuple(warmup_stages),
            schedule, algorithm, collect_warmup_positions,
            log=stage_log(reporter),
            step_reporter=reporter if wants_steps else None,
        )
        _check_stepsize_search(history)
        return {
            "initial_warmup_state": initial_state,
            "warmup": history,
            "final_warmup_state": final_state,
            "inference": inference,
        }
    if isinstance(reporter, NoProgressReport):
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


def _to_local(x):
    """Fetch a possibly-globally-sharded array for host inspection: on a
    multi-process run, np.asarray on a non-addressable global jax.Array
    raises by design; the per-process shards suffice for a failure check."""
    shards = getattr(x, "addressable_shards", None)
    if shards is not None and not getattr(x, "is_fully_addressable", True):
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(x)


def _check_stepsize_search(history):
    """Host-side check replacing the reference's throw on a failed bracketing
    search (stepsize.jl:56-59)."""
    for _stage, results, _state in history:
        if isinstance(results, dict) and "l0" in results:
            # reference guard (stepsize.jl:77-79): a non-finite joint density
            # at the search's starting point must be named as such (not as a
            # generic bracketing failure) with a debug payload
            l0 = np.atleast_1d(_to_local(results["l0"]))
            bad = np.nonzero(~np.isfinite(l0))[0]
            if bad.size:
                raise DynamicHMCError(
                    "Starting point has non-finite density.",
                    chains=bad.tolist(),
                    logdensity=l0[bad].tolist(),
                )
        if isinstance(results, dict) and "success" in results:
            success = _to_local(results["success"])
            if not np.all(success):
                raise DynamicHMCError(
                    "Initial stepsize search reached maximum number of "
                    "iterations without crossing.",
                    eps=_to_local(results["eps"]),
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
    inline_reporting: bool = False,
) -> MCMCResult:
    """NUTS with warmup (mcmc.jl:575-584): returns draws, per-draw tree
    statistics, log densities, and the adapted metric + stepsize.

    When the stage tuple is expressible as a normalized schedule (the default
    and fixed-stepsize schedules are), runs through the fast engine: one
    tree-program compilation for the whole warmup, chunked into
    watchdog-safe dispatches. ``reporter=None`` means ``default_reporter()``
    (interactive sessions get stage-boundary progress logging,
    non-interactive are silent, reporting.jl:184-190). An explicit
    step-callback reporter also runs fast, with ``report_step`` replayed at
    dispatch boundaries; ``inline_reporting=True`` selects the scan-based
    path with true per-step host callbacks (CPU debugging only — inlines
    one tree program per stage and is watchdog-unsafe on the TPU).
    """
    from .engine import WarmupSchedule, execute
    from .reporting import default_reporter, stage_log

    default_injected = reporter is None
    if default_injected:
        reporter = default_reporter()

    stages = tuple(warmup_stages) if warmup_stages is not None else default_warmup_stages()
    schedule = WarmupSchedule.from_stages(stages)
    wants_steps = (not default_injected) and reporter.wants_step_callbacks
    if schedule is not None and not wants_steps:
        init_key, run_key = jax.random.split(jnp.asarray(key))
        state = initialize_warmup_state(init_key, ld, dtype=dtype, **initialization)
        programs = _fast_single_programs(ld, algorithm, schedule)
        key_fold = lambda i: jax.random.fold_in(run_key, i)  # noqa: E731
        metric, eps, search_results, _summaries, inference = execute(
            programs, schedule, key_fold, state.Q, state.metric, state.eps,
            n_samples, log=stage_log(reporter),
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
        inline_reporting=inline_reporting,
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


@pytree_dataclass
class StepwiseChunk:
    """Return value of :meth:`MCMCSteps.next_chunk`: ``n_steps`` transitions'
    draws + per-draw diagnostics, scan-stacked along the leading axis."""

    positions: jnp.ndarray  # (n, K) or (n, C, K)
    logdensities: jnp.ndarray  # (n,) or (n, C)
    tree_statistics: TreeStatistics


@dataclasses.dataclass(frozen=True)
class MCMCSteps:
    """Stepwise sampling handle (mcmc.jl:295-341): fixed algorithm, metric and
    stepsize; each ``next_step(key, Q)`` is one transition.

    On a tunneled/remote accelerator every ``next_step`` is a full dispatch
    RPC (~0.1-0.3 s on this image's axon tunnel) — fine for debugging, far
    too slow to drive a run-until-converged loop one transition at a time.
    :meth:`next_chunk` is the amortized form: ``n_steps`` transitions as ONE
    compiled ``lax.scan`` dispatch, with bitwise-identical draws to the
    equivalent ``next_step`` sequence (the key is split identically). For
    fleet-scale run-until-criterion sampling use
    ``run_chains(..., ess_target=...)`` — the engine additionally chunks
    dispatches adaptively under the TPU runtime's execution watchdog, which
    this handle does not (keep ``n_steps`` modest on tunneled chips).
    """

    ld: LogDensity
    algorithm: NUTS
    metric: Metric
    eps: Any

    def next_step(self, key, Q: EvaluatedPoint):
        """One transition (mcmc.jl:348-351)."""
        return self._jitted(key, Q)

    def next_chunk(self, key, Q: EvaluatedPoint, n_steps: int):
        """``n_steps`` transitions in one compiled dispatch.

        ``key`` is split into ``n_steps`` per-transition keys, so
        ``next_chunk(key, Q, n)`` equals ``next_step`` folded over
        ``jax.random.split(key, n)`` draw-for-draw. A 2-d ``Q.q`` (C, K) runs
        the batch-native driver (one tree program for the whole fleet);
        1-d runs the single-chain fast driver. Returns
        ``(Q_final, StepwiseChunk)``.
        """
        batched = Q.q.ndim == 2
        return self._jitted_chunk(int(n_steps), batched)(key, Q)

    @functools.cached_property
    def _jitted(self):
        def step(key, Q):
            return sample_tree(key, self.algorithm, self.ld, self.metric, Q, self.eps)

        return jax.jit(step)

    @functools.cached_property
    def _jitted_chunk(self):
        @functools.lru_cache(maxsize=None)
        def build(n_steps: int, batched: bool):
            if batched:
                from .tree_batched import sample_tree_batched

                def transition(k, Q):
                    return sample_tree_batched(
                        k, self.algorithm, self.ld, self.metric, Q, self.eps
                    )
            else:
                def transition(k, Q):
                    return sample_tree(
                        k, self.algorithm, self.ld, self.metric, Q, self.eps
                    )

            def chunk(key, Q):
                keys = jax.random.split(key, n_steps)

                def body(Q, k):
                    Q_new, stats = transition(k, Q)
                    return Q_new, (Q_new.q, Q_new.logdensity, stats)

                Q_fin, (qs, lds, stats) = jax.lax.scan(body, Q, keys)
                return Q_fin, StepwiseChunk(
                    positions=qs, logdensities=lds, tree_statistics=stats
                )

            return jax.jit(chunk)

        return build


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
        if positions.ndim == 2:  # one unbatched result: a single chain
            positions = positions[None]  # (1, N, K), not a silent transpose
    return jnp.swapaxes(positions, 0, 1)  # (N, C, K)


def pool_posterior_matrices(results) -> jnp.ndarray:
    """[parameter, pooled_draw] pooling (mcmc.jl:615-617)."""
    if isinstance(results, (list, tuple)):
        positions = jnp.stack([r.positions for r in results])
    else:
        positions = results.positions
        if positions.ndim == 2:  # one unbatched result: a single chain
            positions = positions[None]
    c, n, k = positions.shape
    return positions.reshape(c * n, k).T
