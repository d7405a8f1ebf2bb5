"""Compile-efficient execution engine for staged warmup + sampling.

Motivation (measured on TPU v5e): tracing the whole 8-stage warmup fold into
one XLA program inlines EIGHT copies of the NUTS tree program (one per stage
``lax.scan``), which costs ~6+ minutes of compilation and can kill the worker.
The reference's *staged heterogeneous schedule* (mcmc.jl:415-425) is therefore
re-expressed with data-driven loop bounds (SURVEY.md hard part #3): ONE
``lax.while_loop`` stage program whose trip count ``n_steps`` is a runtime
scalar, dispatched eagerly once per stage, plus small separate programs for
the stepsize search and the metric update. Total distinct tree compilations:
2 (stage driver + sampling scan) regardless of the number of stages.

The drivers are pure and unbatched; callers wrap them with
``vmap``/``shard_map``/``jit`` once and reuse across stages (warmup.py's
scan-based path remains for the history-inspecting ``mcmc_keep_warmup``).
"""

from __future__ import annotations

import dataclasses
import functools
import time as _time
import weakref
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .hamiltonian import EvaluatedPoint, PhasePoint
from .logdensity import LogDensity
from .metric import DiagonalMetric, Metric, rand_p
from .nuts import NUTS, sample_tree
from .stepsize import (
    InitialStepsizeSearch,
    find_initial_stepsize,
    local_log_acceptance_ratio,
)
from .utils.welford import (
    WelfordState,
    pool_welford_over_axis,
    welford_update,
)
from .warmup import TuningNUTS, WarmupStage, estimate_metric


class StageSummary(NamedTuple):
    """Cheap per-stage observability (per chain): totals over the stage."""

    mean_acceptance: jnp.ndarray
    divergences: jnp.ndarray  # int32
    steps: jnp.ndarray  # int32 leapfrog steps
    max_depth_hits: jnp.ndarray  # int32


def make_search_driver(ld: LogDensity, params: InitialStepsizeSearch):
    """(key, Q, metric) -> (eps, success, l0); one small program.

    ``l0`` is the joint log density at the starting point: jitted code cannot
    throw, so the reference's non-finite-start guard (stepsize.jl:77-79) is
    enforced host-side by ``_check_stepsize_search`` on this value."""

    def search(key, Q: EvaluatedPoint, metric: Metric):
        p = rand_p(key, metric, dtype=Q.q.dtype)
        z = PhasePoint(Q=Q, p=p)
        A, l0 = local_log_acceptance_ratio(ld, metric, z)
        eps, success = find_initial_stepsize(params, A, dtype=Q.q.dtype)
        return eps, success, l0

    return search


def welford_zero(Q: EvaluatedPoint, dense: bool) -> WelfordState:
    """Batched-or-not Welford zeros matching ``Q.q``'s leading shape."""
    q = Q.q
    batch, k = q.shape[:-1], q.shape[-1]
    m2_shape = batch + ((k, k) if dense else (k,))
    return WelfordState(
        count=jnp.zeros(batch, q.dtype),
        mean=jnp.zeros_like(q),
        m2=jnp.zeros(m2_shape, q.dtype),
    )


def make_stage_driver(
    ld: LogDensity,
    algorithm: NUTS,
    adaptation,
    dense_welford: bool,
):
    """Shared tuning-stage program with runtime trip count, *resumable* so the
    host can chunk long stages into watchdog-safe dispatches.

    (key, Q, metric, da_state, welford, start_i, n_steps) ->
        (Q', da_state', welford', totals dict)

    Step ``i`` (absolute within the stage) derives its key as
    ``fold_in(key, i)``, so any chunking of the same stage is bitwise
    reproducible. Dual averaging restarts at each stage *entry* (handled by
    the executor), exactly as the reference re-initializes adaptation per
    TuningNUTS block (mcmc.jl:266).
    """

    def stage(key, Q: EvaluatedPoint, metric: Metric, da_state, welford, start_i, n_steps):
        zero = jnp.zeros((), Q.q.dtype)
        zero_i = jnp.int32(0)

        def cond(carry):
            return carry["i"] < start_i + n_steps

        def body(carry):
            step_key = jax.random.fold_in(key, carry["i"])
            eps = adaptation.current(carry["da"])
            Q_new, stats = sample_tree(
                step_key, algorithm, ld, metric, carry["Q"], eps
            )
            da = adaptation.update(carry["da"], stats.acceptance_rate)
            wf = welford_update(carry["wf"], Q_new.q)
            return {
                "i": carry["i"] + 1,
                "Q": Q_new,
                "da": da,
                "wf": wf,
                "acc_sum": carry["acc_sum"] + stats.acceptance_rate,
                "div": carry["div"] + stats.is_divergent.astype(jnp.int32),
                "steps": carry["steps"] + stats.steps,
                "maxd": carry["maxd"] + stats.reached_max_depth.astype(jnp.int32),
            }

        out = jax.lax.while_loop(
            cond,
            body,
            {
                "i": jnp.asarray(start_i, jnp.int32),
                "Q": Q,
                "da": da_state,
                "wf": welford,
                "acc_sum": zero,
                "div": zero_i,
                "steps": zero_i,
                "maxd": zero_i,
            },
        )
        totals = {
            "acc_sum": out["acc_sum"],
            "div": out["div"],
            "steps": out["steps"],
            "maxd": out["maxd"],
        }
        return out["Q"], out["da"], out["wf"], totals

    return stage


def make_collecting_stage_driver(
    ld: LogDensity,
    algorithm: NUTS,
    adaptation,
    chunk: int,
):
    """Scan-based tuning-stage chunk that RECORDS per-step history
    (positions, logdensities, eps, tree statistics) — the fast-engine path
    for ``mcmc_keep_warmup`` (mcmc.jl:495-532).

    (key, Q, metric, da_state, welford, start_i, n_total) ->
        (Q', da_state', welford', per-step dict of (chunk, ...) arrays)

    One fixed-``chunk`` program serves any stage length: steps with absolute
    index >= ``n_total`` still execute but their state updates are masked to
    no-ops (the host trims the recorded rows). Step keys are
    ``fold_in(key, absolute_i)``, identical to ``make_stage_driver``, so
    collected and non-collected warmups draw the same chains bitwise.
    """
    from .utils.pytree import tree_where

    def stage(key, Q: EvaluatedPoint, metric: Metric, da_state, welford, start_i, n_total):
        def step(carry, j):
            i = start_i + j
            active = i < n_total
            step_key = jax.random.fold_in(key, i)
            eps = adaptation.current(carry["da"])
            Q_new, stats = sample_tree(
                step_key, algorithm, ld, metric, carry["Q"], eps
            )
            da_new = adaptation.update(carry["da"], stats.acceptance_rate)
            wf_new = welford_update(carry["wf"], Q_new.q)
            new_carry = {
                "Q": tree_where(active, Q_new, carry["Q"]),
                "da": tree_where(active, da_new, carry["da"]),
                "wf": tree_where(active, wf_new, carry["wf"]),
            }
            out = {
                "positions": Q_new.q,
                "logdensities": Q_new.logdensity,
                "epss": eps,
                "tree_statistics": stats,
            }
            return new_carry, out

        carry, ys = jax.lax.scan(
            step,
            {"Q": Q, "da": da_state, "wf": welford},
            jnp.arange(chunk, dtype=jnp.int32),
        )
        return carry["Q"], carry["da"], carry["wf"], ys

    return stage


def make_metric_update(kind: str, shrinkage: float, chain_axis):
    """(WelfordState) -> Metric; tiny program, one pmean when pooled."""

    def update(wf: WelfordState) -> Metric:
        return estimate_metric(wf, kind, shrinkage, chain_axis)

    return update


def combine_welford_batch(w: WelfordState) -> WelfordState:
    """Pool a leading chain axis of Welford states into the moments of the
    union of all chains' draws (equal counts per chain)."""
    n_chains = w.count.shape[0]
    grand_mean = w.mean.mean(axis=0)
    delta = w.mean - grand_mean
    if w.m2.ndim == 3:
        corr = w.count[:, None, None] * jnp.einsum("ci,cj->cij", delta, delta)
    else:
        corr = w.count[:, None] * delta * delta
    return WelfordState(
        count=w.count.sum(axis=0),
        mean=grand_mean,
        m2=(w.m2 + corr).sum(axis=0),
    )


def make_shared_metric_update(kind: str, shrinkage: float, mesh_axis=None):
    """Batched Welford states -> ONE shared (unbatched) metric.

    The key bandwidth optimization for large fleets: with pooled adaptation
    the metric is kept unbatched end-to-end (vmap in_axes=None), so the tree
    hot loop reads a single (K,) / (K, K) metric instead of a per-chain copy
    — for a dense 100-d metric at 4096 chains that is 40 KB/leaf instead of
    160 MB/leaf of HBM traffic."""

    def update(wf_batched: WelfordState) -> Metric:
        combined = combine_welford_batch(wf_batched)
        if mesh_axis is not None:
            combined = pool_welford_over_axis(combined, mesh_axis)
        return estimate_metric(combined, kind, shrinkage, None)

    return update


def make_sampling_driver(ld: LogDensity, algorithm: NUTS, chunk: int):
    """Fixed-size sampling chunk (one compiled program reused for any total):

    (key, Q, metric, eps, start_i) -> (Q_final, positions, logdensities, stats)

    Draw ``start_i + j`` uses key ``fold_in(key, start_i + j)`` so chunking is
    bitwise reproducible for any chunk size.
    """

    def sample(key, Q: EvaluatedPoint, metric: Metric, eps, start_i):
        def step(Q, j):
            step_key = jax.random.fold_in(key, start_i + j)
            Q_new, stats = sample_tree(step_key, algorithm, ld, metric, Q, eps)
            return Q_new, (Q_new.q, Q_new.logdensity, stats)

        Q_final, ys = jax.lax.scan(step, Q, jnp.arange(chunk, dtype=jnp.int32))
        return (Q_final,) + ys

    return sample


@dataclasses.dataclass(frozen=True)
class WarmupSchedule:
    """A normalized fast-path schedule: optional search + tuning blocks.

    ``block_sizes[i]`` steps per block; ``update_metric[i]`` whether the
    block re-estimates the metric afterwards. All metric-updating blocks
    share one ``metric_kind`` and one ``adaptation`` object — true for the
    reference's default and fixed-stepsize schedules.
    """

    search: Optional[InitialStepsizeSearch]
    block_sizes: Tuple[int, ...]
    update_metric: Tuple[bool, ...]
    metric_kind: str
    shrinkages: Tuple[float, ...]
    adaptation: object
    pooled: bool
    # warmup depth clamp (TPU-native scheduling option, default off): cap
    # tree doublings at this value during every block EXCEPT the last, then
    # release to algorithm.max_depth. Early-warmup trees on an unadapted
    # metric legitimately hit max depth and pin the whole lockstep batch;
    # the clamp cuts those straggler slots while the terminal block still
    # adapts eps under the unclamped kernel. Any cap is a valid NUTS kernel
    # — only the adaptation trajectory changes (sampling is never clamped).
    depth_clamp: Optional[int] = None
    # extend the clamp this many steps INTO the final block (monolithic
    # driver only). The final block re-adapts eps against the just-updated
    # metric, and the dual-averaging restart transient builds the deepest
    # trees of the whole warmup (measured ~270 slots/step on the headline
    # config); clamping its head reclaims that while the tail still adapts
    # eps under the unclamped kernel before sampling.
    depth_clamp_tail: int = 0

    @staticmethod
    def from_stages(stages: Tuple[WarmupStage, ...]) -> Optional["WarmupSchedule"]:
        """Normalize a reference-style stage tuple; None if not expressible
        (caller falls back to the scan-based path)."""
        stages = tuple(s for s in stages if s is not None)
        search = None
        idx = 0
        if stages and isinstance(stages[0], InitialStepsizeSearch):
            search = stages[0]
            idx = 1
        blocks = stages[idx:]
        if not all(isinstance(s, TuningNUTS) for s in blocks):
            return None
        if any(isinstance(s, InitialStepsizeSearch) for s in blocks):
            return None
        kinds = {s.metric_kind for s in blocks if s.metric_kind != "none"}
        if len(kinds) > 1:
            return None
        adaptations = {s.stepsize_adaptation for s in blocks}
        if len(adaptations) > 1:
            return None
        pooled_flags = {s.pooled for s in blocks if s.metric_kind != "none"}
        if len(pooled_flags) > 1:
            return None
        if not blocks:
            return None
        return WarmupSchedule(
            search=search,
            block_sizes=tuple(s.N for s in blocks),
            update_metric=tuple(s.metric_kind != "none" for s in blocks),
            metric_kind=next(iter(kinds)) if kinds else "none",
            shrinkages=tuple(s.shrinkage for s in blocks),
            adaptation=next(iter(adaptations)),
            pooled=next(iter(pooled_flags)) if pooled_flags else False,
        )


class FastPrograms(NamedTuple):
    """The compiled-program bundle for a (model, algorithm, schedule)."""

    search: Optional[Callable]
    stage: Callable
    metric_updates: dict  # shrinkage -> callable
    sample: Callable
    sample_chunk: int
    dense_welford: bool
    adaptation: object
    pooled_welford: bool = False
    wf_leading: int = 0  # >0: shared Welford carried with a leading device axis
    stage_nowf: Optional[Callable] = None  # Welford-free variant for eps-only blocks
    # aligned wavefront warmup (tree_wavefront.py): desynchronized transition
    # lifecycles, ~10x fewer leaf slots on straggler-bound warmups
    stage_wavefront: Optional[Callable] = None
    stage_wavefront_nowf: Optional[Callable] = None
    wavefront_init: Optional[Callable] = None
    # whole-warmup single program (block boundaries compiled in)
    warmup_mono: Optional[Callable] = None
    # width-C/G sampling program with its own chunk (depth stratification)
    sample_stratified: Optional[Callable] = None
    stratified_chunk: int = 0
    # epoch-specialized wavefront SAMPLING (tree_wavefront_epoch.py):
    # desynchronized per-draw recording; amortizes the per-transition fixed
    # cost AND the lockstep straggler tax in one slot loop
    sample_epoch: Optional[Callable] = None  # (key, metric, eps, carry, g_stop)
    sample_epoch_init: Optional[Callable] = None  # (Q, metric) -> carry
    sample_epoch_finish: Optional[Callable] = None  # carry -> (Q', qs, lds, stats)


def build_programs(
    ld: LogDensity,
    algorithm: NUTS,
    schedule: WarmupSchedule,
    chain_axis,
    wrap: Callable[[Callable, str], Callable],
    sample_chunk: int = 8,
    shared_metric: bool = False,
    mesh_axis=None,
):
    """Build + wrap the four program kinds. ``wrap(fn, kind)`` applies
    vmap/shard_map/jit; ``kind`` in {search, stage, metric, metric_shared,
    sample} tells the wrapper which arguments are batched.

    ``shared_metric``: pooled adaptation with ONE unbatched metric shared by
    all chains (the wrapper must pass the metric with in_axes=None)."""
    search = None
    if schedule.search is not None:
        search = wrap(make_search_driver(ld, schedule.search), "search")
    dense = schedule.metric_kind == "dense"
    stage = wrap(
        make_stage_driver(ld, algorithm, schedule.adaptation, dense_welford=dense),
        "stage",
    )
    metric_updates = {}
    if schedule.metric_kind != "none":
        for lam in sorted(set(schedule.shrinkages)):
            if shared_metric:
                metric_updates[lam] = wrap(
                    make_shared_metric_update(
                        schedule.metric_kind, lam, mesh_axis
                    ),
                    "metric_shared",
                )
            else:
                metric_updates[lam] = wrap(
                    make_metric_update(
                        schedule.metric_kind,
                        lam,
                        chain_axis if schedule.pooled else None,
                    ),
                    "metric",
                )
    sample = wrap(make_sampling_driver(ld, algorithm, sample_chunk), "sample")
    return FastPrograms(
        search=search,
        stage=stage,
        metric_updates=metric_updates,
        sample=sample,
        sample_chunk=sample_chunk,
        dense_welford=dense,
        adaptation=schedule.adaptation,
    )


@functools.partial(jax.jit, static_argnames=("n_keep", "axis"))
def _concat_draws(qs_list, n_keep, axis):
    """One-dispatch concat+trim of accumulated sampling-chunk positions for
    the ESS-target convergence check (eager per-chunk concats are tunnel
    RPCs)."""
    out = jnp.concatenate(qs_list, axis=axis) if len(qs_list) > 1 else qs_list[0]
    return jax.lax.slice_in_dim(out, 0, n_keep, axis=axis)


@functools.partial(jax.jit, static_argnames=("n_samples", "axis"))
def _assemble_pieces(pieces, perm, n_samples, axis):
    """One-dispatch assembly of sampling chunks (outer tuple) x stratified
    groups (inner tuple) of (qs, lds, stats): concat groups on the chain
    axis, chunks on the draw axis, trim to n_samples, and restore the
    caller's lane order via ``perm``. Jitted because each eager op is a
    separate tunnel RPC (~0.2 s apiece; measured 4.7 s total eager)."""

    def cat0(*xs):
        return jnp.concatenate(xs, axis=0) if len(xs) > 1 else xs[0]

    def catd(*xs):
        out = jnp.concatenate(xs, axis=axis) if len(xs) > 1 else xs[0]
        return jax.lax.slice_in_dim(out, 0, n_samples, axis=axis)

    def assemble_array(field):
        chunks = []
        for chunk_groups in pieces:
            vals = [g[field] for g in chunk_groups]
            if vals[0] is None:
                return None
            chunks.append(cat0(*vals))
        out = catd(*chunks)
        return out[perm] if perm is not None else out

    def assemble_tree(field):
        trees = [
            jax.tree_util.tree_map(cat0, *[g[field] for g in chunk_groups])
            for chunk_groups in pieces
        ]
        cat = jax.tree_util.tree_map(catd, *trees)
        if perm is not None:
            cat = jax.tree_util.tree_map(lambda x: x[perm], cat)
        return cat

    return assemble_array(0), assemble_array(1), assemble_tree(2)


@jax.jit
def _regroup_lanes(group_out, inv_perm):
    """Concat stratified groups on the chain axis and restore lane order
    (streaming draw_sink path; one dispatch per chunk)."""
    qs = jnp.concatenate([o[0] for o in group_out], axis=0)[inv_perm]
    lds = jnp.concatenate([o[1] for o in group_out], axis=0)[inv_perm]
    stats = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0)[inv_perm],
        *[o[2] for o in group_out],
    )
    return qs, lds, stats


@jax.jit
def _regroup_q(q_parts, inv_perm):
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0)[inv_perm], *q_parts
    )


@jax.jit
def _tree_sum(parts):
    """Sum a list of identically-shaped stat dicts in ONE dispatch (the
    eager per-chunk adds each cost a tunnel RPC)."""
    return jax.tree_util.tree_map(lambda *xs: sum(xs), *parts)


_RETRY_SLEEP_SECONDS = 20.0  # backoff base; monkeypatched to 0 in tests

# max per-step warmup cost seen per compiled monolithic program: a weak-key
# map of jit wrapper -> {schedule length: cost}. Lets a later execute() of
# the same program start with a full-size first chunk instead of re-probing
# 4/16/64/... (each probe is a tunnel RPC). Weak keys make the identity
# airtight: if the program-bundle lru cache (maxsize=32) ever evicts a
# wrapper, its entry dies with it instead of a recycled id() serving a stale
# estimate to an unrelated program.
_PER_STEP_SEEN: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def _retry_dispatch(run, log=None, what="dispatch", on_retry=None):
    """Run one device dispatch with watchdog-kill resilience.

    The TPU runtime kills single-device executions that exceed ~1 minute
    ("UNAVAILABLE: TPU worker crashed / kernel fault"); dispatch inputs are
    committed buffers and every step key folds a global index, so
    re-dispatching the same range is bitwise identical. 3 retries PER
    dispatch (the budget resets with each success by construction — a fresh
    counter per call). ``on_retry(attempt)`` lets callers shrink their
    chunk/budget before the redispatch. Mirrors the reference's fail-with-
    context philosophy (/root/reference/src/utilities.jl:17-38) applied to
    the one genuinely transient failure mode of this runtime.
    """
    retries = 0
    while True:
        try:
            return run()
        except jax.errors.JaxRuntimeError as e:
            if retries >= 3 or "UNAVAILABLE" not in str(e):
                raise
            retries += 1
            if on_retry is not None:
                on_retry(retries)
            if log is not None:
                log(f"{what} failed ({e!s:.80}); retry {retries}/3")
            _time.sleep(_RETRY_SLEEP_SECONDS * retries)


@functools.partial(jax.jit, static_argnames="metric_batched")
def _eps_sort_state(Q, eps, metric, metric_batched: bool):
    """Sort lanes by adapted eps: ONE jitted dispatch returning the permuted
    (Q, eps, metric) plus the inverse permutation (two eager argsorts + a
    per-call jit closure here measured as extra tunnel RPCs + a retrace on
    every stratified run). A shared metric passes through unpermuted."""
    perm = jnp.argsort(eps)
    inv_perm = jnp.argsort(perm)
    take = lambda t: jax.tree_util.tree_map(lambda x: x[perm], t)
    return take(Q), eps[perm], (take(metric) if metric_batched else metric), inv_perm


def metric_is_batched(metric: Metric) -> bool:
    """Per-chain (leading chain axis) vs shared metric, decided by array RANK
    — never by size, so a shared metric whose dimension K happens to equal
    the chain count can never be misclassified (and silently permuted) by
    the stratified-sampling path."""
    m = metric.m_inv
    return m.ndim == (2 if isinstance(metric, DiagonalMetric) else 3)


class WarmupCheckpoint(NamedTuple):
    """Mid-warmup engine state at a dispatch boundary (monolithic fast path).

    Every step key folds the ABSOLUTE step index (the warmup key itself is
    ``key_fold(1)``, independent of progress), so re-dispatching from
    ``step`` reproduces the uninterrupted run bitwise — the same invariant
    that makes retry-after-watchdog-kill and chunk-size changes draw-exact.
    A checkpoint is valid only for the same (model, schedule, chain count,
    key) it was taken from; ``execute`` re-validates the shapes it can see.
    Round-trips through :func:`dynamichmc_tpu.checkpoint.save_state`
    (architectural hook per SURVEY §5; cf. /root/reference/src/mcmc.jl:72-79
    — the reference's warmup is a pure state fold, which is what makes this
    resumable-by-construction).
    """

    step: Any  # next absolute warmup step index (scalar)
    Q: Any
    metric: Any
    da: Any
    wf: Any
    eps_run: Any
    totals: Any  # running on-device stage totals (acc_sum/div/steps/maxd[/work])
    search: Any  # {"eps","success","l0"} from the initial search, or None


def execute(
    programs: FastPrograms,
    schedule: WarmupSchedule,
    key_fold: Callable[[int], jax.Array],
    Q,
    metric,
    eps,
    n_samples: int,
    target_seconds: float = 12.0,
    max_chunk: int = 200,
    log=None,
    draw_sink=None,
    stratify_sampling: int = 0,
    stratify_permute_only: bool = False,
    warmup_sink=None,
    warmup_resume: Optional[WarmupCheckpoint] = None,
    ess_target: Optional[float] = None,
    ess_check_start: int = 0,
    ess_check_factor: float = 2.0,
):
    """Run the schedule eagerly, chunking long stages into watchdog-safe
    dispatches with adaptive chunk sizing (the TPU runtime kills single
    executions that run for minutes).

    ``stratify_permute_only``: mesh-stratified sampling — sort lanes by
    adapted (per-chain) eps before the normal sharded sampling loop so each
    device's shard is one eps band; see the in-line note at the sampling
    section. Ignored when group-serial ``stratify_sampling`` is active or
    eps is shared.

    ``warmup_sink``: called with a :class:`WarmupCheckpoint` at every warmup
    dispatch boundary (monolithic fast path only) — persist it with
    ``checkpoint.save_state`` to survive preemption. ``warmup_resume``:
    a checkpoint to continue from; the search is skipped (its results are
    restored from the checkpoint) and the resumed run's draws are bitwise
    identical to an uninterrupted one.

    ``ess_target``: sample-until-converged (the batched-engine form of the
    reference's stepwise run-until-criterion pattern, mcmc.jl:320-333).
    After selected sampling-chunk boundaries the accumulated draws' min-
    over-parameters pooled bulk ESS is evaluated ON DEVICE
    (stats_device.ess_rhat_device); once it reaches the target, sampling
    stops and the result holds exactly the draws taken (<= n_samples, which
    becomes the cap). Checks start at ``ess_check_start`` draws (0 -> the
    first chunk boundary >= max(sample_chunk, 64)) and then space
    geometrically by ``ess_check_factor`` (each distinct cumulative draw
    count compiles its own ESS program — the default factor 2 bounds that
    to O(log) compiles; set 1.0 to check every chunk). Sync sampling only;
    requires retaining draws (no draw_sink).

    ``key_fold(i)`` returns the (possibly batched) key for step-group ``i``.
    Returns (metric, eps, search_results, summaries, inference_tuple).
    """
    adaptation = programs.adaptation
    from .errors import DynamicHMCError

    if (warmup_sink is not None or warmup_resume is not None) and (
        programs.warmup_mono is None
    ):
        raise DynamicHMCError(
            "warmup checkpoint/resume requires the monolithic fast warmup "
            "program (batch-native path with a fast-engine-expressible "
            "schedule)"
        )
    if ess_target is not None:
        if draw_sink is not None:
            raise DynamicHMCError(
                "ess_target needs the accumulated draws on device to "
                "evaluate convergence; it cannot be combined with a "
                "draw_sink"
            )
        if not ess_target > 0:
            raise DynamicHMCError("ess_target must be > 0")
        if not ess_check_factor >= 1.0:
            raise DynamicHMCError("ess_check_factor must be >= 1.0")
    t_start = _time.perf_counter()
    search_results = None
    if warmup_resume is not None:
        if warmup_resume.Q.q.shape != Q.q.shape:
            raise DynamicHMCError(
                f"warmup_resume chain state shape {warmup_resume.Q.q.shape} "
                f"does not match this run's {Q.q.shape}"
            )
        search_results = warmup_resume.search
        eps = warmup_resume.search["eps"] if warmup_resume.search else eps
    elif schedule.search is not None:
        if eps is not None:
            raise DynamicHMCError(
                "stepsize eps manually specified, won't perform initial search"
            )
        eps, success, l0 = programs.search(key_fold(0), Q, metric)
        search_results = {"eps": eps, "success": success, "l0": l0}
        # the success/l0 flags are validated AFTER the run (see the caller's
        # note in parallel/chains.py) — start their device-to-host copies
        # now so the final _check_stepsize_search reads an already-landed
        # host buffer instead of paying 2 blocking tunnel RPCs (~0.1 s)
        # inside the timed window
        for _arr in (success, l0):
            try:
                _arr.copy_to_host_async()
            except Exception:
                break  # optional fast path; np.asarray still works later
    elif eps is None:
        raise DynamicHMCError("no stepsize: provide eps or a search stage")
    if log is not None:
        jax.block_until_ready(eps)
        log(f"stepsize search: {_time.perf_counter() - t_start:.1f}s")

    def strong(tree):
        # strip weak_type flags so eagerly-built states hash identically to
        # program outputs (prevents one retrace per stage)
        return jax.tree_util.tree_map(lambda x: x.astype(x.dtype), tree)

    # warm the stage program (zero steps) so compile time never pollutes the
    # adaptive chunk sizing
    def make_wf():
        if programs.pooled_welford:
            wf = welford_zero_shared(
                Q.q.shape[-1], programs.dense_welford, Q.q.dtype
            )
            if programs.wf_leading:
                wf = jax.tree_util.tree_map(
                    lambda x: jnp.zeros((programs.wf_leading,) + x.shape, x.dtype),
                    wf,
                )
            return wf
        return welford_zero(Q, programs.dense_welford)

    eps = strong(eps)
    da0 = strong(adaptation.init(eps))
    wf0 = make_wf()
    if log is not None:
        jax.block_until_ready(eps)
        log(f"prologue: {_time.perf_counter() - t_start:.2f}s since start")
    # the per-step cost estimate (and the compiled executable behind the jit
    # wrapper) is shape-specific: the same program bundle serves every chain
    # count whose sampling chunk coincides, so the cache must key on the
    # schedule length AND the input shape/dtype — a C=16 estimate reused at
    # C=4096 would size a watchdog-killing first chunk and skip the
    # compile-absorbing warm dispatch
    cost_key = (
        sum(schedule.block_sizes), Q.q.shape, jnp.dtype(Q.q.dtype).name
    )
    # promote a diagonal initial metric to dense up front on EVERY warmup
    # path (numerically a no-op): the first dense re-estimate otherwise
    # changes the metric operand's pytree type mid-run, retracing the stage/
    # wavefront program inside the budgeted dispatch loop (a multi-minute
    # tunnel compile whose wall also poisons the per-iteration estimate)
    metric = promote_metric(metric, schedule.metric_kind)
    if programs.warmup_mono is not None:
        eps_run0 = strong(adaptation.current(da0))
        # the zero-step warm dispatch exists to trigger the (possibly
        # minutes-long) compile outside the adaptive chunk sizing; when a
        # prior execute() of this same program already recorded a per-step
        # cost, the program is compiled in-process — skip the extra RPC
        seen = _PER_STEP_SEEN.get(programs.warmup_mono)
        if seen is None or cost_key not in seen:
            warm = programs.warmup_mono(
                key_fold(0), Q, metric, da0, wf0, eps_run0, jnp.int32(0),
                jnp.int32(0),
            )
            jax.block_until_ready(warm[5]["acc_sum"])
            if log is not None:
                log(f"warm dispatch done: {_time.perf_counter() - t_start:.2f}s")
    elif programs.stage_wavefront is not None:
        carry0 = programs.wavefront_init(Q, metric, da0, wf0)
        for wfront_fn in (programs.stage_wavefront, programs.stage_wavefront_nowf):
            if wfront_fn is None:
                continue
            _, warm_done = wfront_fn(
                key_fold(0), metric, carry0, jnp.int32(0), jnp.int32(0),
                jnp.int32(0), jnp.int32(-1),
            )
            jax.block_until_ready(warm_done)
    else:
        warm = programs.stage(
            key_fold(0), Q, metric, da0, wf0, jnp.int32(0), jnp.int32(0)
        )
        jax.block_until_ready(warm[3]["acc_sum"])
        if programs.stage_nowf is not None:
            warm = programs.stage_nowf(
                key_fold(0), Q, metric, da0, wf0, jnp.int32(0), jnp.int32(0)
            )
            jax.block_until_ready(warm[3]["acc_sum"])

    chunk = 4
    per_step_max_blk = 0.0  # max per-step cost seen across ALL blocks
    wf_budget = 2048  # wavefront iterations per dispatch (adapted below)
    summaries = []

    if programs.warmup_mono is not None:
        # whole-warmup single program: block boundaries handled on device
        total = sum(schedule.block_sizes)
        warm_key = key_fold(1)
        if warmup_resume is not None:
            start_resume = int(warmup_resume.step)
            if not 0 <= start_resume <= total:
                raise DynamicHMCError(
                    f"warmup_resume.step={start_resume} outside this "
                    f"schedule's [0, {total}] step range"
                )
            Q = strong(warmup_resume.Q)
            metric = strong(warmup_resume.metric)
            da = strong(warmup_resume.da)
            wf = strong(warmup_resume.wf)
            eps_run = strong(warmup_resume.eps_run)
            totals = [warmup_resume.totals] if warmup_resume.totals else []
        else:
            start_resume = 0
            da = da0
            wf = wf0
            eps_run = strong(adaptation.current(da0))
            totals = []
        # A prior execute() of the SAME compiled program (e.g. the untimed
        # warm run) already measured the max per-step cost: start with a
        # watchdog-safe full-size chunk instead of probing 4/16/64/...
        # (each probe dispatch is a tunnel RPC; the ramp measured ~0.4 s on
        # the headline config). Safety: half the watchdog target on the
        # cached estimate, and _retry_dispatch halves on any kill anyway.
        per_step_max = _PER_STEP_SEEN.get(programs.warmup_mono, {}).get(
            cost_key, 0.0
        )
        if per_step_max > 0.0:
            chunk = int(max(4, min(total, 0.5 * target_seconds / per_step_max)))
        per_step_big = 0.0  # amortized estimate (>=64-step dispatches only)
        start = start_resume
        while start < total:
            # a retry halves the chunk and redispatches the SAME step range
            # (step keys fold the global index — bitwise identical results);
            # recompute step_count inside `run` so the halved chunk applies.
            # t0 resets per ATTEMPT: a killed dispatch's wall and the retry
            # backoff sleep must not inflate the per-step cost estimate
            # (which is max-seen, feeds the cross-run cache, and would
            # otherwise permanently collapse the chunk size)
            t0 = _time.perf_counter()
            step_count = min(chunk, total - start)

            def run_mono():
                nonlocal step_count, t0
                t0 = _time.perf_counter()
                step_count = min(chunk, total - start)
                out = programs.warmup_mono(
                    warm_key, Q, metric, da, wf, eps_run,
                    jnp.int32(start), jnp.int32(step_count),
                )
                jax.block_until_ready(out[5]["acc_sum"])
                return out

            def halve_mono(_attempt):
                nonlocal chunk
                chunk = max(1, step_count // 2)

            Q_n, metric_n, da_n, wf_n, eps_n, t = _retry_dispatch(
                run_mono, log=log, what="warmup dispatch",
                on_retry=halve_mono,
            )
            Q, metric, da, wf, eps_run = Q_n, metric_n, da_n, wf_n, eps_n
            wall = _time.perf_counter() - t0
            totals.append(t)
            start += step_count
            if warmup_sink is not None:
                # keep the running totals as ONE on-device tree so each
                # checkpoint is O(state), not O(dispatches)
                totals = [_tree_sum(tuple(totals))] if len(totals) > 1 else totals
                warmup_sink(WarmupCheckpoint(
                    step=start, Q=Q, metric=metric, da=da, wf=wf,
                    eps_run=eps_run, totals=totals[0],
                    search=search_results,
                ))
            # conservative sizing: early transitions are the SHALLOWEST
            # (trees deepen as eps adapts), so extrapolating the next chunk
            # from the latest per-step cost alone can overshoot the ~60 s
            # TPU watchdog; track the max per-step cost seen and never grow
            # the chunk more than 4x per dispatch
            per_step_max = max(per_step_max, wall / max(step_count, 1))
            if step_count >= 64:
                # small dispatches over-estimate per-step cost (fixed RPC
                # dominates); only amortized ones feed the cross-run cache
                per_step_big = max(per_step_big, wall / step_count)
            chunk = int(max(1, min(
                total,
                target_seconds / max(per_step_max, 1e-4),
                4 * step_count,
            )))
            if log is not None:
                # chunk-boundary steps/sec + ETA (reporting.jl:118-136
                # semantics at dispatch granularity — zero hot-loop cost)
                rate = step_count / max(wall, 1e-9)
                eta = (total - start) * max(per_step_max, 1e-9)
                log(
                    f"warmup: {start}/{total} steps ({wall:.1f}s, "
                    f"{rate:.1f} steps/s, ~{eta:.1f}s left, "
                    f"next chunk {chunk})"
                )
        eps = eps_run
        _PER_STEP_SEEN.setdefault(programs.warmup_mono, {})[cost_key] = (
            per_step_big or per_step_max
        )
        if log is not None:
            log(f"warmup loop done: {_time.perf_counter() - t_start:.2f}s since start")
        totals = _tree_sum(tuple(totals)) if len(totals) > 1 else totals[0]
        summaries.append(
            StageSummary(
                mean_acceptance=totals["acc_sum"] / max(total, 1),
                divergences=totals["div"],
                steps=totals["steps"],
                max_depth_hits=totals["maxd"],
            )
        )
        if log is not None and "work" in totals:
            import numpy as _np

            _steps = _np.asarray(totals["steps"], _np.float64)
            _work = _np.asarray(totals["work"], _np.float64)
            if _work.mean() > 0:
                log(
                    f"warmup straggler waste: "
                    f"{1 - _steps.mean() / _work.mean():.1%} "
                    f"({_work.mean() / max(total, 1):.1f} slots/step)"
                )
        block_sizes = ()
    else:
        block_sizes = schedule.block_sizes

    for i, n in enumerate(block_sizes):
        stage_key = key_fold(i + 1)
        da = strong(adaptation.init(eps))
        wf = make_wf()
        # eps-only blocks discard their moments: skip the Welford update
        # (for per-chain dense it is a (C, K, K) read+write per transition)
        stage_fn = programs.stage
        if not schedule.update_metric[i] and programs.stage_nowf is not None:
            stage_fn = programs.stage_nowf
        if programs.stage_wavefront is not None:
            # desynchronized warmup: watchdog-safe dispatches of the aligned
            # wavefront loop until every lane completes its n transitions
            wf_fn = programs.stage_wavefront
            if not schedule.update_metric[i] and programs.stage_wavefront_nowf is not None:
                wf_fn = programs.stage_wavefront_nowf
            # warmup depth clamp: active through every block but the last
            # (WarmupSchedule.depth_clamp semantics; 0 = unclamped). On the
            # final block, depth_clamp_tail > 0 clamps each lane's first
            # `tail` transitions only (per-lane DA-restart tail clamp —
            # tree_wavefront.stage's tail_steps operand)
            last_block = i == len(schedule.block_sizes) - 1
            if schedule.depth_clamp is not None and not last_block:
                dl_block = jnp.int32(schedule.depth_clamp)
                tail_block = jnp.int32(-1)
            elif schedule.depth_clamp is not None and schedule.depth_clamp_tail:
                dl_block = jnp.int32(schedule.depth_clamp)
                tail_block = jnp.int32(schedule.depth_clamp_tail)
            else:
                dl_block = jnp.int32(0)
                tail_block = jnp.int32(-1)
            carry = programs.wavefront_init(Q, metric, da, wf)
            import numpy as _np

            # "g" is a scalar on one device, a (n_devices,) per-device
            # counter vector under a mesh (devices advance independently);
            # the dispatch budget keys off the SLOWEST device so no device
            # ever runs more than wf_budget iterations per dispatch
            g_prev_v = None
            while True:
                t0 = _time.perf_counter()
                g_min = 0 if g_prev_v is None else int(g_prev_v.min())

                def run_wf(carry_in=carry, g_min=g_min):
                    # reset t0 per attempt: killed-dispatch wall + retry
                    # backoff must not inflate the per-iteration estimate
                    nonlocal t0
                    t0 = _time.perf_counter()
                    out = wf_fn(
                        stage_key, metric, carry_in, jnp.int32(n),
                        jnp.int32(g_min + wf_budget), dl_block, tail_block,
                    )
                    jax.block_until_ready(out[1])
                    return out

                def halve_wf(_attempt):
                    nonlocal wf_budget
                    wf_budget = max(256, wf_budget // 2)

                carry, done = _retry_dispatch(
                    run_wf, log=log, what="wavefront dispatch",
                    on_retry=halve_wf,
                )
                wall = _time.perf_counter() - t0
                g_now_v = _np.asarray(carry["g"]).reshape(-1).astype(_np.int64)
                if g_prev_v is None:
                    g_prev_v = _np.zeros_like(g_now_v)
                iters = max(int((g_now_v - g_prev_v).max()), 1)
                g_prev_v = g_now_v
                per_iter = wall / iters
                wf_budget = int(
                    max(256, min(2_000_000, target_seconds / max(per_iter, 1e-7)))
                )
                if log is not None:
                    log(
                        f"warmup block {i + 1}/{len(schedule.block_sizes)} "
                        f"(wavefront): {int(g_now_v.max())} slots "
                        f"({wall:.1f}s, {iters / max(wall, 1e-9):.0f} "
                        f"slots/s, next budget {wf_budget})"
                    )
                if bool(_np.asarray(done).all()):
                    break
            Q, da, wf = carry["Q"], carry["da"], carry["wf"]
            totals = {
                "acc_sum": carry["acc_sum"],
                "div": carry["div"],
                "steps": carry["steps_total"],
                "maxd": carry["maxd"],
                # per-device slot counters expanded to their local lanes
                # (numpy: only the host-side waste diagnostic reads this)
                "work": _np.repeat(
                    g_prev_v, carry["t"].shape[0] // len(g_prev_v)
                ),
            }
            start = n
        else:
            totals = None
            totals_parts = []
            start = 0
        while start < n:
            t0 = _time.perf_counter()
            step_count = min(chunk, n - start)

            def run_stage(Q_in=Q, da_in=da, wf_in=wf):
                # t0 resets per attempt (see the monolithic loop note)
                nonlocal step_count, t0
                t0 = _time.perf_counter()
                step_count = min(chunk, n - start)
                out = stage_fn(
                    stage_key, Q_in, metric, da_in, wf_in,
                    jnp.int32(start), jnp.int32(step_count),
                )
                jax.block_until_ready(out[3]["acc_sum"])
                return out

            def halve_stage(_attempt):
                nonlocal chunk
                chunk = max(1, step_count // 2)

            Q, da, wf, t = _retry_dispatch(
                run_stage, log=log, what="warmup block dispatch",
                on_retry=halve_stage,
            )
            wall = _time.perf_counter() - t0
            totals_parts.append(t)
            start += step_count
            # adapt the dispatch quantum toward the wall-clock target
            # (max-seen per-step cost + 4x growth cap: see monolithic loop)
            per_step_max_blk = max(per_step_max_blk, wall / max(step_count, 1))
            chunk = int(max(1, min(
                max_chunk,
                target_seconds / max(per_step_max_blk, 1e-4),
                4 * step_count,
            )))
            if log is not None:
                rate = step_count / max(wall, 1e-9)
                eta = (n - start) * max(per_step_max_blk, 1e-9)
                log(
                    f"warmup block {i + 1}/{len(schedule.block_sizes)}: "
                    f"{start}/{n} steps ({wall:.1f}s, {rate:.1f} steps/s, "
                    f"~{eta:.1f}s left, next chunk {chunk})"
                )
        if totals is None:
            totals = (
                _tree_sum(tuple(totals_parts))
                if len(totals_parts) > 1
                else totals_parts[0]
            )
        summaries.append(
            StageSummary(
                mean_acceptance=totals["acc_sum"] / max(n, 1),
                divergences=totals["div"],
                steps=totals["steps"],
                max_depth_hits=totals["maxd"],
            )
        )
        if log is not None and "work" in totals:
            import numpy as _np

            _steps = _np.asarray(totals["steps"], _np.float64)
            _work = _np.asarray(totals["work"], _np.float64)
            if _work.mean() > 0:
                log(
                    f"warmup block {i + 1} straggler waste: "
                    f"{1 - _steps.mean() / _work.mean():.1%} "
                    f"({_work.mean() / max(n, 1):.1f} slots/step)"
                )
        eps = adaptation.final(da)
        if schedule.update_metric[i]:
            metric = programs.metric_updates[schedule.shrinkages[i]](wf)

    # sampling: fixed-size chunks, trimmed to n_samples. With a draw_sink the
    # draws stream to the host chunk-by-chunk (device memory stays O(chunk));
    # only the (small) per-draw tree statistics are kept on device.
    sample_key = key_fold(len(schedule.block_sizes) + 1)
    n_batch_dims = Q.q.ndim - 1
    axis = n_batch_dims

    if n_samples == 0:
        # warmup-only run (adaptation inspection): nothing to sample or
        # assemble — return structurally-correct empty inference arrays
        # (the keep-warmup fast path supports exactly this use)
        qs_s, lds_s, stats_s = jax.eval_shape(
            lambda Q_in: programs.sample(
                sample_key, Q_in, metric, eps, jnp.int32(0)
            )[1:],
            Q,
        )

        def _empty(s):
            shape = list(s.shape)
            shape[axis] = 0
            return jnp.zeros(tuple(shape), s.dtype)

        inference = (
            Q, _empty(qs_s), _empty(lds_s),
            jax.tree_util.tree_map(_empty, stats_s),
        )
        return metric, eps, search_results, summaries, inference

    G = int(stratify_sampling) if stratify_sampling else 0
    C_total = Q.q.shape[0] if n_batch_dims == 1 else 0
    stratify = (
        G > 1
        and n_batch_dims == 1
        and getattr(eps, "ndim", 0) == 1
        and C_total % G == 0
        and programs.sample_stratified is not None
    )
    permute_only = (
        stratify_permute_only
        and not stratify
        and n_batch_dims == 1
        and getattr(eps, "ndim", 0) == 1
    )
    if ess_target is not None and (
        stratify or (programs.sample_epoch is not None and n_batch_dims == 1)
    ):
        # never silently drop the criterion: the group-serial and epoch
        # drivers record draws in layouts the incremental check doesn't
        # cover (group-serial pieces, desynchronized ring rows)
        raise DynamicHMCError(
            "ess_target requires the sync (non-group-serial) sampling "
            "driver; mesh stratification by permutation is supported"
        )
    if stratify:
        # Depth-stratified execution: with PER-CHAIN stepsizes the lockstep
        # batch pays every transition's max-over-lanes tree depth, and small-
        # eps lanes are persistent stragglers (measured 58-90% of sampling
        # leaf slots spent on terminated lanes). Sorting lanes by adapted eps
        # and sampling G contiguous groups bounds each group's loop by its
        # OWN deepest lane. Pure scheduling — each lane's chain law is
        # unchanged (draw streams differ through the documented batch-shape
        # RNG dependence). One extra program compile (width C/G, chunk
        # scaled by G keeps the dispatch count unchanged).
        metric_b = metric_is_batched(metric)
        Q_s, eps_s, metric_s, inv_perm = _eps_sort_state(Q, eps, metric, metric_b)
        Cg = C_total // G
        chunk = programs.stratified_chunk  # baked into sample_stratified
        n_chunks = -(-n_samples // chunk)
        pieces = []
        Q_parts = [None] * G
        group_keys = [jax.random.fold_in(sample_key, g + 1) for g in range(G)]
        # hoist the per-group constants out of the chunk loop (each eager
        # slice inside it is a tunnel RPC repeated n_chunks times)
        group_slices = [slice(g * Cg, (g + 1) * Cg) for g in range(G)]
        group_eps = [eps_s[sl] for sl in group_slices]
        group_metric = [
            jax.tree_util.tree_map(lambda x, sl=sl: x[sl], metric_s)
            if metric_b
            else metric
            for sl in group_slices
        ]
        t_sample = _time.perf_counter()
        for c in range(n_chunks):
            group_out = []
            for g in range(G):
                sl = group_slices[g]
                key_g = group_keys[g]
                Qg = Q_parts[g] if Q_parts[g] is not None else jax.tree_util.tree_map(
                    lambda x: x[sl], Q_s
                )
                def run_group(Qg_in=Qg, key_in=key_g, g_in=g):
                    out = programs.sample_stratified(
                        key_in, Qg_in, group_metric[g_in], group_eps[g_in],
                        jnp.int32(c * chunk),
                    )
                    jax.block_until_ready(out[2])
                    return out

                Qg, qs, lds, stats = _retry_dispatch(
                    run_group, log=log, what=f"sampling group {g} dispatch"
                )
                Q_parts[g] = Qg
                group_out.append((qs, lds, stats))
            if draw_sink is not None:
                # restore the caller's lane order before anything leaves
                qs, lds, stats = _regroup_lanes(tuple(group_out), inv_perm)
                draw_sink(c * chunk, qs, lds, stats)
                pieces.append(((None, None, stats),))
            else:
                # raw group pieces; ONE jitted assembly at the end (each
                # eager op here is a tunnel RPC — measured ~0.2 s apiece)
                pieces.append(tuple(group_out))
            if log is not None:
                jax.block_until_ready(group_out[-1][1])
                done = min((c + 1) * chunk, n_samples)
                elapsed = _time.perf_counter() - t_sample
                eta = (n_samples - done) * elapsed / max(done, 1)
                log(
                    f"sampling[stratified x{G}]: {done}/{n_samples} "
                    f"({elapsed:.1f}s, {done / max(elapsed, 1e-9):.1f} "
                    f"draws/s, ~{eta:.1f}s left)"
                )
        Q = _regroup_q(tuple(Q_parts), inv_perm)
        pieces_perm = None if draw_sink is not None else inv_perm
    elif programs.sample_epoch is not None and n_batch_dims == 1:
        # Epoch-wavefront sampling (tree_wavefront_epoch.py): desynchronized
        # per-draw recording in ONE resumable slot loop — watchdog-safe
        # dispatches budgeted in global slots, bitwise reproducible across
        # chunk boundaries (slot keys fold the global counter).
        import numpy as _np

        carry = programs.sample_epoch_init(Q, metric)
        cost_key_ep = (n_samples, Q.q.shape, jnp.dtype(Q.q.dtype).name)
        per_slot = _PER_STEP_SEEN.get(programs.sample_epoch, {}).get(
            cost_key_ep, 0.0
        )
        if per_slot <= 0.0:
            # absorb the (possibly minutes-long) compile outside the budget;
            # the zero-budget dispatch runs no epochs but DONATES the carry,
            # so thread its output forward
            carry, _d = programs.sample_epoch(
                sample_key, metric, eps, carry, jnp.int32(0)
            )
            jax.block_until_ready(_d)
            ep_budget = 4096
        else:
            ep_budget = int(max(512, 0.5 * target_seconds / per_slot))
        t_sample = _time.perf_counter()
        g_prev = 0
        while True:
            t0 = _time.perf_counter()

            def run_epoch(carry_in=carry):
                # read ep_budget at CALL time: halve_epoch shrinks it
                # between watchdog retries, and a def-time g_stop default
                # would redispatch the identical killed size
                nonlocal t0
                t0 = _time.perf_counter()
                out = programs.sample_epoch(
                    sample_key, metric, eps, carry_in,
                    jnp.int32(g_prev + ep_budget)
                )
                jax.block_until_ready(out[1])
                return out

            def halve_epoch(_attempt):
                nonlocal ep_budget
                ep_budget = max(256, ep_budget // 2)

            carry, done = _retry_dispatch(
                run_epoch, log=log, what="epoch sampling dispatch",
                on_retry=halve_epoch,
            )
            wall = _time.perf_counter() - t0
            # under a mesh "g" is a (n_devices,) per-device counter. Budget
            # off the FASTEST device: a min-based g_stop would livelock once
            # a finished device's counter freezes below a laggard's (the
            # laggard then never receives headroom), while max-based merely
            # lets a laggard run (spread + budget) slots in one dispatch —
            # bounded in practice (devices hold iid lanes) and self-healing
            # via the watchdog retry path (halve_epoch).
            g_v = _np.asarray(carry["g"]).reshape(-1)
            g_now = int(g_v.max())
            iters = max(g_now - g_prev, 1)
            g_prev = g_now
            per_slot = max(per_slot, wall / iters)
            ep_budget = int(
                max(256, min(4 * iters, target_seconds / max(per_slot, 1e-7)))
            )
            if log is not None:
                flushed = int(_np.asarray(carry["flushed"]).reshape(-1).min())
                elapsed = _time.perf_counter() - t_sample
                rate = flushed / max(elapsed, 1e-9)
                eta = (n_samples - flushed) / max(rate, 1e-9)
                log(
                    f"sampling[epoch]: {flushed}/{n_samples} draws flushed "
                    f"({elapsed:.1f}s, {g_now} slots, {rate:.1f} draws/s, "
                    f"~{eta:.1f}s left, next budget {ep_budget})"
                )
            if bool(_np.asarray(done).all()):
                break
        _PER_STEP_SEEN.setdefault(programs.sample_epoch, {})[cost_key_ep] = (
            per_slot
        )
        Q, qs, lds, stats = programs.sample_epoch_finish(carry)
        if draw_sink is not None:
            draw_sink(0, qs, lds, stats)
            pieces = [((None, None, stats),)]
        else:
            pieces = [((qs, lds, stats),)]
        pieces_perm = None
    else:
        metric_ret, eps_ret = metric, eps
        perm_only_inv = None
        if permute_only:
            # Mesh-stratified sampling by PERMUTATION: sort lanes by adapted
            # eps so each device's contiguous shard holds one eps band.
            # Under shard_map every device already bounds its lockstep tree
            # loop by its OWN local lanes (the while-loop condition is a
            # local `any`; no cross-device depth sync exists), so the sort
            # alone yields group-per-device stratification — the deepest
            # min-eps lanes stall only their own device. One jitted
            # permutation in, lane order restored by the assembly.
            Q, eps, metric, perm_only_inv = _eps_sort_state(
                Q, eps, metric, metric_is_batched(metric)
            )
            if log is not None:
                log("sampling: lanes eps-sorted (mesh stratification)")
        n_chunks = -(-n_samples // programs.sample_chunk)
        pieces = []
        if log is not None:
            log(f"sampling setup: {_time.perf_counter() - t_start:.2f}s since start")
        next_ess_check = None
        if ess_target is not None:
            next_ess_check = (
                int(ess_check_start) if ess_check_start > 0
                else max(programs.sample_chunk, 64)
            )
        t_sample = _time.perf_counter()
        for c in range(n_chunks):
            def run_sample(Q_in=Q, c_in=c):
                out = programs.sample(
                    sample_key, Q_in, metric, eps,
                    jnp.int32(c_in * programs.sample_chunk),
                )
                jax.block_until_ready(out[2])
                return out

            Q, qs, lds, stats = _retry_dispatch(
                run_sample, log=log, what="sampling dispatch"
            )
            if draw_sink is not None:
                if perm_only_inv is not None:
                    # restore the caller's lane order before anything leaves
                    qs, lds, stats = _regroup_lanes(
                        ((qs, lds, stats),), perm_only_inv
                    )
                draw_sink(c * programs.sample_chunk, qs, lds, stats)
                pieces.append(((None, None, stats),))
            else:
                pieces.append(((qs, lds, stats),))
            done = min((c + 1) * programs.sample_chunk, n_samples)
            if log is not None:
                jax.block_until_ready(lds)
                elapsed = _time.perf_counter() - t_sample
                eta = (n_samples - done) * elapsed / max(done, 1)
                log(
                    f"sampling: {done}/{n_samples} ({elapsed:.1f}s, "
                    f"{done / max(elapsed, 1e-9):.1f} draws/s, "
                    f"~{eta:.1f}s left)"
                )
            if (
                next_ess_check is not None
                and done >= next_ess_check
                and done < n_samples
            ):
                from .stats_device import ess_rhat_device

                qs_acc = _concat_draws(
                    tuple(p[0][0] for p in pieces), done, axis
                )
                # pooled-over-chains bulk ESS is invariant to the lane
                # permutation an eps-sorted (permute_only) state carries
                min_ess = float(
                    jnp.min(ess_rhat_device(qs_acc)["ess_bulk"])
                )
                if log is not None:
                    log(
                        f"ess check @ {done} draws: min bulk ESS "
                        f"{min_ess:.0f} (target {ess_target:g})"
                    )
                if min_ess >= ess_target:
                    n_samples = done
                    break
                next_ess_check = max(
                    done + 1, int(done * ess_check_factor)
                )
        if perm_only_inv is not None:
            Q = _regroup_q((Q,), perm_only_inv)
            metric, eps = metric_ret, eps_ret
            pieces_perm = None if draw_sink is not None else perm_only_inv
        else:
            pieces_perm = None

    # ONE jitted dispatch assembles every chunk (and, stratified, every
    # group) and restores lane order: doing this with eager ops measured
    # 4.7 s of tunnel RPCs on the headline config vs ~0.2 s jitted.
    t_asm = _time.perf_counter()
    positions, logdensities, stats = _assemble_pieces(
        tuple(pieces), pieces_perm, n_samples, axis
    )
    if log is not None:
        jax.block_until_ready(stats)
        log(
            f"chunk assembly: {_time.perf_counter() - t_asm:.2f}s "
            f"({_time.perf_counter() - t_start:.2f}s since start)"
        )
    inference = (Q, positions, logdensities, stats)
    return metric, eps, search_results, summaries, inference


# --- batch-native drivers (tree_batched.py) -------------------------------------
#
# The batch-native transition operates on (C, ...) arrays directly with scalar
# loop counters (see tree_batched.py). These drivers mirror the per-chain ones
# above but need no vmap: shard_map wraps them directly, per-chain vs pooled
# metrics are distinguished by array rank, and the Welford fold is written
# batched.


def welford_update_b(state: WelfordState, x):
    """Batched per-chain Welford update: x (C, K), m2 (C, K) or (C, K, K)."""
    count = state.count + 1
    delta = x - state.mean
    mean = state.mean + delta / count[..., None]
    delta2 = x - mean
    if state.m2.ndim == 3:
        m2 = state.m2 + jnp.einsum("ci,cj->cij", delta, delta2)
    else:
        m2 = state.m2 + delta * delta2
    return WelfordState(count=count, mean=mean, m2=m2)


def welford_update_pooled_b(state: WelfordState, x):
    """SHARED Welford update over a chain batch (Chan et al. parallel
    combine, one batch of C draws per step): state is unbatched — count
    scalar, mean (K,), m2 (K,) or (K, K) — so pooled dense adaptation costs
    O(K^2) memory instead of O(C K^2), and the per-step cross-chain moment
    is one (K, C) @ (C, K) MXU matmul."""
    c = x.shape[0]
    batch_mean = x.mean(axis=0)
    xc = x - batch_mean
    count_new = state.count + c
    delta = batch_mean - state.mean
    mean = state.mean + (c / count_new) * delta
    corr = state.count * c / count_new
    if state.m2.ndim == 2:
        batch_m2 = xc.T @ xc
        m2 = state.m2 + batch_m2 + corr * jnp.outer(delta, delta)
    else:
        batch_m2 = jnp.sum(xc * xc, axis=0)
        m2 = state.m2 + batch_m2 + corr * delta * delta
    return WelfordState(count=count_new, mean=mean, m2=m2)


def welford_zero_shared(dim: int, dense: bool, dtype) -> WelfordState:
    return WelfordState(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim, dim) if dense else (dim,), dtype),
    )


def make_search_driver_batched(ld: LogDensity, params: InitialStepsizeSearch):
    """(key, Q, metric) -> (eps (C,), success (C,), l0 (C,)) for a whole
    batch; ``l0`` feeds the host-side non-finite-start guard
    (stepsize.jl:77-79 semantics, see ``_check_stepsize_search``)."""
    from .tree_batched import _Edge, _joint_b, _leapfrog_b, rand_p_b

    def search(key, Q: EvaluatedPoint, metric: Metric):
        c, k = Q.q.shape
        dtype = Q.q.dtype
        p = rand_p_b(key, metric, (c, k), dtype)
        z = _Edge(q=Q.q, p=p, grad=Q.grad, ld=Q.logdensity)
        l0 = _joint_b(metric, z.ld, z.p)

        def A(eps):
            z1 = _leapfrog_b(ld, metric, z, eps)
            return _joint_b(metric, z1.ld, z1.p) - l0

        thr = params.log_threshold
        eps0 = jnp.full((c,), params.initial_eps, dtype)
        a0 = A(eps0)
        double = a0 > thr

        def cond(s):
            return jnp.any(~s["found"]) & (s["it"] < params.maxiter_crossing)

        def body(s):
            eps_new = jnp.where(double, s["eps"] * 2, s["eps"] / 2)
            eps_new = jnp.where(s["found"], s["eps"], eps_new)
            a_new = A(eps_new)
            crossed = jnp.where(double, a_new < thr, a_new > thr) & ~s["found"]
            return {
                "eps": eps_new,
                "found": s["found"] | crossed,
                "it": s["it"] + 1,
            }

        out = jax.lax.while_loop(
            cond,
            body,
            {"eps": eps0, "found": jnp.zeros((c,), bool), "it": jnp.int32(0)},
        )
        return out["eps"], out["found"], l0

    return search


def make_stage_driver_batched(
    ld: LogDensity,
    algorithm: NUTS,
    adaptation,
    dense_welford: bool,
    pooled_welford: bool = False,
    use_welford: bool = True,
):
    """Batch-native resumable tuning-stage program; same contract as
    make_stage_driver but the whole batch advances in one transition call.
    With ``pooled_welford`` the moment accumulator is shared across the
    batch (O(K^2) memory, Chan parallel update). ``use_welford=False`` builds
    the variant for eps-only blocks: their moments are discarded, and the
    per-chain dense accumulator is a (C, K, K) read+write per transition —
    skipping it is a large HBM saving on metric-free blocks."""
    from .tree_batched import (
        make_tree_scratch,
        make_tree_stack_refs,
        sample_tree_batched,
        use_ref_stack,
    )

    if use_welford:
        wf_update = welford_update_pooled_b if pooled_welford else welford_update_b
    else:
        def wf_update(wf, _x):
            return wf

    def stage(key, Q: EvaluatedPoint, metric: Metric, da_state, welford, start_i, n_steps):
        c, k = Q.q.shape
        dtype = Q.q.dtype
        refs = (
            make_tree_stack_refs(algorithm, metric, c, k, dtype)
            if use_ref_stack() else None
        )

        def cond(carry):
            return carry["i"] < start_i + n_steps

        def body(carry):
            step_key = jax.random.fold_in(key, carry["i"])
            eps = adaptation.current(carry["da"])
            if refs is not None:
                Q_new, stats = sample_tree_batched(
                    step_key, algorithm, ld, metric, carry["Q"], eps,
                    stack_ref=refs,
                )
                scratch = None
            else:
                Q_new, stats, scratch = sample_tree_batched(
                    step_key, algorithm, ld, metric, carry["Q"], eps,
                    scratch=carry["scratch"],
                )
            da = adaptation.update(carry["da"], stats.acceptance_rate)
            wf = wf_update(carry["wf"], Q_new.q)
            new_carry = {
                "i": carry["i"] + 1,
                "Q": Q_new,
                "da": da,
                "wf": wf,
                "acc_sum": carry["acc_sum"] + stats.acceptance_rate,
                "div": carry["div"] + stats.is_divergent.astype(jnp.int32),
                "steps": carry["steps"] + stats.steps,
                "maxd": carry["maxd"] + stats.reached_max_depth.astype(jnp.int32),
                "work": carry["work"] + stats.work,
            }
            if refs is None:
                new_carry["scratch"] = scratch
            return new_carry

        init = {
            "i": jnp.asarray(start_i, jnp.int32),
            "Q": Q,
            "da": da_state,
            "wf": welford,
            "acc_sum": jnp.zeros((c,), dtype),
            "div": jnp.zeros((c,), jnp.int32),
            "steps": jnp.zeros((c,), jnp.int32),
            "maxd": jnp.zeros((c,), jnp.int32),
            "work": jnp.zeros((c,), jnp.int32),
        }
        if refs is None:
            init["scratch"] = make_tree_scratch(algorithm, metric, c, k, dtype)
        out = jax.lax.while_loop(cond, body, init)
        totals = {
            "acc_sum": out["acc_sum"],
            "div": out["div"],
            "steps": out["steps"],
            "maxd": out["maxd"],
            "work": out["work"],
        }
        return out["Q"], out["da"], out["wf"], totals

    return stage


def promote_metric(metric, kind: str):
    """Promote an initial diagonal/identity metric to the dense
    representation so the monolithic warmup carry is type-stable (the first
    dense re-estimate must not change the pytree structure). Numerically a
    no-op: M^-1 = diag(d) gives the same dynamics either way."""
    from .metric import DiagonalMetric, dense_metric

    if kind != "dense" or not isinstance(metric, DiagonalMetric):
        return metric
    m = metric.m_inv
    if m.ndim == 1:
        return dense_metric(jnp.diag(m))
    return jax.vmap(lambda d: dense_metric(jnp.diag(d)))(m)


def make_monolithic_warmup_driver(
    ld: LogDensity, algorithm: NUTS, schedule: "WarmupSchedule",
    mesh_axis=None,
):
    """ONE compiled program for the ENTIRE staged warmup (batch-native).

    The per-block host loop costs a device dispatch per block plus one per
    metric update — ~13 tunnel round-trips on the default schedule, measured
    at several seconds through a tunneled chip. Here the block structure is
    compiled in: a single while_loop over the GLOBAL transition index with
    boundary bookkeeping (dual-averaging restart at every block boundary,
    metric re-estimate + Welford reset at metric blocks, both under
    ``lax.cond`` so the (C,K,K) work happens only at the ~6 boundaries).

    (key, Q, metric, da, wf, eps_run, start_i, n_steps) ->
        (Q', metric', da', wf', eps_run', totals)

    ``eps_run`` carries the most recent block's final stepsize (the value
    the NEXT block re-initializes from, and — after the last boundary — the
    sampling stepsize). Step keys are fold_in(key, global_i): host chunking
    at any granularity is bitwise reproducible. Requires a type-stable
    metric carry: promote the initial metric with :func:`promote_metric`.

    Replicates the reference's stage fold semantics (mcmc.jl:450-457,
    TuningNUTS mcmc.jl:258-286) with runtime trip counts.
    """
    from .tree_batched import (
        make_tree_scratch,
        make_tree_stack_refs,
        sample_tree_batched,
        use_ref_stack,
    )

    adaptation = schedule.adaptation
    sizes = schedule.block_sizes
    cums = []
    acc = 0
    for s in sizes:
        acc += s
        cums.append(acc)
    cums = tuple(cums)
    update_metric = schedule.update_metric
    shrinkages = schedule.shrinkages
    kind = schedule.metric_kind
    pooled = schedule.pooled
    wf_upd = welford_update_pooled_b if pooled else welford_update_b
    # depth clamp: active through every block except the last (see
    # WarmupSchedule.depth_clamp); None disables it at trace time
    clamp = schedule.depth_clamp
    clamp_until = cums[-2] if len(cums) > 1 else 0
    if clamp is not None and schedule.depth_clamp_tail:
        # clamp the head of the final block too (DA-restart transient);
        # never the whole block — the tail must re-adapt eps unclamped
        clamp_until = min(
            clamp_until + int(schedule.depth_clamp_tail),
            cums[-1] - 1,
        )

    def in_metric_block(i):
        flag = jnp.zeros((), bool)
        lo = 0
        for b, hi in enumerate(cums):
            if update_metric[b]:
                flag |= (i >= lo) & (i < hi)
            lo = hi
        return flag

    def warmup(key, Q: EvaluatedPoint, metric, da, wf, eps_run, start_i, n_steps):
        c0 = Q.q.shape[0]
        dtype = Q.q.dtype
        k0 = Q.q.shape[1]
        refs = (
            make_tree_stack_refs(algorithm, metric, c0, k0, dtype)
            if use_ref_stack() else None
        )

        def cond(c):
            return c["i"] < start_i + n_steps

        def body(c):
            i = c["i"]
            step_key = jax.random.fold_in(key, i)
            eps = adaptation.current(c["da"])
            if clamp is None:
                dl = None
            else:
                dl = jnp.where(
                    i < clamp_until, jnp.int32(clamp),
                    jnp.int32(algorithm.max_depth),
                )
            if refs is not None:
                Q_new, stats = sample_tree_batched(
                    step_key, algorithm, ld, c["metric"], c["Q"], eps,
                    stack_ref=refs, depth_limit=dl,
                )
                scratch = None
            else:
                Q_new, stats, scratch = sample_tree_batched(
                    step_key, algorithm, ld, c["metric"], c["Q"], eps,
                    scratch=c["scratch"], depth_limit=dl,
                )
            da = adaptation.update(c["da"], stats.acceptance_rate)
            wf = jax.lax.cond(
                in_metric_block(i),
                lambda w: wf_upd(w, Q_new.q),
                lambda w: w,
                c["wf"],
            )

            i_new = i + 1
            hit = jnp.zeros((), bool)
            met_hit = jnp.zeros((), bool)
            lam = jnp.zeros((), dtype)
            for b, cum in enumerate(cums):
                h = i_new == cum
                hit = hit | h
                if update_metric[b]:
                    met_hit = met_hit | h
                    lam = jnp.where(h, jnp.asarray(shrinkages[b], dtype), lam)
            eps_b = adaptation.final(da)
            eps_run = jax.tree_util.tree_map(
                lambda new, old: jnp.where(hit, new, old), eps_b, c["eps_run"]
            )
            da = jax.tree_util.tree_map(
                lambda new, old: jnp.where(hit, new, old),
                adaptation.init(eps_b),
                da,
            )

            def do_metric(args):
                wf_in, _metric_in = args
                if kind == "none":
                    new_metric = _metric_in
                elif pooled:
                    # under a mesh each shard holds a locally-pooled Welford
                    # state; Chan-combine across devices (pmean/psum on ICI)
                    # so every shard estimates the SAME shared metric
                    wf_c = (
                        pool_welford_over_axis(wf_in, mesh_axis)
                        if mesh_axis is not None
                        else wf_in
                    )
                    new_metric = estimate_metric(wf_c, kind, lam, None)
                else:
                    new_metric = jax.vmap(
                        lambda w: estimate_metric(w, kind, lam, None)
                    )(wf_in)
                wf0 = jax.tree_util.tree_map(jnp.zeros_like, wf_in)
                return wf0, new_metric

            wf, metric = jax.lax.cond(
                met_hit, do_metric, lambda args: args, (wf, c["metric"])
            )

            new_c = {
                "i": i_new,
                "Q": Q_new,
                "metric": metric,
                "da": da,
                "wf": wf,
                "eps_run": eps_run,
                "acc_sum": c["acc_sum"] + stats.acceptance_rate,
                "div": c["div"] + stats.is_divergent.astype(jnp.int32),
                "steps": c["steps"] + stats.steps,
                "maxd": c["maxd"] + stats.reached_max_depth.astype(jnp.int32),
                "work": c["work"] + stats.work,
            }
            if refs is None:
                new_c["scratch"] = scratch
            return new_c

        init = {
            "i": jnp.asarray(start_i, jnp.int32),
            "Q": Q,
            "metric": metric,
            "da": da,
            "wf": wf,
            "eps_run": eps_run,
            "acc_sum": jnp.zeros((c0,), dtype),
            "div": jnp.zeros((c0,), jnp.int32),
            "steps": jnp.zeros((c0,), jnp.int32),
            "maxd": jnp.zeros((c0,), jnp.int32),
            "work": jnp.zeros((c0,), jnp.int32),
        }
        if refs is None:
            init["scratch"] = make_tree_scratch(algorithm, metric, c0, k0, dtype)
        out = jax.lax.while_loop(cond, body, init)
        totals = {
            "acc_sum": out["acc_sum"],
            "div": out["div"],
            "steps": out["steps"],
            "maxd": out["maxd"],
            "work": out["work"],
        }
        return (
            out["Q"], out["metric"], out["da"], out["wf"], out["eps_run"],
            totals,
        )

    return warmup


def make_sampling_driver_batched(ld: LogDensity, algorithm: NUTS, chunk: int):
    """Batch-native fixed-size sampling chunk; same contract as
    make_sampling_driver but positions stack as (chunk, C, K) and are
    transposed to (C, chunk, K) on return."""
    from .tree_batched import (
        make_tree_scratch,
        make_tree_stack_refs,
        sample_tree_batched,
        use_ref_stack,
    )

    def sample(key, Q: EvaluatedPoint, metric: Metric, eps, start_i):
        refs = (
            make_tree_stack_refs(
                algorithm, metric, Q.q.shape[0], Q.q.shape[1], Q.q.dtype
            )
            if use_ref_stack() else None
        )

        def step(carry, j):
            Q, scratch = carry
            step_key = jax.random.fold_in(key, start_i + j)
            if refs is not None:
                Q_new, stats = sample_tree_batched(
                    step_key, algorithm, ld, metric, Q, eps, stack_ref=refs
                )
            else:
                Q_new, stats, scratch = sample_tree_batched(
                    step_key, algorithm, ld, metric, Q, eps, scratch=scratch
                )
            return (Q_new, scratch), (Q_new.q, Q_new.logdensity, stats)

        scratch0 = (
            None
            if refs is not None
            else make_tree_scratch(
                algorithm, metric, Q.q.shape[0], Q.q.shape[1], Q.q.dtype
            )
        )
        (Q_final, _), (qs, lds, stats) = jax.lax.scan(
            step, (Q, scratch0), jnp.arange(chunk, dtype=jnp.int32)
        )
        # scan stacks on axis 0 -> (chunk, C, ...); present as (C, chunk, ...)
        qs = jnp.swapaxes(qs, 0, 1)
        lds = jnp.swapaxes(lds, 0, 1)
        stats = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 0, 1), stats)
        return Q_final, qs, lds, stats

    return sample


def build_programs_batched(
    ld: LogDensity,
    algorithm: NUTS,
    schedule: WarmupSchedule,
    wrap: Callable[[Callable, str], Callable],
    sample_chunk: int = 8,
    mesh_axis=None,
    wf_leading: int = 0,
    wavefront: bool = False,
    monolithic: bool = False,
    stratify: int = 0,
    stratify_chunk: int = 0,
    epoch_samples: int = 0,
    epoch_ring: int = 8,
    wavefront_mesh_axis=None,
):
    """Batch-native program bundle. ``wrap(fn, kind)`` applies shard_map/jit
    (no vmap needed). Pooled vs per-chain metrics are carried by array rank;
    the metric update pools over the leading chain axis (+ mesh psum).
    ``wavefront=True`` additionally builds the aligned wavefront warmup
    programs (tree_wavefront.py; under a mesh each device runs its own
    wavefront over its local lanes); ``monolithic=True`` builds the
    whole-warmup single program that execute() prefers. ``epoch_samples>0``
    builds the epoch-wavefront sampling programs (tree_wavefront_epoch.py,
    draw count baked in) that execute() prefers over the chunked
    synchronized sampler."""
    search = None
    if schedule.search is not None:
        search = wrap(make_search_driver_batched(ld, schedule.search), "search")
    dense = schedule.metric_kind == "dense"
    stage = wrap(
        make_stage_driver_batched(
            ld,
            algorithm,
            schedule.adaptation,
            dense_welford=dense,
            pooled_welford=schedule.pooled,
        ),
        "stage",
    )
    stage_nowf = None
    if not all(schedule.update_metric):
        stage_nowf = wrap(
            make_stage_driver_batched(
                ld,
                algorithm,
                schedule.adaptation,
                dense_welford=dense,
                pooled_welford=schedule.pooled,
                use_welford=False,
            ),
            "stage",
        )
    stage_wavefront = stage_wavefront_nowf = winit = None
    if wavefront:
        from .stepsize import PooledStepsize
        from .tree_wavefront import make_wavefront_stage_driver, wavefront_init

        pooled_eps = isinstance(schedule.adaptation, PooledStepsize)

        # the epochal pooled-eps collective pools over the MESH axis whenever
        # one exists — independent of whether the METRIC is pooled (which is
        # what `mesh_axis` tracks)
        wf_eps_axis = wavefront_mesh_axis if pooled_eps else None
        stage_wavefront = wrap(
            make_wavefront_stage_driver(
                ld, algorithm, schedule.adaptation,
                pooled_welford=schedule.pooled, pooled_eps=pooled_eps,
                mesh_axis=wf_eps_axis,
            ),
            "wavefront",
        )
        if not all(schedule.update_metric):
            stage_wavefront_nowf = wrap(
                make_wavefront_stage_driver(
                    ld, algorithm, schedule.adaptation,
                    pooled_welford=schedule.pooled, use_welford=False,
                    pooled_eps=pooled_eps,
                    mesh_axis=wf_eps_axis,
                ),
                "wavefront",
            )

        def winit_fn(Q, metric, da, wf):
            return wavefront_init(Q, metric, da, wf, algorithm.max_depth)

        winit = wrap(winit_fn, "wavefront_init")
    warmup_mono = None
    if monolithic and not wavefront:
        warmup_mono = wrap(
            make_monolithic_warmup_driver(
                ld, algorithm, schedule, mesh_axis=mesh_axis
            ),
            "warmup_mono",
        )
    metric_updates = {}
    if schedule.metric_kind != "none":
        for lam in sorted(set(schedule.shrinkages)):
            if schedule.pooled:
                # the Welford state is already pooled across each device's
                # local batch; combine the per-device states (leading axis)
                # or pass through when single-device
                def make_update(lam=lam):
                    def update(wf: WelfordState) -> Metric:
                        combined = wf
                        if wf_leading:
                            combined = combine_welford_batch(combined)
                        return estimate_metric(
                            combined, schedule.metric_kind, lam, None
                        )

                    return update

                metric_updates[lam] = wrap(make_update(), "metric_shared")
            else:
                updater = make_metric_update(schedule.metric_kind, lam, None)
                metric_updates[lam] = wrap(jax.vmap(updater), "metric")
    sample = wrap(make_sampling_driver_batched(ld, algorithm, sample_chunk), "sample")
    sample_epoch = epoch_init = epoch_finish = None
    if epoch_samples > 0:
        from .tree_wavefront_epoch import (
            epoch_sampling_finish,
            epoch_sampling_init,
            make_epoch_sampling_driver,
        )

        sample_epoch = wrap(
            make_epoch_sampling_driver(
                ld, algorithm, epoch_samples, ring=epoch_ring
            ),
            "sample_epoch",
        )

        def einit_fn(Q, metric):
            return epoch_sampling_init(
                Q, metric, epoch_samples, algorithm.max_depth, ring=epoch_ring
            )

        epoch_init = wrap(einit_fn, "sample_epoch_init")
        epoch_finish = wrap(
            lambda carry: epoch_sampling_finish(carry, epoch_samples),
            "sample_epoch_finish",
        )
    return FastPrograms(
        search=search,
        stage=stage,
        metric_updates=metric_updates,
        sample=sample,
        sample_chunk=sample_chunk,
        dense_welford=dense,
        adaptation=schedule.adaptation,
        pooled_welford=schedule.pooled,
        wf_leading=wf_leading,
        stage_nowf=stage_nowf,
        stage_wavefront=stage_wavefront,
        stage_wavefront_nowf=stage_wavefront_nowf,
        wavefront_init=winit,
        warmup_mono=warmup_mono,
        sample_stratified=(
            wrap(
                make_sampling_driver_batched(
                    ld, algorithm,
                    stratify_chunk or sample_chunk * stratify,
                ),
                "sample_stratified",
            )
            if stratify and stratify > 1
            else None
        ),
        stratified_chunk=(
            (stratify_chunk or sample_chunk * stratify)
            if stratify and stratify > 1
            else 0
        ),
        sample_epoch=sample_epoch,
        sample_epoch_init=epoch_init,
        sample_epoch_finish=epoch_finish,
    )
