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

import functools

from ..engine import WarmupSchedule, build_programs, execute, metric_is_batched
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


@functools.lru_cache(maxsize=32)
def _default_init_program(ld: LogDensity, n_chains: int, dtype_name: str):
    """Fused default initialization: key split + uniform[-2,2] positions +
    batched evaluate as ONE jitted program (cached per (model, C, dtype))."""
    dtype = jnp.dtype(dtype_name)

    @jax.jit
    def f(key):
        keys = jax.random.split(key, n_chains)
        q = jax.vmap(lambda k: random_position(k, ld.dim, dtype))(keys)
        return jax.vmap(lambda qq: evaluate(ld, qq))(q)

    return f


def init_chain_states(
    key: jax.Array,
    ld: LogDensity,
    n_chains: int,
    q: Optional[jnp.ndarray] = None,
    metric: Optional[Metric] = None,
    eps=None,
    dtype=jnp.float32,
    broadcast_metric: bool = True,
) -> WarmupState:
    """Batched initial warmup states: per-chain random positions in [-2, 2]^K
    (mcmc.jl:108), identity metric, optional shared eps.

    Performs the strict initial-point validation (mcmc.jl:131) host-side over
    the whole batch and raises ``DynamicHMCError`` naming the bad chains.

    ``broadcast_metric=False`` keeps a shared (unbatched) metric as-is —
    pooled-adaptation runs slice the per-chain broadcast straight back to
    one copy, and eagerly materializing a (C, K, K) dense metric at fleet
    scale (~320 MB at 8192x100 f32) wastes exactly the HBM headroom that
    bounds the maximum chain count. A user-supplied per-chain metric passes
    through unchanged either way.
    """
    if q is None:
        # ONE fused dispatch (key split + positions + evaluate): the eager
        # three-dispatch chain serialized ~0.7 s of tunnel RPC latency into
        # the timed window (the strict-validation transfer below blocks on
        # the whole pipeline)
        Q = _default_init_program(ld, n_chains, jnp.dtype(dtype).name)(key)
    else:
        q = jnp.asarray(q, dtype)
        if q.shape != (n_chains, ld.dim):
            raise ValueError(
                f"q must have shape {(n_chains, ld.dim)}, got {q.shape}"
            )
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
    if broadcast_metric and not metric_is_batched(metric):
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
    algorithm: Optional[NUTS] = None,
    dtype=jnp.float32,
    tune: str = "auto",
    mesh: Optional[Mesh] = None,
    log=None,
    draw_sink=None,
    reporter=None,
    warmup_driver: str = "sync",
    sampling_driver: str = "sync",
    stratify_sampling: int = 0,
    warmup_depth_clamp: Optional[int] = None,
    warmup_depth_clamp_tail: int = 0,
    sample_chunk: Optional[int] = None,
    epoch_ring: int = 8,
    warmup_checkpoint_sink=None,
    warmup_resume=None,
    ess_target: Optional[float] = None,
    ess_check_start: int = 0,
    ess_check_factor: float = 2.0,
) -> MCMCResult:
    """Run ``n_chains`` independently-warmed NUTS chains, batched on device.

    ``tune="auto"`` (default) fills every knob the caller left unspecified
    from the measured decision table in :mod:`~dynamichmc_tpu.autotune`
    (keyed on n_chains and the target dimension): metric structure and
    pooling in the default warmup stages, per-chain vs pooled stepsize,
    the warmup depth clamp, and — for large lockstep fleets — a sampling
    ``max_depth`` cap (an ordinary NUTS parameter; Stan's treedepth). Each
    applied choice is logged through the reporter, explicit arguments
    always win (``algorithm=NUTS()`` pins the reference kernel;
    ``warmup_depth_clamp=0`` explicitly disables the clamp), and a
    post-run warning fires if an auto-applied depth cap saturates (> 20%
    of draws at the cap — mixing, not exactness, is what a too-small cap
    costs). ``tune="reference"`` reproduces the reference's semantics for
    every unspecified knob: per-chain diagonal metric, per-chain dual
    averaging, max_depth 10, no clamps (NUTS.jl:178-195, mcmc.jl:415-425).

    ``ess_target``: sample until converged — the batched-engine form of the
    reference's stepwise run-until-criterion pattern
    (/root/reference/src/mcmc.jl:320-333). After selected sampling-chunk
    boundaries the accumulated draws' min-over-parameters pooled bulk ESS
    is evaluated on device; once it reaches the target, sampling stops and
    the result holds exactly the draws taken (``n_samples`` becomes the
    cap, so ``positions`` has shape (n_chains, n_drawn <= n_samples, K)).
    ``ess_check_start`` sets the first checked draw count (0 -> the first
    chunk boundary >= max(sample_chunk, 64)); later checks space
    geometrically by ``ess_check_factor`` (default 2.0 — each distinct
    cumulative draw count compiles its own ESS program, so the default
    bounds compiles to O(log); 1.0 checks every chunk boundary). Sync
    sampling driver only; incompatible with ``draw_sink`` and group-serial
    ``stratify_sampling`` (mesh stratification is fine).

    ``warmup_checkpoint_sink``: called with an
    :class:`~dynamichmc_tpu.engine.WarmupCheckpoint` at every warmup dispatch
    boundary (persist with ``checkpoint.save_state``); ``warmup_resume``
    continues a run from such a checkpoint — same (model, stages, key,
    n_chains) — with draws bitwise identical to the uninterrupted run.
    Monolithic fast warmup (sync driver, batch-native) only.

    ``sample_chunk``: draws per sampling dispatch (default: memory-bound,
    <= 512). The chunk length is BAKED into the compiled sampling program,
    so — unlike every warmup loop, whose trip counts are runtime operands —
    a sampling dispatch that exceeds the ~60 s TPU watchdog cannot be
    shrunk by the retry path; pass a smaller chunk for targets whose
    near-max-depth trees make 512 draws exceed the watchdog.

    Without ``mesh``: one chip, chains vmapped. With ``mesh``: the chain axis
    is sharded over the mesh's '{CHAIN_AXIS}' axis via shard_map; n_chains
    must be divisible by the mesh size.

    ``reporter=None`` means ``default_reporter()`` (interactive sessions get
    stage-boundary progress via the engine's ``log`` hook, else silent); an
    explicit ``log`` callable takes precedence.

    ``warmup_driver``: 'sync' (lockstep batch-native transitions) or
    'wavefront' (desynchronized aligned-wavefront warmup, tree_wavefront.py —
    removes the straggler tax when tree depths vary across chains). Under a
    ``mesh`` each device runs its own wavefront over its local lanes
    (per-device slot counters, zero cross-device sync inside the loop with
    per-chain stepsizes; pooled stepsize runs epoch-lockstep — devices
    synchronize at aligned global-counter boundaries where one psum pools
    the acceptance signal for the shared dual-averaging update).

    ``sampling_driver``: 'sync' (lockstep batch-native transitions, chunked
    dispatches) or 'epoch' (epoch-specialized wavefront,
    tree_wavefront_epoch.py — desynchronized transition lifecycles with
    per-draw ring recording; amortizes the per-transition fixed cost AND
    the max-over-lanes straggler tax; measured 1.3x at the headline config
    with per-chain adapted eps at reference-default max_depth). Identical
    per-transition semantics, slot-indexed RNG stream (the same documented
    batch-shape caveat all batch-native drivers carry). Under a ``mesh``
    each device runs its own epoch loop over its local lanes (per-device
    slot/flush counters, zero cross-device communication — sampling never
    adapts). ``epoch_ring``: draw-ring rows = how many draws any lane may
    run ahead of the slowest (scheduling only; draws are byte-identical for
    any ring >= 2).

    ``stratify_sampling=G`` (G > 1, per-chain stepsizes): sort lanes by
    adapted eps after warmup so each group's lockstep tree loop is bounded
    by its OWN deepest lane instead of the global min-eps straggler
    (measured 58-90% of sampling leaf slots wasted on per-chain configs).
    Mesh-less: G contiguous groups sampled group-serially with a width-C/G
    program. With a mesh: pure lane permutation — eps-banded shards give
    group-per-device stratification with zero cross-device depth sync
    (shard_map bounds each device's lockstep loop by its local lanes
    already). Scheduling only; lane order of the returned draws is
    unchanged.

    Returns a batched :class:`MCMCResult` with ``positions`` of shape
    (n_chains, n_samples, K).
    """
    if log is None:
        from ..reporting import default_reporter, stage_log

        log = stage_log(default_reporter() if reporter is None else reporter)
    if tune not in ("auto", "reference"):
        raise ValueError("tune must be 'auto' or 'reference'")
    # warmup_depth_clamp=0 means "explicitly no clamp" (distinct from None,
    # which the autopilot may fill in)
    explicit_no_clamp = warmup_depth_clamp == 0
    if explicit_no_clamp:
        warmup_depth_clamp = None
    auto_capped_depth = None
    if tune == "auto":
        from ..autotune import auto_choices

        choices = auto_choices(
            n_chains, ld.dim,
            max_depth_limit=(
                algorithm.max_depth if algorithm is not None else 10
            ),
        )
        generalized = (
            algorithm is None
            or algorithm.turn_statistic_configuration == "generalized"
        )
        applied = []
        if algorithm is None:
            # auto-cap the tree depth ONLY when the autopilot also owns the
            # warmup stages (measured, round 5: the cap's safety depends on
            # fleet-pooled metric quality — the same kernel over a noisy
            # per-chain 64x64 metric estimate fails R-hat at 1.21; see
            # test_bench_kernel_semantics_bench_dim)
            if choices.max_depth is not None and warmup_stages is None:
                algorithm = NUTS(max_depth=choices.max_depth)
                auto_capped_depth = choices.max_depth
                applied.append(f"max_depth={choices.max_depth}")
            else:
                algorithm = NUTS()
        if warmup_stages is None and generalized:
            warmup_stages = default_warmup_stages(
                metric_kind=choices.metric_kind,
                pooled=choices.pooled_metric,
                pooled_stepsize=(
                    choices.pooled_stepsize and choices.pooled_metric
                ),
            )
            applied.append(
                ("pooled " if choices.pooled_metric else "per-chain ")
                + choices.metric_kind + " metric"
            )
            applied.append(
                "pooled eps"
                if choices.pooled_stepsize and choices.pooled_metric
                else "per-chain eps"
            )
        if (
            warmup_depth_clamp is None
            and not explicit_no_clamp
            and generalized
            and warmup_stages is not None
        ):
            sched_try = WarmupSchedule.from_stages(tuple(warmup_stages))
            if sched_try is not None and choices.warmup_depth_clamp:
                warmup_depth_clamp = min(
                    choices.warmup_depth_clamp, algorithm.max_depth
                )
                if warmup_depth_clamp_tail == 0:
                    warmup_depth_clamp_tail = min(
                        choices.warmup_depth_clamp_tail,
                        sched_try.block_sizes[-1] // 2,
                    )
                applied.append(
                    f"warmup clamp {warmup_depth_clamp}"
                    f"/{warmup_depth_clamp_tail}"
                )
        if applied and log is not None:
            log("autotune: " + ", ".join(applied))
    if algorithm is None:
        algorithm = NUTS()
    if warmup_stages is None:
        warmup_stages = default_warmup_stages()
    if mesh is not None:
        n_dev = mesh.devices.size
        if n_chains % n_dev:
            raise ValueError(
                f"n_chains={n_chains} not divisible by mesh size {n_dev}"
            )
    if warmup_driver not in ("sync", "wavefront"):
        raise ValueError("warmup_driver must be 'sync' or 'wavefront'")
    if sampling_driver not in ("sync", "epoch"):
        raise ValueError("sampling_driver must be 'sync' or 'epoch'")
    if sampling_driver == "epoch":
        if stratify_sampling:
            raise ValueError(
                "stratify_sampling is a scheduler for the synchronized "
                "sampler; the epoch driver already desynchronizes lanes"
            )
        if algorithm.turn_statistic_configuration != "generalized":
            raise NotImplementedError(
                "epoch sampling requires the batch-native drivers "
                "(generalized turn statistic)"
            )
    schedule = WarmupSchedule.from_stages(tuple(warmup_stages))
    init_key, run_key = jax.random.split(jnp.asarray(key))
    states = init_chain_states(
        init_key, ld, n_chains, dtype=dtype,
        # pooled adaptation keeps ONE shared metric: don't materialize the
        # (C, K, K) per-chain broadcast it would immediately slice back
        broadcast_metric=not (schedule is not None and schedule.pooled),
        **initialization,
    )
    chain_keys = jax.random.split(run_key, n_chains)
    if warmup_depth_clamp_tail and warmup_depth_clamp is None:
        raise ValueError(
            "warmup_depth_clamp_tail requires warmup_depth_clamp"
        )
    if warmup_depth_clamp is not None and schedule is None:
        # never drop a requested scheduling option on the floor: the scan-
        # based fallback path (heterogeneous stages) runs unclamped
        raise NotImplementedError(
            "warmup_depth_clamp requires a fast-engine-expressible warmup "
            "schedule (homogeneous TuningNUTS blocks; see "
            "WarmupSchedule.from_stages)"
        )
    if sampling_driver == "epoch" and schedule is None:
        raise NotImplementedError(
            "epoch sampling requires a fast-engine-expressible warmup "
            "schedule (homogeneous TuningNUTS blocks)"
        )
    if warmup_checkpoint_sink is not None or warmup_resume is not None:
        if schedule is None:
            raise NotImplementedError(
                "warmup checkpoint/resume requires a fast-engine-"
                "expressible warmup schedule (homogeneous TuningNUTS blocks)"
            )
        if warmup_driver != "sync":
            raise NotImplementedError(
                "warmup checkpoint/resume requires the sync (monolithic) "
                "warmup driver"
            )
        if algorithm.turn_statistic_configuration != "generalized":
            raise NotImplementedError(
                "warmup checkpoint/resume requires the batch-native drivers "
                "(generalized turn statistic)"
            )
    if schedule is None and (draw_sink is not None or stratify_sampling):
        # same never-silently-drop rule: the scan fallback keeps all draws
        # on device and never calls the sink (the user's store would stay
        # empty while the run "succeeds")
        raise NotImplementedError(
            "draw_sink / stratify_sampling require a fast-engine-"
            "expressible warmup schedule (homogeneous TuningNUTS blocks)"
        )
    if ess_target is not None:
        if schedule is None:
            raise NotImplementedError(
                "ess_target requires a fast-engine-expressible warmup "
                "schedule (homogeneous TuningNUTS blocks; the scan fallback "
                "samples a fixed n_samples in one program)"
            )
        if sampling_driver != "sync":
            raise NotImplementedError(
                "ess_target requires the sync sampling driver"
            )
        if stratify_sampling and mesh is None:
            raise NotImplementedError(
                "ess_target is incompatible with group-serial "
                "stratify_sampling (mesh stratification by permutation "
                "is supported)"
            )
    if warmup_driver == "wavefront" and schedule is None:
        raise NotImplementedError(
            "wavefront warmup requires a fast-engine-expressible warmup "
            "schedule (homogeneous TuningNUTS blocks)"
        )
    if (
        warmup_driver == "wavefront"
        and algorithm.turn_statistic_configuration != "generalized"
    ):
        raise NotImplementedError(
            "wavefront warmup requires the batch-native drivers "
            "(generalized turn statistic)"
        )
    if schedule is not None and warmup_depth_clamp is not None:
        # cap tree doublings during all warmup blocks but the last (see
        # WarmupSchedule.depth_clamp); sampling is never clamped
        if not (0 < warmup_depth_clamp <= algorithm.max_depth):
            raise ValueError(
                "warmup_depth_clamp must be in 1..max_depth"
            )
        if algorithm.turn_statistic_configuration != "generalized":
            raise NotImplementedError(
                "warmup_depth_clamp requires the batch-native drivers "
                "(generalized turn statistic)"
            )
        import dataclasses as _dc

        # the wavefront warmup honors the tail clamp per LANE: the final
        # block's first `tail` transitions of each lane run clamped via the
        # tail_steps runtime operand (tree_wavefront.stage), the per-lane
        # analogue of the monolithic driver's lockstep tail clamp
        schedule = _dc.replace(
            schedule,
            depth_clamp=warmup_depth_clamp,
            # optionally clamp the head of the final block too (the
            # DA-restart transient against the just-updated metric builds
            # the deepest trees of the whole warmup); the tail always
            # re-adapts eps under the unclamped kernel
            depth_clamp_tail=int(warmup_depth_clamp_tail),
        )
    def _warn_auto_cap(result: MCMCResult) -> MCMCResult:
        # post-run safety valve for the auto-applied sampling depth cap: a
        # saturated cap costs mixing (never exactness) — tell the user how
        # to lift it (one scalar device reduce; the result arrays are about
        # to be fetched anyway)
        if (
            auto_capped_depth is not None
            and n_samples > 0
            and result.tree_statistics is not None
        ):
            frac = float(
                jnp.mean(
                    (result.tree_statistics.depth >= auto_capped_depth)
                    .astype(jnp.float32)
                )
            )
            from ..autotune import CAP_SATURATION_WARN

            if frac > CAP_SATURATION_WARN and log is not None:
                log(
                    f"autotune WARNING: {100 * frac:.0f}% of draws hit the "
                    f"auto-applied max_depth={auto_capped_depth} cap — this "
                    "target builds genuinely deep trajectories, and the cap "
                    "is costing mixing. Pass algorithm=NUTS() (reference "
                    "max_depth 10) or tune='reference' and compare ESS."
                )
        return result

    if schedule is not None:
        return _warn_auto_cap(_run_chains_fast(
            schedule, ld, algorithm, n_samples, states, chain_keys, mesh,
            log=log, draw_sink=draw_sink,
            # custom turn statistics need the generic per-chain driver
            batched=algorithm.turn_statistic_configuration == "generalized",
            wavefront=warmup_driver == "wavefront",
            stratify_sampling=stratify_sampling,
            sample_chunk=sample_chunk,
            epoch_sampling=sampling_driver == "epoch",
            epoch_ring=epoch_ring,
            warmup_sink=warmup_checkpoint_sink,
            warmup_resume=warmup_resume,
            ess_target=ess_target,
            ess_check_start=ess_check_start,
            ess_check_factor=ess_check_factor,
        ))

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
        n_dev = mesh.devices.size  # divisibility validated at entry
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
    return _warn_auto_cap(MCMCResult(
        positions=inference.positions,
        logdensities=inference.logdensities,
        tree_statistics=inference.tree_statistics,
        metric=final_states.metric,
        eps=final_states.eps,
    ))


# --- fast path: shared dynamically-bounded stage program ------------------------


@functools.lru_cache(maxsize=32)
def _fast_programs(
    ld: LogDensity,
    algorithm: NUTS,
    schedule: WarmupSchedule,
    mesh: Optional[Mesh],
    sample_chunk: int = 8,
):
    """Build + cache the wrapped (vmap [+ shard_map] + jit) program bundle.

    One NUTS tree program for all warmup stages (runtime trip count) and one
    fixed-chunk sampling program — compile time is independent of both the
    number of stages and the number of draws.
    """
    local_axis = CHAIN_AXIS if mesh is None else LOCAL_CHAIN_AXIS
    chain_axis = (CHAIN_AXIS,) if mesh is None else (LOCAL_CHAIN_AXIS, CHAIN_AXIS)
    pooled = schedule.pooled
    # pooled mode keeps the metric UNBATCHED (shared by all chains): the tree
    # hot loop then reads one (K,)/(K,K) metric instead of a per-chain copy.
    metric_ax = None if pooled else 0
    in_axes_by_kind = {
        "search": (0, 0, metric_ax),
        "stage": (0, 0, metric_ax, 0, 0, None, None),
        "metric": (0,),
        "sample": (0, 0, metric_ax, 0, None),
    }

    def wrap(fn, kind):
        if kind == "metric_shared":
            # consumes the batched Welford states directly; pools internally
            # (plus one psum over the mesh axis when sharded); emits ONE
            # replicated metric.
            if mesh is not None:
                fn = jax.shard_map(
                    fn,
                    mesh=mesh,
                    in_specs=(P(CHAIN_AXIS),),
                    out_specs=P(),
                    check_vma=False,
                )
            return jax.jit(fn)
        in_axes = in_axes_by_kind[kind]
        f = jax.vmap(fn, in_axes=in_axes, axis_name=local_axis)
        if mesh is not None:
            in_specs = tuple(P(CHAIN_AXIS) if a == 0 else P() for a in in_axes)
            f = jax.shard_map(
                f,
                mesh=mesh,
                in_specs=in_specs,
                out_specs=P(CHAIN_AXIS),
                check_vma=False,
            )
        return jax.jit(f)

    return build_programs(
        ld,
        algorithm,
        schedule,
        chain_axis,
        wrap,
        sample_chunk=sample_chunk,
        shared_metric=pooled,
        mesh_axis=CHAIN_AXIS if (pooled and mesh is not None) else None,
    )


def _run_chains_fast(
    schedule: WarmupSchedule,
    ld: LogDensity,
    algorithm: NUTS,
    n_samples: int,
    states: WarmupState,
    chain_keys,
    mesh: Optional[Mesh],
    log=None,
    draw_sink=None,
    batched: bool = True,
    wavefront: bool = False,
    stratify_sampling: int = 0,
    sample_chunk: Optional[int] = None,
    epoch_sampling: bool = False,
    epoch_ring: int = 8,
    warmup_sink=None,
    warmup_resume=None,
    ess_target: Optional[float] = None,
    ess_check_start: int = 0,
    ess_check_factor: float = 2.0,
) -> MCMCResult:
    from ..stepsize import PooledStepsize

    if stratify_sampling and not batched:
        raise NotImplementedError(
            "stratify_sampling requires the batch-native path"
        )
    if stratify_sampling and isinstance(schedule.adaptation, PooledStepsize):
        # stratification sorts lanes by ADAPTED PER-CHAIN eps; with a
        # shared eps there is nothing to sort and execute would silently
        # run unstratified
        raise ValueError(
            "stratify_sampling requires per-chain stepsize adaptation "
            "(pooled_stepsize=False)"
        )
    if not batched and isinstance(schedule.adaptation, PooledStepsize):
        # the generic per-chain driver vmaps the DA state with in_axes=0;
        # PooledStepsize collapses it to one scalar state — unguarded, this
        # surfaces as an opaque vmap rank error at the warm dispatch
        raise NotImplementedError(
            "pooled stepsize adaptation requires the batch-native drivers "
            "(generalized turn statistic)"
        )
    # Under a mesh, stratification is a lane PERMUTATION (sort by adapted
    # eps): shard_map already bounds each device's lockstep loop by its own
    # local lanes, so eps-banded shards give group-per-device stratification
    # with zero cross-device depth sync and no extra programs. The
    # group-serial G-way path below stays mesh-less.
    stratify_mesh = bool(stratify_sampling) and mesh is not None
    if stratify_mesh:
        stratify_sampling = 0
    if batched:
        # Dispatch-overhead amortization: each device dispatch pays a fixed
        # RPC/launch cost (hundreds of ms through a tunneled chip), so draw
        # chunks are sized as large as memory comfortably allows — target
        # <= ~1 GB of positions per chunk at f32 (the whole 512-draw
        # headline run fits one dispatch; transient doubling at the
        # draw-major -> chain-major transpose stays well under HBM).
        c, k = states.Q.q.shape
        if sample_chunk is None:
            sample_chunk = int(max(8, min(512, (1 << 28) // max(c * k, 1))))
        else:
            sample_chunk = int(min(sample_chunk, n_samples))
            if sample_chunk < 1:
                raise ValueError("sample_chunk must be >= 1")
        if stratify_sampling and c % int(stratify_sampling):
            raise ValueError(
                f"n_chains={c} not divisible by stratify_sampling="
                f"{stratify_sampling}"
            )
        G = int(stratify_sampling) if stratify_sampling else 0
        programs = _fast_programs_batched(
            ld, algorithm, schedule, mesh, sample_chunk=sample_chunk,
            wavefront=wavefront,
            # whole-warmup single program (mesh-less AND mesh: under a mesh
            # the metric boundaries Chan-combine per-device Welford states
            # over ICI inside the program)
            monolithic=True,
            stratify=G,
            # cap the per-group chunk at the actual draw count (a baked
            # G-scaled chunk over-executes when sample_chunk*G > n_samples)
            stratify_chunk=min(sample_chunk * G, n_samples) if G > 1 else 0,
            epoch_samples=n_samples if epoch_sampling else 0,
            epoch_ring=epoch_ring,
        )
    else:
        programs = _fast_programs(ld, algorithm, schedule, mesh)
    metric0 = states.metric
    if schedule.pooled and metric_is_batched(metric0):
        # shared-metric mode: one unbatched metric for all chains (states
        # built by run_chains arrive unbatched already; a caller-supplied
        # per-chain initial metric is reduced to its first copy)
        metric0 = jax.tree_util.tree_map(lambda x: x[0], metric0)
    Q0, eps0 = states.Q, states.eps
    if mesh is not None:
        spec = NamedSharding(mesh, P(CHAIN_AXIS))
        rep = NamedSharding(mesh, P())
        chain_keys = jax.device_put(chain_keys, spec)
        Q0 = jax.device_put(Q0, spec)
        metric0 = jax.device_put(metric0, rep if schedule.pooled else spec)
        if eps0 is not None:
            eps0 = jax.device_put(eps0, spec)

    if batched:
        # one scalar key per step-group drives the whole batch
        base_key = chain_keys[0]

        def key_fold(i):
            return jax.random.fold_in(base_key, i)

    else:
        fold = jax.jit(jax.vmap(jax.random.fold_in, in_axes=(0, None)))

        def key_fold(i):
            return fold(chain_keys, i)

    metric, eps, search_results, summaries, inference = execute(
        programs,
        schedule,
        key_fold,
        Q0,
        metric0,
        eps0,
        n_samples,
        log=log,
        draw_sink=draw_sink,
        stratify_sampling=int(stratify_sampling) if stratify_sampling else 0,
        stratify_permute_only=stratify_mesh,
        warmup_sink=warmup_sink,
        warmup_resume=warmup_resume,
        ess_target=ess_target,
        ess_check_start=ess_check_start,
        ess_check_factor=ess_check_factor,
    )
    if search_results is not None:
        # Deliberately checked AFTER the run, not right after the search
        # dispatch: the success flag lives on device, and pulling it early
        # would insert the only host sync between the search and the final
        # result — one full tunnel RPC round-trip (~0.1-0.3 s) added to
        # EVERY successful run to fail a rare pathological one faster. The
        # run still fails loudly with the same DynamicHMCError either way.
        _check_stepsize_search([(None, search_results, None)])
    _q_final, positions, logdensities, stats = inference
    # vmapped sampling stacks the scan axis second: (chains, n_samples, ...)
    return MCMCResult(
        positions=positions,
        logdensities=logdensities,
        tree_statistics=stats,
        metric=metric,
        eps=eps,
    )


def _fast_programs_batched(
    ld: LogDensity,
    algorithm: NUTS,
    schedule: WarmupSchedule,
    mesh: Optional[Mesh],
    sample_chunk: int = 8,
    wavefront: bool = False,
    monolithic: bool = False,
    stratify: int = 0,
    stratify_chunk: int = 0,
    epoch_samples: int = 0,
    epoch_ring: int = 8,
):
    """Cache-normalizing wrapper: kwargs/defaults collapse to one canonical
    positional key (lru_cache keys f(a) and f(a, b=default) differently —
    the retrace QA pin relies on exact cache hits). The ref-stack mode flag
    (tree_batched.use_ref_stack, read at trace time by the drivers) joins
    the key so toggling it builds a distinct program bundle."""
    from ..tree_batched import use_ref_stack

    return _fast_programs_batched_cached(
        ld, algorithm, schedule, mesh, int(sample_chunk), bool(wavefront),
        bool(monolithic), int(stratify), int(stratify_chunk),
        int(epoch_samples), int(epoch_ring), bool(use_ref_stack()),
    )


@functools.lru_cache(maxsize=32)
def _fast_programs_batched_cached(
    ld: LogDensity,
    algorithm: NUTS,
    schedule: WarmupSchedule,
    mesh: Optional[Mesh],
    sample_chunk: int,
    wavefront: bool,
    monolithic: bool,
    stratify: int,
    stratify_chunk: int,
    epoch_samples: int = 0,
    epoch_ring: int = 8,
    ref_stack: bool = False,
):
    """Batch-native program bundle (tree_batched.py): no vmap; shard_map
    wraps the batched functions directly. One scalar key drives each program;
    under a mesh the device index is folded into it so shards draw
    independent streams."""
    import dataclasses as _dc

    from ..engine import build_programs_batched
    from ..stepsize import PooledStepsize

    host_adaptation = schedule.adaptation
    if (
        mesh is not None
        and isinstance(schedule.adaptation, PooledStepsize)
        and schedule.adaptation.axis_name is None
    ):
        # under shard_map each device only sees its local lanes; pool the
        # acceptance signal over the mesh axis too, or every device adapts
        # a different "shared" eps. The axis-BOUND instance exists only for
        # the program bodies built below; host-side init/current/final (in
        # engine.execute) go through the original unbound instance, which is
        # restored on the returned FastPrograms — see PooledStepsize._pmean.
        schedule = _dc.replace(
            schedule,
            adaptation=_dc.replace(
                schedule.adaptation, axis_name=CHAIN_AXIS
            ),
        )

    pooled = schedule.pooled
    metric_spec = P() if pooled else P(CHAIN_AXIS)
    # pooled stepsize: the dual-averaging state and the sampling eps are
    # SHARED scalars (replicated), not per-lane arrays
    pooled_eps = isinstance(schedule.adaptation, PooledStepsize)
    da_spec = P() if pooled_eps else P(CHAIN_AXIS)
    eps_spec = P() if pooled_eps else P(CHAIN_AXIS)
    # pooled: the shared Welford state is carried per-device with a leading
    # device axis (P(chains) over that axis); the metric update combines it
    specs_by_kind = {
        "search": (P(), P(CHAIN_AXIS), metric_spec),
        "stage": (P(), P(CHAIN_AXIS), metric_spec, da_spec, P(CHAIN_AXIS), P(), P()),
        "metric": (P(CHAIN_AXIS),),
        "metric_shared": (P(CHAIN_AXIS),),
        "sample": (P(), P(CHAIN_AXIS), metric_spec, eps_spec, P()),
        "warmup_mono": (
            P(), P(CHAIN_AXIS), metric_spec, da_spec, P(CHAIN_AXIS),
            eps_spec, P(), P(),
        ),
    }
    out_specs_by_kind = {
        "search": P(CHAIN_AXIS),
        # (Q', da', wf', totals): da' replicated when eps is pooled
        "stage": (P(CHAIN_AXIS), da_spec, P(CHAIN_AXIS), P(CHAIN_AXIS)),
        "metric": P(CHAIN_AXIS),
        "metric_shared": P(),
        "sample": P(CHAIN_AXIS),
        # (Q', metric', da', wf', eps_run', totals)
        "warmup_mono": (
            P(CHAIN_AXIS), metric_spec, da_spec, P(CHAIN_AXIS), eps_spec,
            P(CHAIN_AXIS),
        ),
    }

    def wrap(fn, kind):
        if mesh is None:
            # NOTE sample_epoch's carry (with its (T, C, K) output buffers)
            # is deliberately NOT donated: a watchdog-killed dispatch would
            # invalidate the donated progress carry and break the retry
            # path. Peak cost is one transient extra carry copy per
            # dispatch (~1 GB at the headline config).
            return jax.jit(fn)
        if kind == "metric_shared":
            # consumes the (n_devices, ...) per-device pooled Welford states
            # directly; no shard_map needed for this tiny computation
            return jax.jit(fn)
        if kind in ("wavefront", "wavefront_init"):
            # Mesh-sharded wavefront: each device runs its OWN wavefront over
            # its local lanes — per-device slot counters ("g" carried as a
            # (n_devices,) array) and per-device while-loop trip counts, so a
            # device whose lanes finish early stops immediately. With
            # per-chain stepsizes there is zero cross-device communication
            # inside the loop (the group-per-device decomposition the
            # stratified sampler uses). With POOLED stepsize the driver runs
            # epoch-LOCKSTEP (tree_wavefront.make_wavefront_stage_driver's
            # mesh_axis mode): the shared dual-averaging state stays
            # replicated via one psum at every aligned epoch boundary, and
            # the epochal accumulators become per-device partial sums peeled
            # like "g".
            from ..tree_wavefront import wavefront_carry_specs

            carry_specs = wavefront_carry_specs(
                P, CHAIN_AXIS, pooled_eps=pooled_eps
            )
            dev_keys = ("g", "acc_ep_sum", "acc_ep_n") if pooled_eps else ("g",)
            peel = functools.partial(jax.tree_util.tree_map, lambda x: x[0])
            unpeel = functools.partial(
                jax.tree_util.tree_map, lambda x: x[None]
            )
            if kind == "wavefront":
                inner_wf = fn

                def fn_wavefront(key, metric, carry, n_steps, g_stop,
                                 depth_limit, tail_steps):
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index(CHAIN_AXIS)
                    )
                    c = dict(carry)
                    for k in dev_keys:
                        c[k] = c[k][0]
                    if pooled:
                        c["wf"] = peel(c["wf"])
                    out, done = inner_wf(
                        key, metric, c, n_steps, g_stop, depth_limit,
                        tail_steps,
                    )
                    out = dict(out)
                    for k in dev_keys:
                        out[k] = out[k][None]
                    if pooled:
                        out["wf"] = unpeel(out["wf"])
                    return out, done[None]

                f = jax.shard_map(
                    fn_wavefront,
                    mesh=mesh,
                    in_specs=(P(), metric_spec, carry_specs, P(), P(), P(),
                              P()),
                    out_specs=(carry_specs, P(CHAIN_AXIS)),
                    check_vma=False,
                )
                return jax.jit(f)
            inner_wi = fn

            def fn_winit(Q, metric, da, wf):
                if pooled:
                    wf = peel(wf)
                c = dict(inner_wi(Q, metric, da, wf))
                for k in dev_keys:
                    c[k] = c[k][None]
                if pooled:
                    c["wf"] = unpeel(c["wf"])
                return c

            f = jax.shard_map(
                fn_winit,
                mesh=mesh,
                in_specs=(
                    P(CHAIN_AXIS), metric_spec, da_spec, P(CHAIN_AXIS),
                ),
                out_specs=carry_specs,
                check_vma=False,
            )
            return jax.jit(f)
        if kind in ("sample_epoch", "sample_epoch_init", "sample_epoch_finish"):
            # Mesh-sharded epoch sampling: like the mesh wavefront warmup,
            # each device runs its own epoch loop over its local lanes with
            # per-device slot/flush counters ("g"/"flushed" carried as
            # (n_devices,) arrays) and independent trip counts. Sampling
            # never adapts, so there is nothing to pool — zero cross-device
            # communication inside the loop.
            from ..tree_wavefront_epoch import epoch_carry_specs

            ep_specs = epoch_carry_specs(P, CHAIN_AXIS)

            def peel_c(c):
                c = dict(c)
                for k in ("g", "flushed"):
                    c[k] = c[k][0]
                return c

            def unpeel_c(c):
                c = dict(c)
                for k in ("g", "flushed"):
                    c[k] = c[k][None]
                return c

            if kind == "sample_epoch":
                inner_ep = fn

                def fn_epoch(key, metric, eps, carry, g_stop):
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index(CHAIN_AXIS)
                    )
                    out, done = inner_ep(
                        key, metric, eps, peel_c(carry), g_stop
                    )
                    return unpeel_c(out), done[None]

                f = jax.shard_map(
                    fn_epoch,
                    mesh=mesh,
                    in_specs=(P(), metric_spec, eps_spec, ep_specs, P()),
                    out_specs=(ep_specs, P(CHAIN_AXIS)),
                    check_vma=False,
                )
                return jax.jit(f)
            if kind == "sample_epoch_init":
                inner_ei = fn

                def fn_einit(Q, metric):
                    return unpeel_c(inner_ei(Q, metric))

                f = jax.shard_map(
                    fn_einit,
                    mesh=mesh,
                    in_specs=(P(CHAIN_AXIS), metric_spec),
                    out_specs=ep_specs,
                    check_vma=False,
                )
                return jax.jit(f)
            inner_ef = fn

            def fn_efinish(carry):
                return inner_ef(peel_c(carry))

            f = jax.shard_map(
                fn_efinish,
                mesh=mesh,
                in_specs=(ep_specs,),
                out_specs=(
                    P(CHAIN_AXIS), P(CHAIN_AXIS), P(CHAIN_AXIS), P(CHAIN_AXIS)
                ),
                check_vma=False,
            )
            return jax.jit(f)
        if kind in ("search", "stage", "sample", "warmup_mono"):
            inner = fn

            def fn_with_device_key(key, *rest):
                key = jax.random.fold_in(key, jax.lax.axis_index(CHAIN_AXIS))
                return inner(key, *rest)

            fn = fn_with_device_key
        if kind == "warmup_mono" and pooled:
            inner_m = fn

            def fn_mono_wf_axis(key, Q, metric, da, wf, eps_run, start_i, n_steps):
                # local view of the per-device shared Welford: (1, ...) -> (...)
                wf_local = jax.tree_util.tree_map(lambda x: x[0], wf)
                Q2, metric2, da2, wf2, eps2, tot = inner_m(
                    key, Q, metric, da, wf_local, eps_run, start_i, n_steps
                )
                wf2 = jax.tree_util.tree_map(lambda x: x[None], wf2)
                return Q2, metric2, da2, wf2, eps2, tot

            fn = fn_mono_wf_axis
        if kind == "stage" and pooled:
            inner2 = fn

            def fn_wf_axis(key, Q, metric, da, wf, start_i, n_steps):
                # local view of the per-device shared Welford: (1, ...) -> (...)
                wf_local = jax.tree_util.tree_map(lambda x: x[0], wf)
                Q2, da2, wf2, tot = inner2(
                    key, Q, metric, da, wf_local, start_i, n_steps
                )
                wf2 = jax.tree_util.tree_map(lambda x: x[None], wf2)
                return Q2, da2, wf2, tot

            fn = fn_wf_axis
        f = jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=specs_by_kind[kind],
            out_specs=out_specs_by_kind[kind],
            check_vma=False,
        )
        return jax.jit(f)

    programs = build_programs_batched(
        ld,
        algorithm,
        schedule,
        wrap,
        sample_chunk=sample_chunk,
        mesh_axis=CHAIN_AXIS if (pooled and mesh is not None) else None,
        wf_leading=mesh.devices.size if (pooled and mesh is not None) else 0,
        wavefront_mesh_axis=CHAIN_AXIS if mesh is not None else None,
        wavefront=wavefront,
        monolithic=monolithic,
        stratify=stratify,
        stratify_chunk=stratify_chunk,
        epoch_samples=epoch_samples,
        epoch_ring=epoch_ring,
    )
    # host-side adaptation calls must use the unbound instance
    return programs._replace(adaptation=host_adaptation)
