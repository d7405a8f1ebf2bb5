"""Execution-engine tests: chunked dispatch must be bitwise reproducible
(any chunking of a stage yields identical results — the fold_in(key, step)
stream is chunking-invariant), and schedule normalization must accept the
reference schedules and reject heterogeneous ones."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamichmc_tpu import (
    DualAveraging,
    FixedStepsize,
    InitialStepsizeSearch,
    NUTS,
    TuningNUTS,
    default_warmup_stages,
    fixed_stepsize_warmup_stages,
)
from dynamichmc_tpu.engine import WarmupSchedule, execute
from dynamichmc_tpu.models import std_normal
from dynamichmc_tpu.parallel import init_chain_states
from dynamichmc_tpu.parallel.chains import _fast_programs


def test_schedule_normalization_accepts_reference_schedules():
    s = WarmupSchedule.from_stages(default_warmup_stages())
    assert s is not None
    assert s.block_sizes == (75, 25, 50, 100, 200, 400, 50)
    assert s.update_metric == (False, True, True, True, True, True, False)
    assert s.metric_kind == "diagonal"
    assert isinstance(s.search, InitialStepsizeSearch)

    s2 = WarmupSchedule.from_stages(fixed_stepsize_warmup_stages())
    assert s2 is not None and s2.search is None
    assert isinstance(s2.adaptation, FixedStepsize)

    # heterogeneous metric kinds are not expressible -> fallback path
    bad = (
        InitialStepsizeSearch(),
        TuningNUTS(N=25, metric_kind="diagonal"),
        TuningNUTS(N=25, metric_kind="dense"),
    )
    assert WarmupSchedule.from_stages(bad) is None

    # mixed adaptation objects are not expressible either
    bad2 = (
        TuningNUTS(N=25, stepsize_adaptation=DualAveraging()),
        TuningNUTS(N=25, stepsize_adaptation=FixedStepsize()),
    )
    assert WarmupSchedule.from_stages(bad2) is None


def _run_with_target(target_seconds):
    ld = std_normal(3)
    # short schedule: the gate is chunk-boundary invariance, which any
    # multi-block schedule exercises — not the full 900-step default
    schedule = WarmupSchedule.from_stages(default_warmup_stages(
        init_steps=30, middle_steps=20, doubling_stages=3,
        terminating_steps=20,
    ))
    programs = _fast_programs(ld, NUTS(), schedule, None)
    states = init_chain_states(jax.random.PRNGKey(0), ld, 4, dtype=jnp.float64)
    chain_keys = jax.random.split(jax.random.PRNGKey(1), 4)
    fold = jax.vmap(jax.random.fold_in, in_axes=(0, None))
    metric, eps, search, summaries, inference = execute(
        programs,
        schedule,
        lambda i: fold(chain_keys, i),
        states.Q,
        states.metric,
        states.eps,
        n_samples=32,
        target_seconds=target_seconds,
    )
    return np.asarray(inference[1]), np.asarray(eps)


def test_chunking_is_bitwise_reproducible():
    # tiny target -> many small dispatches; huge target -> few big ones.
    # Results must be IDENTICAL: fold_in(key, absolute step) streams do not
    # depend on the chunk boundaries.
    pos_small, eps_small = _run_with_target(1e-9)
    pos_big, eps_big = _run_with_target(1e9)
    np.testing.assert_array_equal(pos_small, pos_big)
    np.testing.assert_array_equal(eps_small, eps_big)
