"""Watchdog-kill resilience: every dispatch loop recovers from a transient
UNAVAILABLE failure with bitwise-identical results.

The TPU runtime kills single-device executions that run too long; the engine
retries the same dispatch (committed input buffers + step keys folding global
indices make a redispatch bitwise reproducible). These tests inject a
``jax.errors.JaxRuntimeError("UNAVAILABLE ...")`` into each dispatch loop —
monolithic warmup, non-monolithic block stages, sampling chunks, stratified
sampling groups, the wavefront budget loop, and the keep-warmup collect loop
— and assert the run completes with results EXACTLY equal to an uninjected
run. A non-UNAVAILABLE error must still propagate, and the per-dispatch
retry budget must exhaust after repeated failures.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dynamichmc_tpu.engine as engine
from dynamichmc_tpu import from_logdensity_fn, mcmc_keep_warmup
from dynamichmc_tpu.nuts import NUTS
from dynamichmc_tpu.parallel import run_chains
from dynamichmc_tpu.warmup import TuningNUTS, default_warmup_stages
from dynamichmc_tpu.stepsize import InitialStepsizeSearch


@pytest.fixture(autouse=True)
def _no_retry_sleep(monkeypatch):
    monkeypatch.setattr(engine, "_RETRY_SLEEP_SECONDS", 0.0)


def _flaky(fn, fail_calls):
    """Wrap a program: raise UNAVAILABLE on call indices in ``fail_calls``."""
    state = {"n": -1}

    def wrapped(*args, **kwargs):
        state["n"] += 1
        if state["n"] in fail_calls:
            raise jax.errors.JaxRuntimeError(
                "UNAVAILABLE: TPU worker crashed (injected fault)"
            )
        return fn(*args, **kwargs)

    return wrapped


def _model(k=3):
    return from_logdensity_fn(k, lambda q: -0.5 * jnp.sum(q**2))


STAGES = (
    InitialStepsizeSearch(),
    TuningNUTS(N=20),
    TuningNUTS(N=24, metric_kind="diagonal"),
    TuningNUTS(N=20),
)


def _run(n_chains=8, flake=None, **kwargs):
    """run_chains with optional program-field fault injection; the patch
    wraps the cached program bundle, so the clean and injected runs execute
    the SAME compiled programs."""
    from dynamichmc_tpu.parallel import chains as pchains

    ld = _model()
    orig = pchains._fast_programs_batched

    if flake is None:
        res = run_chains(
            jax.random.PRNGKey(0), ld, n_chains, 24,
            warmup_stages=STAGES, dtype=jnp.float64, **kwargs,
        )
        return res

    def patched(*args, **kw):
        programs = orig(*args, **kw)
        return programs._replace(
            **{f: _flaky(getattr(programs, f), calls)
               for f, calls in flake.items()
               if getattr(programs, f) is not None}
        )

    pchains.__dict__["_fast_programs_batched"] = patched
    try:
        return run_chains(
            jax.random.PRNGKey(0), ld, n_chains, 24,
            warmup_stages=STAGES, dtype=jnp.float64, **kwargs,
        )
    finally:
        pchains.__dict__["_fast_programs_batched"] = orig


def assert_identical(a, b):
    np.testing.assert_array_equal(np.asarray(a.positions), np.asarray(b.positions))
    np.testing.assert_array_equal(np.asarray(a.eps), np.asarray(b.eps))
    np.testing.assert_array_equal(
        np.asarray(a.tree_statistics.steps), np.asarray(b.tree_statistics.steps)
    )


def test_monolithic_warmup_and_sampling_retry():
    clean = _run()
    # call 0 of warmup_mono is the untimed warm dispatch (0 steps) outside
    # the retry loop; calls >= 1 are the real chunked dispatches
    injected = _run(flake={"warmup_mono": {1}, "sample": {0}})
    assert_identical(clean, injected)


@pytest.mark.slow
def test_block_stage_retry():
    # non-monolithic path: per-block stage dispatches
    from dynamichmc_tpu.parallel import chains as pchains

    ld = _model()
    orig = pchains._fast_programs_batched

    def patched(*args, **kw):
        kw = dict(kw)
        kw["monolithic"] = False
        programs = orig(*args, **kw)
        return programs

    pchains.__dict__["_fast_programs_batched"] = patched
    try:
        clean = _run()
    finally:
        pchains.__dict__["_fast_programs_batched"] = orig

    def patched_flaky(*args, **kw):
        kw = dict(kw)
        kw["monolithic"] = False
        programs = orig(*args, **kw)
        return programs._replace(stage=_flaky(programs.stage, {2}))

    pchains.__dict__["_fast_programs_batched"] = patched_flaky
    try:
        injected = _run()
    finally:
        pchains.__dict__["_fast_programs_batched"] = orig
    assert_identical(clean, injected)


@pytest.mark.slow
def test_wavefront_retry():
    clean = _run(warmup_driver="wavefront")
    # wavefront warm dispatch is call 0; the budget loop starts at call >= 1
    injected = _run(
        warmup_driver="wavefront", flake={"stage_wavefront": {2}}
    )
    assert_identical(clean, injected)


@pytest.mark.slow
def test_stratified_retry():
    clean = _run(stratify_sampling=2)
    injected = _run(stratify_sampling=2, flake={"sample_stratified": {1}})
    assert_identical(clean, injected)


@pytest.mark.slow
def test_keep_warmup_collect_retry(monkeypatch):
    import importlib

    # "dynamichmc_tpu.mcmc" the attribute is the mcmc() function (re-exported
    # in __init__); fetch the MODULE explicitly
    mcmc_mod = importlib.import_module("dynamichmc_tpu.mcmc")

    ld = _model()
    kwargs = dict(
        warmup_stages=STAGES, dtype=jnp.float64, collect_warmup_positions=True
    )
    clean = mcmc_keep_warmup(jax.random.PRNGKey(0), ld, 16, **kwargs)

    orig = mcmc_mod._fast_keep_programs

    def patched(*args, **kw):
        programs, collect, chunk = orig(*args, **kw)
        return programs, _flaky(collect, {1}), chunk

    monkeypatch.setattr(mcmc_mod, "_fast_keep_programs", patched)
    injected = mcmc_keep_warmup(jax.random.PRNGKey(0), ld, 16, **kwargs)
    np.testing.assert_array_equal(
        np.asarray(clean["inference"].positions),
        np.asarray(injected["inference"].positions),
    )
    np.testing.assert_array_equal(
        np.asarray(clean["final_warmup_state"].eps),
        np.asarray(injected["final_warmup_state"].eps),
    )


def test_non_unavailable_error_propagates():
    """A non-UNAVAILABLE JaxRuntimeError must not be retried."""
    calls = {"n": 0}

    def boom():
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError("INTERNAL: real bug")

    with pytest.raises(jax.errors.JaxRuntimeError, match="INTERNAL"):
        engine._retry_dispatch(boom)
    assert calls["n"] == 1


def test_retry_budget_exhausts():
    calls = {"n": 0}

    def always_fail():
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError("UNAVAILABLE: stuck")

    with pytest.raises(jax.errors.JaxRuntimeError, match="UNAVAILABLE"):
        engine._retry_dispatch(always_fail)
    assert calls["n"] == 4  # initial attempt + 3 retries


@pytest.mark.slow
def test_retry_budget_is_per_dispatch():
    """4+ non-consecutive transient failures across one run must all recover
    (the round-2 counter never reset; ADVICE item 3)."""
    clean = _run()
    injected = _run(flake={"warmup_mono": {1, 3, 5, 7, 9}})
    assert_identical(clean, injected)


@pytest.mark.slow
def test_epoch_sampling_retry_halves_budget():
    """The epoch sampling loop recovers from a watchdog kill AND the retried
    dispatch actually runs with the HALVED slot budget: run_epoch must read
    ep_budget at call time (a def-time g_stop default redispatched the
    identical killed size — round-4 review finding)."""
    from dynamichmc_tpu.parallel import chains as pchains

    clean = _run(sampling_driver="epoch")

    orig = pchains._fast_programs_batched
    seen = {"g_stops": [], "fail_at": 1, "n": -1}

    def patched(*args, **kw):
        programs = orig(*args, **kw)
        inner = programs.sample_epoch

        def recording(key, metric, eps, carry, g_stop):
            seen["n"] += 1
            # call 0 is the untimed warm/compile dispatch (g_stop == 0)
            if seen["n"] >= 1:
                seen["g_stops"].append(int(g_stop))
                if seen["n"] == seen["fail_at"]:
                    raise jax.errors.JaxRuntimeError(
                        "UNAVAILABLE: TPU worker crashed (injected fault)"
                    )
            return inner(key, metric, eps, carry, g_stop)

        return programs._replace(sample_epoch=recording)

    pchains.__dict__["_fast_programs_batched"] = patched
    try:
        injected = _run(sampling_driver="epoch")
    finally:
        pchains.__dict__["_fast_programs_batched"] = orig

    assert_identical(clean, injected)
    # the first real dispatch was killed; its retry must request FEWER
    # global slots than the killed dispatch did
    assert len(seen["g_stops"]) >= 2
    assert seen["g_stops"][1] < seen["g_stops"][0]
