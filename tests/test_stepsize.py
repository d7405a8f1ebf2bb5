"""Stepsize search + dual averaging tests.

Ports /root/reference/test/test_stepsize.jl: bracketing crossing property,
failure on a constant acceptance function (the reference throws; we return a
success flag), and dual-averaging convergence against a synthetic noisy
acceptance-rate model with no MCMC involved (test_stepsize.jl:33-71).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu.stepsize import (
    DualAveraging,
    FixedStepsize,
    InitialStepsizeSearch,
    find_initial_stepsize,
)


def bracket(A, params=InitialStepsizeSearch()):
    eps, success = jax.jit(lambda: find_initial_stepsize(params, A))()
    return float(eps), bool(success)


def test_bracketing_crossing_decreasing():
    # A decreasing in eps: log A = -eps => crossing log(0.8) ~ 0.223
    A = lambda eps: -eps
    eps, ok = bracket(A)
    assert ok
    thr = np.log(0.8)
    # crossing property (test_stepsize.jl:9-25): A on one side of the
    # threshold at eps, other side at the neighboring bracketing point
    a = -eps
    assert (a < thr) != (-eps / 2 < thr) or (a < thr) != (-eps * 2 < thr)


def test_bracketing_from_above():
    # start above threshold -> doubling until below
    A = lambda eps: jnp.log(0.9) - eps * 0.5
    eps, ok = bracket(A)
    assert ok
    assert -0.5 * eps + np.log(0.9) < np.log(0.8)
    assert -0.5 * (eps / 2) + np.log(0.9) > np.log(0.8)


def test_bracketing_constant_fails():
    # constant A never crosses: the reference throws
    # (stepsize.jl:56-59); we signal failure.
    A = lambda eps: jnp.asarray(np.log(0.9)) + 0 * eps
    eps, ok = bracket(A)
    assert not ok


def test_parameter_validation():
    with pytest.raises(ValueError):
        InitialStepsizeSearch(initial_eps=-1.0)
    with pytest.raises(ValueError):
        InitialStepsizeSearch(log_threshold=0.1)
    with pytest.raises(ValueError):
        InitialStepsizeSearch(maxiter_crossing=10)
    with pytest.raises(ValueError):
        DualAveraging(delta=1.5)
    with pytest.raises(ValueError):
        DualAveraging(kappa=0.3)
    with pytest.raises(ValueError):
        DualAveraging(gamma=-1.0)


def test_dual_averaging_converges_to_target():
    # test_stepsize.jl:33-71: synthetic acceptance model
    # a(eps) = min(C/eps * noise, 1); adaptation should settle near delta.
    delta = 0.8
    da = DualAveraging(delta=delta)
    key = jax.random.PRNGKey(0)

    def model_acceptance(eps, noise_key):
        noise = jnp.exp(0.5 * jax.random.normal(noise_key, (), jnp.float64))
        return jnp.minimum(2.0 / eps * noise, 1.0)

    def step(state, k):
        eps = da.current(state)
        a = model_acceptance(eps, k)
        return da.update(state, a), a

    state = da.init(jnp.float64(0.1))
    keys = jax.random.split(key, 3000)
    state, accepts = jax.jit(lambda s, ks: jax.lax.scan(step, s, ks))(state, keys)
    final_eps = float(da.final(state))
    # at the adapted stepsize, median acceptance should be close to delta
    a_final = np.minimum(2.0 / final_eps * np.exp(0.5 * np.random.RandomState(1).randn(20000)), 1.0)
    assert abs(a_final.mean() - delta) < 0.05
    # last accepted rates hover around delta
    assert abs(np.asarray(accepts)[-500:].mean() - delta) < 0.05


def test_fixed_stepsize_identity():
    fs = FixedStepsize()
    s = fs.init(0.37)
    s = fs.update(s, 0.1)
    assert float(fs.current(s)) == pytest.approx(0.37)
    assert float(fs.final(s)) == pytest.approx(0.37)


def test_nonfinite_start_guard():
    """Reference guard parity (stepsize.jl:77-79): a non-finite joint density
    at the search's starting point is named as such, with a chain/logdensity
    payload, instead of surfacing as a generic bracketing failure."""
    from dynamichmc_tpu.engine import make_search_driver_batched
    from dynamichmc_tpu.errors import DynamicHMCError
    from dynamichmc_tpu.hamiltonian import EvaluatedPoint
    from dynamichmc_tpu.mcmc import _check_stepsize_search
    from dynamichmc_tpu.metric import identity_metric
    from dynamichmc_tpu.models import std_normal

    ld = std_normal(3, dtype=jnp.float64)
    q = jnp.zeros((4, 3), jnp.float64)
    lds = jnp.zeros((4,), jnp.float64).at[2].set(-jnp.inf)
    Q = EvaluatedPoint(q=q, logdensity=lds, grad=jnp.zeros_like(q))
    metric = identity_metric(3, dtype=jnp.float64)
    search = make_search_driver_batched(ld, InitialStepsizeSearch())
    eps, success, l0 = jax.jit(search)(jax.random.PRNGKey(0), Q, metric)
    assert not np.isfinite(np.asarray(l0)[2])
    assert np.isfinite(np.asarray(l0)[[0, 1, 3]]).all()
    results = {"eps": eps, "success": success, "l0": l0}
    with pytest.raises(DynamicHMCError, match="non-finite density") as ei:
        _check_stepsize_search([(None, results, None)])
    assert ei.value.payload["chains"] == [2]
