"""Parity gates for the on-device (jitted) ESS/R-hat implementation.

stats_device must reproduce the host numpy implementation (stats.py, itself
pinned against the Vehtari et al. 2021 construction and the native fastdiag
engine) to float64 rounding — the masked re-derivation of the Geyer
initial-positive/monotone loops is the risky part, so the workloads are
chosen to hit every branch: i.i.d. (long positive sequence), strong positive
autocorrelation (early termination), antithetic chains (negative pair sums,
the final-even-member fixup), ties (rank averaging), and degenerate
constant series."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu import stats
from dynamichmc_tpu.stats_device import (
    _rank_normalize,
    ess_bulk_device,
    ess_rhat_device,
)


def _ar1(rho, c, n, k, seed=0):
    rng = np.random.RandomState(seed)
    x = np.zeros((c, n, k))
    e = rng.randn(c, n, k)
    x[:, 0] = e[:, 0]
    for t in range(1, n):
        x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho**2) * e[:, t]
    return x


def _assert_parity(positions, rtol=1e-6):
    host = stats.ess_rhat(positions, use_native=False)
    dev = jax.tree_util.tree_map(np.asarray, ess_rhat_device(positions))
    for key in ("ess_bulk", "ess_tail", "rhat"):
        np.testing.assert_allclose(
            dev[key], host[key], rtol=rtol, err_msg=key
        )


def test_rank_normalize_parity():
    rng = np.random.RandomState(3)
    x = rng.randn(6, 50)
    x[0, :10] = 1.25  # tie run
    np.testing.assert_allclose(
        np.asarray(_rank_normalize(jnp.asarray(x))),
        stats._rank_normalize(x),
        rtol=1e-12,
    )


def test_parity_iid():
    rng = np.random.RandomState(0)
    _assert_parity(rng.randn(4, 200, 3))


def test_parity_positive_autocorrelation():
    _assert_parity(_ar1(0.9, 4, 256, 3, seed=1))


def test_parity_negative_autocorrelation():
    # antithetic draws: lag-1 pair sums go negative immediately, exercising
    # the stopping pair + final-even-member fixup branches
    _assert_parity(_ar1(-0.7, 4, 200, 2, seed=2))


def test_parity_odd_draws_and_ties():
    rng = np.random.RandomState(4)
    x = rng.randn(5, 101, 2)
    x[:, ::7, 0] = 0.5  # heavy ties in one param
    _assert_parity(x)


def test_parity_short_series():
    rng = np.random.RandomState(5)
    _assert_parity(rng.randn(4, 8, 2))  # n//2 = 4: the n < 4 guard boundary


def test_constant_series():
    x = np.ones((4, 64, 1))
    dev = ess_rhat_device(x)
    assert np.isfinite(float(dev["rhat"][0]))
    assert float(dev["rhat"][0]) == pytest.approx(1.0)


def test_ess_bulk_single_series():
    rng = np.random.RandomState(6)
    x = rng.randn(4, 300)
    np.testing.assert_allclose(
        float(ess_bulk_device(x)), stats.ess_bulk(x), rtol=1e-6
    )


@pytest.mark.slow
def test_parity_mcmc_output():
    # real sampler output (batched fast engine), full-size parity check
    from dynamichmc_tpu.models import std_normal
    from dynamichmc_tpu.parallel import run_chains
    from dynamichmc_tpu.stepsize import InitialStepsizeSearch
    from dynamichmc_tpu.warmup import TuningNUTS

    res = run_chains(
        jax.random.PRNGKey(0), std_normal(4, dtype=jnp.float64), 8, 128,
        warmup_stages=(
            InitialStepsizeSearch(),
            TuningNUTS(N=50, metric_kind="diagonal"),
        ),
        dtype=jnp.float64,
    )
    _assert_parity(np.asarray(res.positions, np.float64))


def test_param_chunked_matches_single_dispatch():
    """Host-side param chunking (watchdog-safe large-fleet path) is a pure
    dispatch decomposition: identical results to the whole-K program,
    including a ragged final chunk."""
    x = _ar1(0.5, 8, 64, 7, seed=9)
    full = ess_rhat_device(jnp.asarray(x), param_chunk=7)
    chunked = ess_rhat_device(jnp.asarray(x), param_chunk=3)  # 3+3+1
    auto = ess_rhat_device(jnp.asarray(x))  # heuristic: whole-K here
    for key in ("ess_bulk", "ess_tail", "rhat"):
        np.testing.assert_array_equal(np.asarray(full[key]),
                                      np.asarray(chunked[key]))
        np.testing.assert_array_equal(np.asarray(full[key]),
                                      np.asarray(auto[key]))
