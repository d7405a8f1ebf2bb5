"""Native fastdiag parity: the C++ batch ESS/R-hat engine must match the
numpy reference implementation in dynamichmc_tpu.stats exactly."""

import numpy as np
import pytest

from dynamichmc_tpu import stats

native = pytest.importorskip("dynamichmc_tpu.native")


@pytest.fixture(scope="module")
def lib_available():
    if native.load() is None:
        pytest.skip("fastdiag.so unavailable (no C++ toolchain)")


def make_chains(seed, c=6, n=400, k=4, rho=0.6, shift_chain=None):
    rng = np.random.RandomState(seed)
    eps = rng.randn(c, n, k)
    x = np.zeros_like(eps)
    for t in range(1, n):
        x[:, t] = rho * x[:, t - 1] + eps[:, t]
    if shift_chain is not None:
        x[shift_chain] += 3.0
    return x


@pytest.mark.parametrize("rho", [0.0, 0.6, 0.95])
def test_parity_autocorrelated(lib_available, rho):
    x = make_chains(0, rho=rho)
    got = native.ess_rhat_batch(x)
    want = stats.ess_rhat(x, use_native=False)
    for key in ["ess_bulk", "ess_tail", "rhat"]:
        np.testing.assert_allclose(got[key], want[key], rtol=1e-7, err_msg=key)


def test_parity_nonconverged(lib_available):
    x = make_chains(1, shift_chain=0)
    got = native.ess_rhat_batch(x)
    want = stats.ess_rhat(x, use_native=False)
    np.testing.assert_allclose(got["rhat"], want["rhat"], rtol=1e-7)
    assert got["rhat"].max() > 1.2


def test_stats_dispatches_to_native(lib_available):
    x = make_chains(2)
    via_stats = stats.ess_rhat(x, use_native=True)
    direct = native.ess_rhat_batch(x)
    np.testing.assert_allclose(via_stats["rhat"], direct["rhat"])


def test_nan_input_is_defined(lib_available):
    """A NaN draw must not trip std::stable_sort UB (the plain < comparator
    violated strict weak ordering on NaN); outputs just need to be
    deterministic and crash-free."""
    x = make_chains(3)
    x[0, 5, 0] = np.nan
    got1 = native.ess_rhat_batch(x)
    got2 = native.ess_rhat_batch(x)
    for key in ["ess_bulk", "ess_tail", "rhat"]:
        np.testing.assert_array_equal(got1[key], got2[key])
    # untouched parameters keep exact parity with the numpy path
    want = stats.ess_rhat(x[:, :, 1:], use_native=False)
    np.testing.assert_allclose(got1["rhat"][1:], want["rhat"], rtol=1e-7)


def test_degenerate_draw_counts(lib_available):
    """n < 4 draws: the split-rank pipeline is undefined — the native path
    must return NaN, never read out of bounds (previously a heap overread
    via quantile7 on an empty vector)."""
    for n in (1, 2, 3):
        x = np.random.default_rng(n).normal(size=(4, n, 2))
        got = native.ess_rhat_batch(x)
        assert got is not None
        if n < 4:
            assert np.isnan(got["ess_bulk"]).all() or n >= 4
