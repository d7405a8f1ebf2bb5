"""Independent oracle for the ESS/R-hat statistics stack.

The reference pins its diagnostics to MCMCDiagnosticTools, an external
widely-validated library (/root/reference/test/sample-correctness_utilities.jl:40-43).
This repo's three implementations (stats.py numpy, stats_device.py jitted,
native/fastdiag.cpp) share one algorithm, so parity tests among them cannot
catch a shared algorithmic bug — and every acceptance gate and the headline
ESS/s metric sit on this stack. No independent library is installable in
this environment, so the pins here are ANALYTIC ground truths that no
implementation detail can contaminate:

1. **Gaussian AR(1) ESS.** For chains with standard-normal marginals, the
   pooled-rank normal-scores transform z = ndtri((r - 3/8)/(S + 1/4))
   converges to Phi^{-1}(Phi(x)) = x, i.e. rank normalization is
   asymptotically the identity — so the bulk ESS of a stationary Gaussian
   AR(1) fleet has the closed form C*N*(1-rho)/(1+rho) (tau = 1 +
   2*sum rho^k = (1+rho)/(1-rho)). This exercises the full pipeline —
   pooled ranks, splitting, FFT autocovariance, cross-chain combination,
   Geyer initial monotone truncation — against a value derived with none
   of it, including the superefficient antithetic regime (rho < 0,
   ESS > C*N) that NUTS chains actually produce.

2. **Deterministic separated-chains R-hat.** Two fully separated monotone
   chains have deterministic pooled ranks, so rank-normalized split R-hat
   reduces to a closed-form expression in normal quantiles, computed here
   directly from the published definition (Vehtari et al. 2021, eq. 4 +
   rank normalization) with no shared code.

3. **Checked-in regression fixture.** A seeded (4, 1000, 3) dataset with
   hard-coded expected values locks today's validated numbers against
   silent regressions in any backend.

All three backends are pinned to each oracle.
"""

import numpy as np
import pytest
from scipy.special import ndtri

from dynamichmc_tpu import stats

C, N = 4, 20000


def _ar1(rng, c, n, rho):
    """Exactly stationary Gaussian AR(1): x_t = rho x_{t-1} + sqrt(1-rho^2) e_t."""
    x = np.empty((c, n))
    x[:, 0] = rng.randn(c)
    innov = rng.randn(c, n) * np.sqrt(1 - rho * rho)
    for t in range(1, n):
        x[:, t] = rho * x[:, t - 1] + innov[:, t]
    return x


@pytest.fixture(scope="module")
def ar1_panel():
    """(C, N, 3) panel: one AR(1) parameter each at rho = 0.0, 0.7, -0.5."""
    rng = np.random.RandomState(42)
    rhos = (0.0, 0.7, -0.5)
    x = np.stack([_ar1(rng, C, N, r) for r in rhos], axis=-1)
    true_ess = np.array([C * N * (1 - r) / (1 + r) for r in rhos])
    return x, true_ess


def _backends():
    out = {"numpy": lambda x: stats.ess_rhat(x, use_native=False)}
    try:
        from dynamichmc_tpu import native

        if native.ess_rhat_batch(np.zeros((2, 8, 1))) is not None:
            out["native"] = lambda x: native.ess_rhat_batch(x)
    except Exception:
        pass

    def device(x):
        import jax

        jax.config.update("jax_platforms", "cpu")
        from dynamichmc_tpu.stats_device import ess_rhat_device

        return {k: np.asarray(v)
                for k, v in ess_rhat_device(x, param_chunk=x.shape[-1]).items()}

    out["device"] = device
    return out


@pytest.mark.parametrize("backend", ["numpy", "native", "device"])
def test_ar1_analytic_ess(ar1_panel, backend):
    impls = _backends()
    if backend not in impls:
        pytest.skip("native fastdiag unavailable (no C++ toolchain)")
    x, true_ess = ar1_panel
    out = impls[backend](x)
    ratio = np.asarray(out["ess_bulk"], np.float64) / true_ess
    # estimator noise at C*N = 80k is ~1-2%; 6% headroom keeps the pin
    # seed-robust while catching any algorithmic error (wrong lag
    # combination, broken Geyer truncation, rank-direction bugs all move
    # ESS by tens of percent)
    assert np.all(np.abs(ratio - 1) < 0.06), ratio
    # stationary same-distribution chains: R-hat at 1 to a few permil
    assert np.all(np.asarray(out["rhat"]) < 1.005)


def _expected_separated_rhat(n_half: int) -> float:
    """Rank-normalized split R-hat of two fully separated monotone chains,
    directly from the published definition (no shared code): pooled Blom
    normal scores of deterministic ranks, then the classic split formula."""
    s = 4 * n_half  # total draws across 2 chains = 4 split half-chains
    z = ndtri((np.arange(1, s + 1) - 0.375) / (s + 0.25))
    halves = z.reshape(4, n_half)  # consecutive rank blocks = split halves
    w = halves.var(axis=1, ddof=1).mean()
    var_plus = (n_half - 1) / n_half * w + halves.mean(axis=1).var(ddof=1)
    return float(np.sqrt(var_plus / w))


def test_separated_chains_rhat_closed_form():
    """Chain values are arbitrary monotone floats (only ranks matter); the
    expected R-hat is a deterministic closed form in normal quantiles."""
    n = 500
    x = np.arange(2 * n, dtype=np.float64).reshape(2, n)
    x = np.sinh(x / (2 * n))  # nonlinear monotone map: ranks unchanged
    expected = _expected_separated_rhat(n // 2)
    assert expected > 2.0  # sanity: separation must be loud
    got = stats.rhat(x)
    np.testing.assert_allclose(got, expected, rtol=1e-12)
    # device backend on the same series
    import jax

    jax.config.update("jax_platforms", "cpu")
    from dynamichmc_tpu.stats_device import ess_rhat_device

    dev = ess_rhat_device(x[:, :, None], param_chunk=1)
    np.testing.assert_allclose(
        float(np.asarray(dev["rhat"])[0]), expected, rtol=1e-6
    )
    try:
        from dynamichmc_tpu import native
    except Exception:
        return
    out = native.ess_rhat_batch(x[:, :, None])
    if out is not None:
        np.testing.assert_allclose(out["rhat"][0], expected, rtol=1e-9)


def test_iid_ess_near_sample_size():
    rng = np.random.RandomState(7)
    x = rng.randn(C, N)
    ess = stats.ess_bulk(x)
    assert abs(ess / (C * N) - 1) < 0.06


# --- checked-in regression fixture -----------------------------------------
#
# Seeded (4, 1000, 3) dataset: param 0 iid, param 1 AR(1) rho=0.6,
# param 2 iid with chain-mean offsets (R-hat visibly above 1). The expected
# values below were computed by stats.py at the time this oracle test was
# added, AFTER it passed the analytic pins above — they lock the validated
# behavior of all three backends to rtol 1e-3.

_FIXTURE_EXPECTED = {
    "ess_bulk": (3958.312072, 1052.713489, 10.783298),
    "ess_tail": (3913.350514, 2087.223225, 56.948002),
    "rhat": (1.000072, 1.006727, 1.277395),
}


def _fixture_data():
    rng = np.random.RandomState(2026)
    p0 = rng.randn(4, 1000)
    p1 = _ar1(rng, 4, 1000, 0.6)
    p2 = rng.randn(4, 1000) + np.array([[-1.0], [0.0], [0.5], [1.0]])
    return np.stack([p0, p1, p2], axis=-1)


@pytest.mark.parametrize("backend", ["numpy", "native", "device"])
def test_regression_fixture(backend):
    impls = _backends()
    if backend not in impls:
        pytest.skip("native fastdiag unavailable (no C++ toolchain)")
    out = impls[backend](_fixture_data())
    for key, expected in _FIXTURE_EXPECTED.items():
        np.testing.assert_allclose(
            np.asarray(out[key], np.float64), expected, rtol=1e-3,
            err_msg=key,
        )
