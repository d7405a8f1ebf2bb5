"""Model-family coverage: hierarchical models end-to-end (BASELINE config 4
style) and the logistic-regression posterior (BASELINE config 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu import mcmc_with_warmup
from dynamichmc_tpu.diagnostics import EBFMI, summarize_tree_statistics
from dynamichmc_tpu.models import (
    eight_schools_centered,
    eight_schools_noncentered,
    logistic_regression,
    rosenbrock,
)


@pytest.mark.slow
def test_eight_schools_noncentered_samples_cleanly():
    model = eight_schools_noncentered()
    res = mcmc_with_warmup(jax.random.PRNGKey(0), model, 4000, dtype=jnp.float64)
    stats = res.tree_statistics
    div_rate = float(np.asarray(stats.is_divergent).mean())
    assert div_rate < 0.02, div_rate
    qs = np.asarray(res.positions)
    mu, log_tau = qs[:, 0], qs[:, 1]
    # canonical posterior: mu around ~4.4, wide
    assert 1.0 < mu.mean() < 8.0
    assert float(EBFMI(stats)) > 0.3


@pytest.mark.slow
def test_eight_schools_centered_shows_pathology():
    model = eight_schools_centered()
    res = mcmc_with_warmup(jax.random.PRNGKey(1), model, 4000, dtype=jnp.float64)
    summary = summarize_tree_statistics(res.tree_statistics)
    # the centered funnel geometry must be VISIBLE in the diagnostics:
    # divergences, or depth saturation, or low EBFMI
    ebfmi = float(EBFMI(res.tree_statistics))
    pathological = (
        summary.termination_counts["divergence"] > 0
        or summary.termination_counts["max_depth"] > 0
        or ebfmi < 0.5
    )
    assert pathological


@pytest.mark.slow
def test_logistic_regression_posterior():
    # BASELINE config 3: AD gradient through the likelihood matmul
    model = logistic_regression(n_obs=300, dim=8, seed=1)
    res = mcmc_with_warmup(jax.random.PRNGKey(2), model, 3000, dtype=jnp.float64)
    qs = np.asarray(res.positions)
    assert np.isfinite(qs).all()
    assert float(np.asarray(res.tree_statistics.acceptance_rate).mean()) > 0.7
    # posterior concentrates: std well below the prior scale 10
    assert qs.std(0).max() < 2.0


@pytest.mark.slow
def test_rosenbrock_runs():
    model = rosenbrock(4)
    res = mcmc_with_warmup(jax.random.PRNGKey(3), model, 3000, dtype=jnp.float64)
    qs = np.asarray(res.positions)
    assert np.isfinite(qs).all()
    # banana: y ~ b*x^2 => strong curvature; check E[y - 5x^2] ~ 0
    x, y = qs[:, 0], qs[:, 1]
    assert abs((y - 5 * x**2).mean()) < 0.2


def test_elongate_preserves_normalization():
    """A change of variables preserves the normalization constant exactly,
    so elongated targets must stay usable as mixture components — the
    reference's elongate-then-mix workload
    (sample-correctness_tests.jl:100-118)."""
    import jax.numpy as jnp
    import numpy as np
    from dynamichmc_tpu.models import elongate, mixture, std_normal

    base = std_normal(2)
    el = elongate(1.1, base)
    assert el.log_normalization == base.log_normalization
    mix = mixture(0.5, el, std_normal(2))  # raised ValueError before the fix
    v = float(mix.logdensity_fn(jnp.asarray([0.5, -0.3])))
    assert np.isfinite(v)
    # exact samplers compose: the mixture draws from both components
    draws = np.asarray(mix.sample(jax.random.PRNGKey(0), 4000))
    assert np.isfinite(draws).all()
    np.testing.assert_allclose(draws.mean(0), [0.0, 0.0], atol=0.1)
