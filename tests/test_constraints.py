"""Constrained-parameter transform tests: inverse consistency, Jacobian
correctness vs autodiff, and end-to-end sampling of a constrained posterior
(the reference delegates this to TransformVariables; here it is in-tree)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu import mcmc_with_warmup
from dynamichmc_tpu.constraints import (
    as_stack,
    bounded,
    constrain_draws,
    identity,
    positive,
    simplex,
    transformed_logdensity,
)


def check_roundtrip_and_jacobian(transform, x):
    x = jnp.asarray(x, jnp.float64)
    y, log_j = transform.forward(x)
    x_back = transform.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-8)
    # Jacobian vs autodiff: for square maps use jacfwd det; for the simplex,
    # use the first n-1 outputs (the last is determined).
    jac = jax.jacfwd(lambda xx: transform.forward(xx)[0])(x)
    jac = np.asarray(jac)
    if jac.shape[0] == jac.shape[1] + 1:
        jac = jac[:-1]  # simplex: square lower-triangular part
    sign, logdet = np.linalg.slogdet(jac)
    np.testing.assert_allclose(float(log_j), logdet, rtol=1e-8)


@pytest.mark.parametrize(
    "transform,x",
    [
        (identity(3), [0.3, -1.0, 2.0]),
        (positive(2), [0.5, -1.5]),
        (bounded(-2.0, 5.0, 2), [0.7, -0.3]),
        (simplex(4), [0.2, -0.5, 1.0]),
    ],
)
def test_roundtrip_and_jacobian(transform, x):
    check_roundtrip_and_jacobian(transform, x)


def test_simplex_outputs_valid():
    t = simplex(5)
    y, _ = t.forward(jnp.asarray([0.3, -1.0, 0.5, 2.0], jnp.float64))
    y = np.asarray(y)
    assert (y > 0).all()
    np.testing.assert_allclose(y.sum(), 1.0, rtol=1e-12)


def test_stack_blocks():
    stack = as_stack([positive(1), bounded(0, 1, 2), identity(2)])
    assert stack.input_dim == 5 and stack.output_dim == 5
    x = jnp.asarray([0.1, -0.2, 0.3, 1.0, -1.0], jnp.float64)
    y, log_j = stack.forward_with_logdet(x)
    np.testing.assert_allclose(np.asarray(stack.inverse(y)), np.asarray(x), rtol=1e-8)
    assert float(y[0]) > 0 and 0 < float(y[1]) < 1


@pytest.mark.slow
def test_sample_constrained_gamma_posterior():
    # theta ~ Gamma(shape=3, rate=2) on (0, inf), sampled in log space.
    shape_, rate = 3.0, 2.0

    def constrained_lp(y):
        theta = y[0]
        return (shape_ - 1) * jnp.log(theta) - rate * theta

    ld = transformed_logdensity(constrained_lp, [positive(1)])
    res = mcmc_with_warmup(jax.random.PRNGKey(0), ld, 8000, dtype=jnp.float64)
    theta = np.asarray(constrain_draws([positive(1)], res.positions))[:, 0]
    assert (theta > 0).all()
    # Gamma(3, 2): mean 1.5, var 0.75
    np.testing.assert_allclose(theta.mean(), 1.5, rtol=0.05)
    np.testing.assert_allclose(theta.var(), 0.75, rtol=0.15)


@pytest.mark.slow
def test_sample_dirichlet_posterior():
    # p ~ Dirichlet(alpha) via the simplex transform.
    alpha = np.array([2.0, 3.0, 4.0])

    def constrained_lp(y):
        return jnp.sum((jnp.asarray(alpha) - 1) * jnp.log(y))

    ld = transformed_logdensity(constrained_lp, [simplex(3)])
    res = mcmc_with_warmup(jax.random.PRNGKey(1), ld, 8000, dtype=jnp.float64)
    p = np.asarray(constrain_draws([simplex(3)], res.positions))
    np.testing.assert_allclose(p.sum(1), 1.0, rtol=1e-10)
    np.testing.assert_allclose(p.mean(0), alpha / alpha.sum(), rtol=0.05)
