"""Hierarchical / pathological model families beyond the Gaussian zoo.

These flesh out BASELINE config 4 ("Neal's funnel / hierarchical model"):
a non-centered eight-schools posterior (the canonical hierarchical model,
well-behaved), its centered variant (funnel-pathological — exercises
divergence diagnostics), and the Rosenbrock/banana density (strong nonlinear
correlation; no exact sampler, used for diagnostics and benchmarks).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import TestModel

# Classic eight-schools data (Rubin 1981)
SCHOOLS_Y = np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
SCHOOLS_SIGMA = np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])


def eight_schools_noncentered(dtype=jnp.float64) -> TestModel:
    """q = (mu, log_tau, z_1..z_8); theta_j = mu + tau * z_j.

    Non-centered parameterization: the geometry HMC handles well; the
    recommended form for hierarchical models.
    """
    y = jnp.asarray(SCHOOLS_Y, dtype)
    sigma = jnp.asarray(SCHOOLS_SIGMA, dtype)

    def logdensity_fn(q):
        mu, log_tau, z = q[0], q[1], q[2:]
        tau = jnp.exp(log_tau)
        theta = mu + tau * z
        lp = -0.5 * (mu / 5.0) ** 2  # mu ~ N(0, 5)
        lp += -0.5 * (log_tau / 5.0) ** 2 + log_tau  # half-ish prior + Jacobian
        lp += -0.5 * jnp.sum(z * z)  # z ~ N(0, 1)
        lp += -0.5 * jnp.sum(((y - theta) / sigma) ** 2)
        return lp

    return TestModel(dim=10, logdensity_fn=logdensity_fn)


def eight_schools_centered(dtype=jnp.float64) -> TestModel:
    """q = (mu, log_tau, theta_1..theta_8) — the funnel-pathological centered
    form; expect divergences / low EBFMI, surfaced by the diagnostics."""
    y = jnp.asarray(SCHOOLS_Y, dtype)
    sigma = jnp.asarray(SCHOOLS_SIGMA, dtype)

    def logdensity_fn(q):
        mu, log_tau, theta = q[0], q[1], q[2:]
        tau = jnp.exp(log_tau)
        lp = -0.5 * (mu / 5.0) ** 2
        lp += -0.5 * (log_tau / 5.0) ** 2 + log_tau
        lp += -0.5 * jnp.sum(((theta - mu) / tau) ** 2) - 8 * log_tau
        lp += -0.5 * jnp.sum(((y - theta) / sigma) ** 2)
        return lp

    return TestModel(dim=10, logdensity_fn=logdensity_fn)


def rosenbrock(dim: int = 2, a: float = 1.0, b: float = 5.0, dtype=jnp.float64) -> TestModel:
    """Banana-shaped density: pairs (x, y) with y | x ~ N(b (x^2), ...).

    log p = -sum_i [ (x_i - a)^2 / 20 + (y_i - b x_i^2)^2 ] over dim//2 pairs.
    """
    if dim % 2:
        raise ValueError("rosenbrock dim must be even")

    def logdensity_fn(q):
        x = q[0::2]
        y = q[1::2]
        return -jnp.sum((x - a) ** 2 / 20.0 + (y - b * x**2) ** 2)

    return TestModel(dim=dim, logdensity_fn=logdensity_fn)
