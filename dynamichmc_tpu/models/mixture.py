"""Finite mixtures of exactly characterized targets
(cf. /root/reference/test/sample-correctness_tests.jl:89-98)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import TestModel


def mixture(weight: float, model_a: TestModel, model_b: TestModel) -> TestModel:
    """weight * A + (1 - weight) * B. Requires normalized component log
    densities for exact mixing; our Gaussian/funnel models are unnormalized,
    so components must share the same normalization constant — for two MVNs
    of the same dimension this holds iff |cov_A| == |cov_B|. For testing we
    instead add the proper normalization constants."""
    if model_a.dim != model_b.dim:
        raise ValueError("mixture components must have equal dimension")
    if not 0 < weight < 1:
        raise ValueError("weight must be in (0, 1)")
    dim = model_a.dim

    # Proper normalization: for our Gaussian TestModels cov_fn is available.
    def log_norm(model):
        if model.cov_fn is None:
            return 0.0
        cov = model.cov_fn()
        sign, logdet = jnp.linalg.slogdet(cov)
        return -0.5 * (dim * jnp.log(2 * jnp.pi) + logdet)

    la, lb = log_norm(model_a), log_norm(model_b)
    lw_a, lw_b = jnp.log(weight), jnp.log1p(-weight)

    def logdensity_fn(q):
        return jnp.logaddexp(
            lw_a + la + model_a.logdensity_fn(q),
            lw_b + lb + model_b.logdensity_fn(q),
        )

    sample_fn = None
    if model_a.sample_fn is not None and model_b.sample_fn is not None:

        def sample_fn(key, n):
            ka, kb, kc = jax.random.split(key, 3)
            xa = model_a.sample(ka, n)
            xb = model_b.sample(kb, n)
            pick_a = jax.random.uniform(kc, (n, 1)) < weight
            return jnp.where(pick_a, xa, xb)

    return TestModel(dim=dim, logdensity_fn=logdensity_fn, sample_fn=sample_fn)
