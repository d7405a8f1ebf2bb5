"""Coordinate-wise tail transforms of exactly characterized targets.

The TPU analogue of LogDensityTestSuite's ``elongate`` heavy-tail construction
(used at /root/reference/test/sample-correctness_tests.jl:100-118): if X has an
exactly characterized distribution, Y = sign(X) |X|^(1+gamma) has heavier
(gamma > 0) tails, and both the log density (change of variables) and the
exact sampler (push-forward) remain available.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import TestModel


def elongate(gamma: float, model: TestModel) -> TestModel:
    """y = sign(x) |x|^(1+gamma), coordinate-wise, applied to ``model``.

    log p_Y(y) = log p_X(x(y)) + sum log |dx/dy|, with
    x = sign(y) |y|^(1/(1+gamma)).
    """
    if gamma <= -1:
        raise ValueError("gamma must be > -1")
    a = 1.0 + gamma
    inv_a = 1.0 / a

    def inverse(y):
        ay = jnp.abs(y)
        return jnp.sign(y) * ay**inv_a

    def log_jacobian_inv(y):
        # dx/dy = (1/a) |y|^{1/a - 1}; guard y = 0 (measure-zero)
        ay = jnp.maximum(jnp.abs(y), jnp.finfo(y.dtype).tiny)
        return jnp.sum(jnp.log(inv_a) + (inv_a - 1.0) * jnp.log(ay))

    def logdensity_fn(y):
        x = inverse(y)
        return model.logdensity_fn(x) + log_jacobian_inv(y)

    sample_fn = None
    if model.sample_fn is not None:

        def sample_fn(key, n):
            x = model.sample(key, n)
            return jnp.sign(x) * jnp.abs(x) ** a

    # a change of variables preserves the normalization constant exactly,
    # so elongated targets remain usable as mixture components
    return TestModel(
        dim=model.dim,
        logdensity_fn=logdensity_fn,
        sample_fn=sample_fn,
        log_normalization=model.log_normalization,
    )
