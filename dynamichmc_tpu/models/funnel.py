"""Neal's funnel — the hierarchical-pathology benchmark target.

BASELINE config 4: divergence + EBFMI + tree-depth diagnostics on a funnel.
Exactly characterized: v ~ N(0, sigma_v^2); x_i | v ~ N(0, e^v), i=1..dim-1.
The exact sampler makes Anderson-Darling gates possible
(cf. /root/reference/test/sample-correctness_tests.jl:100-118, which mixes a
funnel with a normal to keep tails testable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import TestModel


def funnel(
    dim: int, sigma_v: float = 3.0, dtype=jnp.float64,
    tree_kernel: bool = False,
) -> TestModel:
    """q = (v, x_1..x_{dim-1}). ``tree_kernel=True`` attaches the
    whole-transition Pallas kernel (ops/pallas_tree.py, analytic gradient;
    statistical gates in tests/test_pallas_tree.py)."""

    tree_transition_fn = None
    if tree_kernel:
        from ..ops.pallas_tree import make_funnel_tree_transition

        tree_transition_fn = make_funnel_tree_transition(dim, sigma_v)

    def logdensity_fn(q):
        v = q[0]
        x = q[1:]
        lp_v = -0.5 * (v / sigma_v) ** 2
        # x_i ~ N(0, e^v): -(dim-1)/2 * v - 0.5 * e^-v * sum x^2
        lp_x = -0.5 * (dim - 1) * v - 0.5 * jnp.exp(-v) * jnp.sum(x * x)
        return lp_v + lp_x

    def sample_fn(key, n):
        kv, kx = jax.random.split(key)
        v = sigma_v * jax.random.normal(kv, (n, 1), dtype)
        x = jnp.exp(v / 2) * jax.random.normal(kx, (n, dim - 1), dtype)
        return jnp.concatenate([v, x], axis=1)

    # v-marginal misses -0.5 log(2 pi sigma_v^2); each x_i misses
    # -0.5 log(2 pi) (the -v/2 Jacobian part IS in lp_x).
    # host-side np: model construction must not touch the XLA backend, and
    # an f32-rounded constant would leak into exact mixture weighting
    log_normalization = float(
        -0.5 * dim * np.log(2 * np.pi) - np.log(sigma_v)
    )
    return TestModel(
        dim=dim,
        logdensity_fn=logdensity_fn,
        sample_fn=sample_fn,
        log_normalization=log_normalization,
        tree_transition_fn=tree_transition_fn,
    )
