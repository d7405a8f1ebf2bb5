"""Streaming (Welford) moment estimation for metric adaptation.

The reference estimates the metric by storing every draw of a tuning block and
taking ``var``/``cov`` at the end (/root/reference/src/mcmc.jl:209-211,262-286).
On TPU we replace store-then-estimate with a streaming Welford fold so that the
adaptation ``lax.scan`` carries O(K) / O(K^2) state instead of O(K*N) draws,
while producing bitwise-identical (up to fp association) Bessel-corrected
variance/covariance estimates.
"""

from __future__ import annotations

import jax.numpy as jnp

from .pytree import pytree_dataclass


@pytree_dataclass
class WelfordState:
    """Running first/second moments.

    ``m2`` has shape (K,) for diagonal accumulation or (K, K) for dense.
    """

    count: jnp.ndarray  # scalar, float (avoids int/float casts in the fold)
    mean: jnp.ndarray  # (K,)
    m2: jnp.ndarray  # (K,) or (K, K)


def welford_init(dim: int, dense: bool, dtype=jnp.float32) -> WelfordState:
    m2_shape = (dim, dim) if dense else (dim,)
    return WelfordState(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros(m2_shape, dtype),
    )


def welford_update(state: WelfordState, x: jnp.ndarray) -> WelfordState:
    count = state.count + 1
    delta = x - state.mean
    mean = state.mean + delta / count
    delta2 = x - mean
    if state.m2.ndim == 2:
        m2 = state.m2 + jnp.outer(delta, delta2)
    else:
        m2 = state.m2 + delta * delta2
    return WelfordState(count=count, mean=mean, m2=m2)


def welford_variance(state: WelfordState) -> jnp.ndarray:
    """Sample variance (ddof=1), matching Julia's ``var`` used at mcmc.jl:209."""
    return state.m2 / jnp.maximum(state.count - 1, 1)


def welford_covariance(state: WelfordState) -> jnp.ndarray:
    """Sample covariance (ddof=1), matching ``cov`` at mcmc.jl:211; symmetrized."""
    cov = state.m2 / jnp.maximum(state.count - 1, 1)
    return (cov + cov.T) / 2


def pool_welford_over_axis(w: WelfordState, axis_name) -> WelfordState:
    """Chan-combine Welford states across a named mesh/vmap axis into the
    moments of the union of all members' draws (equal counts per member).
    Used both for per-chain states under a chain axis and per-device
    locally-pooled states under a device mesh."""
    import jax

    grand = jax.lax.pmean(w.mean, axis_name)
    delta = w.mean - grand
    if w.m2.ndim == 2:
        corr = w.count * jnp.outer(delta, delta)
    else:
        corr = w.count * delta * delta
    return WelfordState(
        count=jax.lax.psum(w.count, axis_name),
        mean=grand,
        m2=jax.lax.psum(w.m2 + corr, axis_name),
    )
