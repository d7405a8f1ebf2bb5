"""Euclidean-Gaussian kinetic energies (the mass matrix / metric).

TPU-native re-design of ``GaussianKineticEnergy``
(/root/reference/src/hamiltonian.jl:36-124): the metric stores the inverse mass
matrix M^-1 (used in dynamics) and a factor W with W @ W.T = M (used to draw
momenta). Diagonal metrics store vectors; dense metrics store full matrices so
that ``psharp = M^-1 p`` batched over chains is a single MXU matmul.

Construction from M^-1 for the dense case avoids explicitly inverting: with
M^-1 = L L^T (Cholesky), W = L^{-T} satisfies W W^T = M and is obtained by a
triangular solve (more stable than ``cholesky(inv(M^-1))`` used at
hamiltonian.jl:73, and numerically equivalent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from .utils.pytree import pytree_dataclass


@pytree_dataclass
class DiagonalMetric:
    """Diagonal Gaussian kinetic energy: M^-1 = diag(m_inv).

    ``w_diag = 1/sqrt(m_inv)`` so that ``diag(w)^2 = M``
    (cf. hamiltonian.jl:80).
    """

    m_inv: jnp.ndarray  # (K,)
    w_diag: jnp.ndarray  # (K,)


@pytree_dataclass
class DenseMetric:
    """Dense Gaussian kinetic energy: full M^-1 and a factor W with W W^T = M."""

    m_inv: jnp.ndarray  # (K, K)
    w: jnp.ndarray  # (K, K)


Metric = DiagonalMetric | DenseMetric


def diagonal_metric(m_inv: jnp.ndarray) -> DiagonalMetric:
    m_inv = jnp.asarray(m_inv)
    return DiagonalMetric(m_inv=m_inv, w_diag=jax.lax.rsqrt(m_inv))


def dense_metric(m_inv: jnp.ndarray) -> DenseMetric:
    m_inv = jnp.asarray(m_inv)
    m_inv = (m_inv + m_inv.T) / 2
    chol = jnp.linalg.cholesky(m_inv)  # L, lower: M^-1 = L L^T
    eye = jnp.eye(m_inv.shape[0], dtype=m_inv.dtype)
    # W = L^{-T}: solve L^T W = I. W is upper triangular; W W^T = (L L^T)^-1 = M.
    w = solve_triangular(chol.T, eye, lower=False)
    return DenseMetric(m_inv=m_inv, w=w)


def identity_metric(dim: int, m_inv_scalar: float = 1.0, dtype=jnp.float32) -> DiagonalMetric:
    """Uniform-scaling metric M^-1 = m_inv * I (cf. hamiltonian.jl:87)."""
    return diagonal_metric(jnp.full((dim,), m_inv_scalar, dtype=dtype))


def kinetic_energy(metric: Metric, p: jnp.ndarray) -> jnp.ndarray:
    """K(p) = p^T M^-1 p / 2 (hamiltonian.jl:103).

    NOTE: deliberately computed with the SAME M^-1 arrays used by the
    dynamics (psharp) and the momentum draw (w): a numerically "nicer"
    whitened form ||chol(M^-1)^T p||^2 with a float32 on-device Cholesky is
    INCONSISTENT with those pieces on ill-conditioned adapted metrics and
    injects O(1) energy noise that collapses the adapted stepsize. The
    position log density is where cancellation-free evaluation matters (the
    model can supply it; see models/gaussian.py)."""
    if isinstance(metric, DiagonalMetric):
        return 0.5 * jnp.sum(metric.m_inv * p * p)
    return 0.5 * jnp.dot(p, metric.m_inv @ p)


def psharp(metric: Metric, p: jnp.ndarray) -> jnp.ndarray:
    """p# = M^-1 p, the velocity; used in dynamics and turn diagnostics
    (hamiltonian.jl:110,117)."""
    if isinstance(metric, DiagonalMetric):
        return metric.m_inv * p
    return metric.m_inv @ p


def rand_p(key: jax.Array, metric: Metric, dtype=None) -> jnp.ndarray:
    """Draw momentum p ~ N(0, M) via W @ z with z standard normal
    (hamiltonian.jl:124)."""
    if isinstance(metric, DiagonalMetric):
        shape = metric.m_inv.shape
        dt = dtype or metric.m_inv.dtype
        return metric.w_diag.astype(dt) * jax.random.normal(key, shape, dt)
    shape = (metric.m_inv.shape[0],)
    dt = dtype or metric.m_inv.dtype
    return metric.w.astype(dt) @ jax.random.normal(key, shape, dt)


def metric_dim(metric: Metric) -> int:
    return metric.m_inv.shape[0]


def sqrt_diag_m_inv(metric: Metric) -> jnp.ndarray:
    """sqrt(diag(M^-1)), the per-coordinate scale; used in reporting."""
    if isinstance(metric, DiagonalMetric):
        return jnp.sqrt(metric.m_inv)
    return jnp.sqrt(jnp.diag(metric.m_inv))
