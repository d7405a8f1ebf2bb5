"""Gaussian targets: standard, correlated, ill-conditioned.

Mirrors the workloads of the reference's sample-correctness tests
(/root/reference/test/sample-correctness_tests.jl:12-87): random correlated
MVNs with dense-metric warmup, pinned ill-conditioned MVNs, and extreme
variances. The log density and its gradient are one matmul each — on TPU these
batch over chains onto the MXU, and the fused ``logdensity_and_gradient``
override shares the single (K,) matvec between value and gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import TestModel


def _gaussian_model(
    mean: jnp.ndarray, cov: np.ndarray, fused: bool = False,
    tree_kernel: bool = False,
) -> TestModel:
    mean = jnp.asarray(mean)
    dim = mean.shape[0]
    cov_np = np.asarray(cov, np.float64)
    prec_np = np.linalg.inv(cov_np)
    prec = jnp.asarray(prec_np, mean.dtype)
    chol = jnp.asarray(np.linalg.cholesky(cov_np), mean.dtype)
    # L^T with prec = L L^T: the value is computed as the cancellation-free
    # whitened sum of squares -0.5 ||L^T d||^2 (float32-safe; a direct
    # d . (prec d) quadratic form carries a systematic f32 bias that
    # measurably over-disperses the worst-conditioned coordinates)
    prec_chol_t = jnp.asarray(np.linalg.cholesky(prec_np).T, mean.dtype)

    tree_transition_fn = None
    if tree_kernel:
        from ..ops.pallas_tree import make_gaussian_tree_transition

        # same f64-constructed L^T as the fused hooks below
        tree_transition_fn = make_gaussian_tree_transition(
            prec, mean, prec_chol_t=prec_chol_t
        )

    fused_leapfrog_fn = None
    fused_leaf_batched_fn = None
    if fused:
        from ..ops.pallas_leaf import make_gaussian_fused_leaf_batched
        from ..ops.pallas_leapfrog import make_gaussian_fused_leapfrog

        # both fused hooks share the model's EXACT L^T (f64-constructed):
        # re-deriving it from an f32-rounded prec would make the kernels'
        # whitened values disagree with the model's own logdensity
        fused_leapfrog_fn = make_gaussian_fused_leapfrog(
            prec, mean, prec_chol_t=prec_chol_t
        )
        fused_leaf_batched_fn = make_gaussian_fused_leaf_batched(
            prec, mean, prec_chol_t=prec_chol_t
        )

    def logdensity_fn(q):
        d = q - mean.astype(q.dtype)
        w = prec_chol_t.astype(q.dtype) @ d
        return -0.5 * jnp.sum(w * w)

    def logdensity_and_gradient_fn(q):
        d = q - mean.astype(q.dtype)
        w = prec_chol_t.astype(q.dtype) @ d
        pd = prec.astype(q.dtype) @ d
        return -0.5 * jnp.sum(w * w), -pd

    def sample_fn(key, n):
        z = jax.random.normal(key, (n, dim), mean.dtype)
        return z @ chol.T + mean

    return TestModel(
        dim=dim,
        logdensity_fn=logdensity_fn,
        logdensity_and_gradient_fn=logdensity_and_gradient_fn,
        fused_leapfrog_fn=fused_leapfrog_fn,
        fused_leaf_batched_fn=fused_leaf_batched_fn,
        tree_transition_fn=tree_transition_fn,
        sample_fn=sample_fn,
        mean_fn=lambda: mean,
        cov_fn=lambda: jnp.asarray(cov_np),
        log_normalization=float(
            -0.5 * (dim * np.log(2 * np.pi) + np.linalg.slogdet(cov_np)[1])
        ),
    )


def std_normal(dim: int, dtype=jnp.float64) -> TestModel:
    """N(0, I_dim) with a direct quadratic log density (no matmul)."""
    mean = jnp.zeros((dim,), dtype)

    def logdensity_fn(q):
        return -0.5 * jnp.sum(q * q)

    def logdensity_and_gradient_fn(q):
        return -0.5 * jnp.sum(q * q), -q

    def sample_fn(key, n):
        return jax.random.normal(key, (n, dim), dtype)

    return TestModel(
        dim=dim,
        logdensity_fn=logdensity_fn,
        logdensity_and_gradient_fn=logdensity_and_gradient_fn,
        sample_fn=sample_fn,
        mean_fn=lambda: mean,
        cov_fn=lambda: jnp.eye(dim, dtype=dtype),
        log_normalization=float(-0.5 * dim * np.log(2 * np.pi)),
    )


def mvnormal(
    mean, cov, fused: bool = False, tree_kernel: bool = False
) -> TestModel:
    """MVN with the given mean and covariance. ``fused=True`` attaches the
    single-kernel Pallas leapfrog (ops/pallas_leapfrog.py); ``tree_kernel=
    True`` the whole-transition Pallas kernel (ops/pallas_tree.py)."""
    return _gaussian_model(
        jnp.asarray(mean), cov, fused=fused, tree_kernel=tree_kernel
    )


def correlated_gaussian(
    dim: int, rho: float = 0.8, seed: int = 0, random_rotation: bool = True,
    dtype=jnp.float64, fused: bool = False, tree_kernel: bool = False,
) -> TestModel:
    """A dense correlated Gaussian (the BASELINE 100-d benchmark target):
    equicorrelated with coefficient ``rho``, optionally randomly rotated and
    scaled so the covariance has non-trivial structure."""
    rng = np.random.RandomState(seed)
    base = np.full((dim, dim), rho) + (1 - rho) * np.eye(dim)
    if random_rotation:
        q, _ = np.linalg.qr(rng.randn(dim, dim))
        scales = np.exp(rng.uniform(-1, 1, dim))
        base = (q * scales) @ base @ (q * scales).T
    base = (base + base.T) / 2
    return _gaussian_model(
        jnp.zeros((dim,), dtype), base, fused=fused, tree_kernel=tree_kernel
    )


def ill_conditioned_gaussian(
    dim: int, condition_number: float = 1e6, seed: int = 1, dtype=jnp.float64
) -> TestModel:
    """Random rotation of a diagonal covariance with geometrically spaced
    eigenvalues spanning ``condition_number`` (cf. the pinned ill-conditioned
    workloads, sample-correctness_tests.jl:25-46)."""
    rng = np.random.RandomState(seed)
    eigs = np.geomspace(1.0, condition_number, dim)
    q, _ = np.linalg.qr(rng.randn(dim, dim))
    cov = (q * eigs) @ q.T
    cov = (cov + cov.T) / 2
    return _gaussian_model(jnp.zeros((dim,), dtype), cov)


def extreme_variance_gaussian(dim: int = 2, log10_range: float = 8.0, dtype=jnp.float64):
    """Diagonal Gaussian with variances 10^±log10_range
    (sample-correctness_tests.jl:48-87)."""
    variances = np.geomspace(10.0**-log10_range, 10.0**log10_range, dim)
    return _gaussian_model(jnp.zeros((dim,), dtype), np.diag(variances))
