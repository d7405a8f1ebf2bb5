"""Fused Pallas leapfrog vs the pure-JAX oracle (interpret mode on CPU).

The pure-JAX leapfrog remains the reference implementation (SURVEY.md §7.5);
the Pallas kernel must match it bitwise up to f32 rounding, including the
-inf poisoning of numerical faults, both unbatched (custom_vmap fallback) and
batched (the actual kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu.hamiltonian import PhasePoint, evaluate, leapfrog
from dynamichmc_tpu.metric import diagonal_metric
from dynamichmc_tpu.models import mvnormal

K = 7


@pytest.fixture(scope="module")
def models():
    rng = np.random.RandomState(0)
    a = rng.randn(K, K)
    cov = (a @ a.T + K * np.eye(K)).astype(np.float32)
    plain = mvnormal(np.zeros(K, np.float32), cov)
    fused = mvnormal(np.zeros(K, np.float32), cov, fused=True)
    return plain, fused


def test_unbatched_matches(models):
    plain, fused = models
    metric = diagonal_metric(jnp.linspace(0.5, 2.0, K, dtype=jnp.float32))
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(K), jnp.float32)
    p = jnp.asarray(rng.randn(K), jnp.float32)
    z = PhasePoint(Q=evaluate(plain, q), p=p)
    z1 = leapfrog(plain, metric, z, 0.2)
    z2 = leapfrog(fused, metric, z, 0.2)
    np.testing.assert_allclose(np.asarray(z1.Q.q), np.asarray(z2.Q.q), rtol=2e-6)
    np.testing.assert_allclose(
        float(z1.Q.logdensity), float(z2.Q.logdensity), rtol=2e-5
    )


def test_batched_pallas_matches(models):
    plain, fused = models
    rng = np.random.RandomState(2)
    c = 12
    qs = jnp.asarray(rng.randn(c, K), jnp.float32)
    ps = jnp.asarray(rng.randn(c, K), jnp.float32)
    minvs = jnp.asarray(rng.uniform(0.5, 2.0, (c, K)), jnp.float32)
    eps = jnp.asarray(rng.uniform(-0.3, 0.3, c), jnp.float32)

    def step(model):
        def one(m, q, p, e):
            z = PhasePoint(Q=evaluate(plain, q), p=p)
            return leapfrog(model, diagonal_metric(m), z, e)

        return jax.jit(jax.vmap(one))(minvs, qs, ps, eps)

    za = step(plain)
    zb = step(fused)
    np.testing.assert_allclose(
        np.asarray(za.Q.q), np.asarray(zb.Q.q), rtol=3e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(za.Q.logdensity),
        np.asarray(zb.Q.logdensity),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(za.p), np.asarray(zb.p), rtol=3e-5, atol=1e-5
    )


def test_fused_transition_statistics_match(models):
    # Full NUTS transitions through the fused path recover the same target.
    plain, fused = models
    from dynamichmc_tpu.metric import identity_metric
    from dynamichmc_tpu.nuts import NUTS, sample_tree

    metric = identity_metric(K, dtype=jnp.float32)
    c = 512
    rng = np.random.RandomState(3)
    cov = np.asarray(plain.cov_fn())
    chol = np.linalg.cholesky(cov)
    q0 = jnp.asarray((chol @ rng.randn(K, c)).T, jnp.float32)
    Q0 = jax.vmap(lambda q: evaluate(plain, q))(q0)

    def one(model):
        def f(key, Q):
            Qn, stats = sample_tree(key, NUTS(), model, metric, Q, 0.25)
            return Qn.q, stats.is_divergent

        keys = jax.random.split(jax.random.PRNGKey(4), c)
        return jax.jit(jax.vmap(f))(keys, Q0)

    qa, diva = one(plain)
    qb, divb = one(fused)
    # same RNG stream + same arithmetic (up to f32 fusion differences):
    # moments agree tightly
    np.testing.assert_allclose(
        np.asarray(qa).mean(0), np.asarray(qb).mean(0), atol=0.3
    )
    np.testing.assert_allclose(
        np.asarray(qa).std(0), np.asarray(qb).std(0), rtol=0.15
    )
    assert not np.asarray(diva).any() and not np.asarray(divb).any()


def test_poisoning_in_fused_path(models):
    _plain, fused = models
    metric = diagonal_metric(jnp.ones(K, jnp.float32))
    q = jnp.zeros(K, jnp.float32)
    p = jnp.full((K,), 1e25, jnp.float32)  # blow up the position update
    z = PhasePoint(Q=evaluate(fused, q), p=p)
    out = leapfrog(fused, metric, z, 1e10)
    assert float(out.Q.logdensity) == -np.inf


def test_dense_metric_falls_back_to_pure_jax(models):
    """A fused model with a DenseMetric (the default dense-warmup config)
    must fall back to the pure-JAX leapfrog, not raise at trace time."""
    from dynamichmc_tpu.metric import dense_metric

    plain, fused = models
    rng = np.random.RandomState(3)
    a = rng.randn(K, K)
    m_inv = jnp.asarray(a @ a.T + K * np.eye(K), jnp.float32)
    metric = dense_metric(m_inv)
    q = jnp.asarray(rng.randn(K), jnp.float32)
    p = jnp.asarray(rng.randn(K), jnp.float32)
    z = PhasePoint(Q=evaluate(plain, q), p=p)
    z1 = leapfrog(plain, metric, z, 0.1)
    z2 = leapfrog(fused, metric, z, 0.1)
    np.testing.assert_allclose(np.asarray(z1.Q.q), np.asarray(z2.Q.q), rtol=2e-5)
    np.testing.assert_allclose(
        float(z1.Q.logdensity), float(z2.Q.logdensity), rtol=2e-4
    )
    # vmapped too (the batched transition path)
    zb = PhasePoint(
        Q=evaluate(plain, q), p=jnp.asarray(rng.randn(4, K), jnp.float32)
    )
    step = jax.vmap(lambda pp: leapfrog(fused, metric, PhasePoint(Q=zb.Q, p=pp), 0.1))
    out = step(zb.p)
    assert np.all(np.isfinite(np.asarray(out.Q.logdensity)))
