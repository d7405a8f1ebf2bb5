"""L1 tests: kinetic energy algebra, leapfrog properties, fault poisoning.

Ports the property tests of /root/reference/test/test_hamiltonian.jl:
W-factor consistency, momentum-draw covariance, psharp vs autodiff gradient,
leapfrog vs an independent naive implementation, Hamiltonian invariance at
small stepsize, time reversal, non-finite poisoning, and a fixed-length HMC
built only on L1 recovering N(0, I) moments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu.hamiltonian import (
    EvaluatedPoint,
    PhasePoint,
    evaluate,
    evaluate_strict,
    joint_logdensity,
    leapfrog,
)
from dynamichmc_tpu.logdensity import from_logdensity_fn
from dynamichmc_tpu.metric import (
    dense_metric,
    diagonal_metric,
    identity_metric,
    kinetic_energy,
    psharp,
    rand_p,
)
from dynamichmc_tpu.errors import DynamicHMCError

KEY = jax.random.PRNGKey(42)


def random_spd(key, k):
    a = jax.random.normal(key, (k, k), jnp.float64)
    return a @ a.T + k * jnp.eye(k)


@pytest.mark.parametrize("kind", ["diagonal", "dense"])
def test_metric_w_consistency(kind):
    # test_hamiltonian.jl:20-32: W @ W' == M == inv(M^-1)
    k = 4
    if kind == "diagonal":
        m_inv = jnp.abs(jax.random.normal(KEY, (k,), jnp.float64)) + 0.5
        metric = diagonal_metric(m_inv)
        m = jnp.diag(1 / m_inv)
        w_full = jnp.diag(metric.w_diag)
    else:
        m_inv = random_spd(KEY, k)
        metric = dense_metric(m_inv)
        m = jnp.linalg.inv(m_inv)
        w_full = metric.w
    np.testing.assert_allclose(np.asarray(w_full @ w_full.T), np.asarray(m), rtol=1e-9)


@pytest.mark.parametrize("kind", ["diagonal", "dense"])
def test_momentum_draw_covariance(kind):
    # test_hamiltonian.jl:33-40: cov of p draws approx M
    k = 3
    if kind == "diagonal":
        m_inv = jnp.asarray([0.5, 1.0, 2.0], jnp.float64)
        metric = diagonal_metric(m_inv)
        m = np.diag(1 / np.asarray(m_inv))
    else:
        m_inv = random_spd(jax.random.PRNGKey(7), k)
        metric = dense_metric(m_inv)
        m = np.linalg.inv(np.asarray(m_inv))
    draws = jax.vmap(lambda key: rand_p(key, metric))(
        jax.random.split(KEY, 20_000)
    )
    np.testing.assert_allclose(np.cov(np.asarray(draws).T), m, atol=0.1, rtol=0.1)


@pytest.mark.parametrize("kind", ["diagonal", "dense"])
def test_psharp_is_gradient_of_kinetic_energy(kind):
    # test_hamiltonian.jl:9-14 (ForwardDiff check -> jax.grad)
    k = 5
    if kind == "diagonal":
        metric = diagonal_metric(jnp.linspace(0.5, 2.0, k))
    else:
        metric = dense_metric(random_spd(jax.random.PRNGKey(3), k))
    p = jax.random.normal(KEY, (k,), jnp.float64)
    g = jax.grad(lambda p: kinetic_energy(metric, p))(p)
    np.testing.assert_allclose(np.asarray(g), np.asarray(psharp(metric, p)), rtol=1e-10)


def _mvn_logdensity(prec):
    return lambda q: -0.5 * q @ prec @ q


def test_leapfrog_matches_naive():
    # test_hamiltonian.jl:69-109: exact match against an independent
    # implementation written without caching.
    k = 3
    prec = np.asarray(random_spd(jax.random.PRNGKey(5), k))
    ld = from_logdensity_fn(k, _mvn_logdensity(jnp.asarray(prec)))
    m_inv = np.asarray(random_spd(jax.random.PRNGKey(6), k))
    metric = dense_metric(jnp.asarray(m_inv))
    q = np.asarray(jax.random.normal(jax.random.PRNGKey(8), (k,), jnp.float64))
    p = np.asarray(jax.random.normal(jax.random.PRNGKey(9), (k,), jnp.float64))
    eps = 0.1
    n_steps = 7

    # naive python leapfrog
    def grad(q):
        return -prec @ q

    qn, pn = q.copy(), p.copy()
    for _ in range(n_steps):
        pm = pn + eps / 2 * grad(qn)
        qn = qn + eps * (m_inv @ pm)
        pn = pm + eps / 2 * grad(qn)

    z = PhasePoint(Q=evaluate(ld, jnp.asarray(q)), p=jnp.asarray(p))
    for _ in range(n_steps):
        z = leapfrog(ld, metric, z, eps)
    np.testing.assert_allclose(np.asarray(z.Q.q), qn, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(z.p), pn, rtol=1e-10)
    # cached values are consistent (test_hamiltonian.jl:49-67)
    np.testing.assert_allclose(
        float(z.Q.logdensity), float(_mvn_logdensity(jnp.asarray(prec))(z.Q.q)),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(z.Q.grad), -prec @ np.asarray(z.Q.q), rtol=1e-10
    )


def test_hamiltonian_invariance_small_steps():
    # test_hamiltonian.jl:118-141: H is nearly conserved at eps/100.
    k = 2
    ld = from_logdensity_fn(k, lambda q: -0.5 * jnp.sum(q**2))
    metric = identity_metric(k, dtype=jnp.float64)
    z = PhasePoint(
        Q=evaluate(ld, jnp.asarray([0.3, -1.2])), p=jnp.asarray([0.7, 0.2])
    )
    h0 = float(joint_logdensity(metric, z))
    eps = 0.001
    for _ in range(200):
        z = leapfrog(ld, metric, z, eps)
    h1 = float(joint_logdensity(metric, z))
    assert abs(h1 - h0) < 1e-5


def test_leapfrog_time_reversal():
    # test_hamiltonian.jl:143-177: forward then backward returns to start.
    k = 4
    prec = random_spd(jax.random.PRNGKey(11), k)
    ld = from_logdensity_fn(k, _mvn_logdensity(prec))
    metric = diagonal_metric(jnp.linspace(0.5, 1.5, k))
    q0 = jax.random.normal(jax.random.PRNGKey(12), (k,), jnp.float64)
    p0 = jax.random.normal(jax.random.PRNGKey(13), (k,), jnp.float64)
    z = PhasePoint(Q=evaluate(ld, q0), p=p0)
    eps = 0.3
    for _ in range(5):
        z = leapfrog(ld, metric, z, eps)
    # reverse: flip momentum, integrate, flip back
    z = PhasePoint(Q=z.Q, p=-z.p)
    for _ in range(5):
        z = leapfrog(ld, metric, z, eps)
    np.testing.assert_allclose(np.asarray(z.Q.q), np.asarray(q0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(-z.p), np.asarray(p0), atol=1e-5)


def test_poisoning_nonfinite():
    # test_hamiltonian.jl:179-202 + hamiltonian.jl:202-217 semantics.
    ld_nan = from_logdensity_fn(2, lambda q: jnp.where(q[0] > 1, jnp.nan, -q @ q))
    E = evaluate(ld_nan, jnp.asarray([2.0, 0.0]))
    assert float(E.logdensity) == -np.inf
    # clean -inf rejection is preserved as-is
    ld_inf = from_logdensity_fn(2, lambda q: jnp.where(q[0] > 1, -jnp.inf, -q @ q))
    E2 = evaluate(ld_inf, jnp.asarray([2.0, 0.0]))
    assert float(E2.logdensity) == -np.inf
    # joint density poisons non-finite kinetic energy
    metric = identity_metric(2, dtype=jnp.float64)
    z = PhasePoint(Q=evaluate(ld_inf, jnp.zeros(2)), p=jnp.asarray([jnp.inf, 0.0]))
    assert float(joint_logdensity(metric, z)) == -np.inf


def test_strict_evaluation_errors():
    ld_nan = from_logdensity_fn(1, lambda q: jnp.nan * q[0])
    with pytest.raises(DynamicHMCError):
        evaluate_strict(ld_nan, jnp.ones(1))
    with pytest.raises(DynamicHMCError):
        evaluate_strict(
            from_logdensity_fn(1, lambda q: -q[0] ** 2), jnp.asarray([jnp.nan])
        )
    # an initial point OUTSIDE the support (-inf) is also rejected: a -inf
    # pi0 makes every leaf delta NaN, which never flags divergent
    # (deliberate deviation from hamiltonian.jl's strict branch)
    with pytest.raises(DynamicHMCError, match="Invalid log posterior"):
        evaluate_strict(
            from_logdensity_fn(
                1, lambda q: jnp.where(q[0] > 0, -q[0], -jnp.inf)
            ),
            jnp.asarray([-1.0]),
        )


def test_fixed_length_hmc_recovers_standard_normal():
    # test_hamiltonian.jl:217-258: a plain HMC built only on L1 recovers
    # N(0, I) moments.
    k = 2
    ld = from_logdensity_fn(k, lambda q: -0.5 * jnp.sum(q**2))
    metric = identity_metric(k, dtype=jnp.float64)

    def transition(Q, key):
        kp, ka = jax.random.split(key)
        p = rand_p(kp, metric)
        z0 = PhasePoint(Q=Q, p=p)
        h0 = joint_logdensity(metric, z0)
        z = z0
        for _ in range(13):
            z = leapfrog(ld, metric, z, 0.35)
        h1 = joint_logdensity(metric, z)
        accept = jnp.log(jax.random.uniform(ka)) < h1 - h0
        Q_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), z.Q, Q
        )
        return Q_new, Q_new.q

    keys = jax.random.split(KEY, 6000)
    Q0 = evaluate(ld, jnp.zeros(k))
    _, qs = jax.jit(lambda Q, ks: jax.lax.scan(transition, Q, ks))(Q0, keys)
    qs = np.asarray(qs)[1000:]
    assert np.abs(qs.mean(0)).max() < 0.1
    assert np.abs(qs.std(0) - 1).max() < 0.1
