"""Fast (Gumbel-argmax multinomial) driver vs the generic progressive-merge
driver: the two must produce the same proposal distribution (within-tree
multinomial + biased combine at doublings are mathematically identical), the
same termination/depth behavior, and the same acceptance statistics."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import anderson_ksamp

from dynamichmc_tpu.hamiltonian import evaluate
from dynamichmc_tpu.metric import diagonal_metric, identity_metric
from dynamichmc_tpu.models import mvnormal, std_normal
from dynamichmc_tpu.nuts import NUTS, sample_tree

KEY = jax.random.PRNGKey(0)


def run_transitions(model, metric, eps, fast, n=6000, k=3, key=KEY):
    cov = np.asarray(model.cov_fn())
    chol = np.linalg.cholesky(cov)
    rng = np.random.RandomState(42)
    q0 = jnp.asarray((chol @ rng.randn(k, n)).T)
    Q0 = jax.vmap(lambda q: evaluate(model, q))(q0)

    def one(kk, Q):
        Qn, stats = sample_tree(kk, NUTS(), model, metric, Q, eps, fast=fast)
        return Qn.q, stats

    keys = jax.random.split(key, n)
    return jax.jit(jax.vmap(one))(keys, Q0)


def test_fast_matches_generic_distribution():
    k = 3
    rng = np.random.RandomState(1)
    a = rng.randn(k, k)
    cov = a @ a.T + k * np.eye(k)
    model = mvnormal(np.zeros(k), cov)
    metric = diagonal_metric(jnp.asarray([0.8, 1.1, 1.4]))

    q_fast, s_fast = run_transitions(model, metric, 0.4, fast=True)
    q_gen, s_gen = run_transitions(model, metric, 0.4, fast=False)

    # identical per-chain deterministic quantities: directions + step counts
    # + depth + termination use the same RNG stream and identical traversal
    np.testing.assert_array_equal(
        np.asarray(s_fast.directions), np.asarray(s_gen.directions)
    )
    np.testing.assert_array_equal(np.asarray(s_fast.steps), np.asarray(s_gen.steps))
    np.testing.assert_array_equal(np.asarray(s_fast.depth), np.asarray(s_gen.depth))
    np.testing.assert_array_equal(
        np.asarray(s_fast.term_left), np.asarray(s_gen.term_left)
    )
    np.testing.assert_allclose(
        np.asarray(s_fast.acceptance_rate),
        np.asarray(s_gen.acceptance_rate),
        rtol=1e-5,
    )

    # proposal marginals agree with each other and with the exact target
    qf, qg = np.asarray(q_fast, np.float64), np.asarray(q_gen, np.float64)
    exact = np.asarray(model.sample(jax.random.PRNGKey(7), qf.shape[0]), np.float64)
    for j in range(k):
        p1 = anderson_ksamp([qf[:, j], qg[:, j]]).significance_level
        p2 = anderson_ksamp([qf[:, j], exact[:, j]]).significance_level
        assert p1 > 0.01 / k, f"fast vs generic differ on coord {j}: p={p1}"
        assert p2 > 0.01 / k, f"fast driver off-target on coord {j}: p={p2}"


def test_fast_divergence_bookkeeping():
    from dynamichmc_tpu.logdensity import from_logdensity_fn

    k = 2
    ld = from_logdensity_fn(
        k, lambda q: jnp.where(jnp.sum(q**2) < 1e-8, 0.0, -jnp.inf)
    )
    metric = identity_metric(k, dtype=jnp.float64)
    Q0 = evaluate(ld, jnp.zeros(k))
    Q1, stats = jax.jit(
        lambda key: sample_tree(key, NUTS(), ld, metric, Q0, 0.5, fast=True)
    )(KEY)
    assert bool(stats.is_divergent)
    assert int(stats.depth) == 0
    assert int(stats.steps) == 1
    np.testing.assert_array_equal(np.asarray(Q1.q), np.zeros(k))


def test_fast_single_transition_stationarity():
    k = 3
    model = std_normal(k)
    metric = identity_metric(k, dtype=jnp.float64)
    q, stats = run_transitions(model, metric, 0.35, fast=True, n=8192)
    q = np.asarray(q)
    np.testing.assert_allclose(q.mean(0), np.zeros(k), atol=0.08)
    np.testing.assert_allclose(q.std(0), np.ones(k), rtol=0.08)
    assert not np.asarray(stats.is_divergent).any()
