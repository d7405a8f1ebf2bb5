"""NUTS-layer tests: turn-statistic algebra, acceptance statistics,
divergence bookkeeping, single-transition stationarity.

Ports /root/reference/test/test_NUTS.jl: hand-built GeneralizedTurnStatistic
checks (test_NUTS.jl:27-55), an always-divergent model (test_NUTS.jl:57-85),
and single-transition moment recovery on random MVNs (test_NUTS.jl:87-111) —
here run as 8192 vmapped chains, which also gates per-chain isolation of
divergence/termination state under vmap.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dynamichmc_tpu.hamiltonian import evaluate
from dynamichmc_tpu.logdensity import from_logdensity_fn
from dynamichmc_tpu.metric import dense_metric, identity_metric
from dynamichmc_tpu.nuts import (
    NUTS,
    AcceptanceStatistic,
    GeneralizedTurnStatistic,
    _combine_turn_statistics,
    acceptance_rate,
    sample_tree,
)

KEY = jax.random.PRNGKey(0)


def leaf_tau(p):
    p = jnp.asarray(p, jnp.float64)
    return GeneralizedTurnStatistic(
        p_minus=p, psharp_minus=p, p_plus=p, psharp_plus=p, rho=p
    )


def test_turn_statistic_straight_line_no_turn():
    # momenta all pointing the same way never turn
    tau = leaf_tau([1.0, 0.0])
    for _ in range(5):
        tau, turning = _combine_turn_statistics(tau, leaf_tau([1.0, 0.0]))
        assert not bool(turning)
    np.testing.assert_allclose(np.asarray(tau.rho), [6.0, 0.0])


def test_turn_statistic_opposite_momenta_turn():
    tau1 = leaf_tau([1.0, 0.0])
    tau2 = leaf_tau([-2.0, 0.0])
    _, turning = _combine_turn_statistics(tau1, tau2)
    assert bool(turning)
    # exactly-opposite momenta give rho = 0 and dot = 0, which is NOT < 0:
    # not turning under the strict inequality (NUTS.jl:130)
    _, turning_zero = _combine_turn_statistics(leaf_tau([1.0, 0.0]), leaf_tau([-1.0, 0.0]))
    assert not bool(turning_zero)


def test_turn_statistic_subtree_boundary_check():
    # The robustness fix (NUTS.jl:132-139): check 1 uses x.rho + y.p_minus.
    # Construct stats where the full-merge rho looks fine but the boundary
    # check catches the turn: y's first momentum opposes x's rho.
    x = GeneralizedTurnStatistic(
        p_minus=jnp.asarray([1.0, 0.0]),
        psharp_minus=jnp.asarray([1.0, 0.0]),
        p_plus=jnp.asarray([1.0, 0.0]),
        psharp_plus=jnp.asarray([1.0, 0.0]),
        rho=jnp.asarray([2.0, 0.0]),
    )
    y = GeneralizedTurnStatistic(
        p_minus=jnp.asarray([-3.0, 0.0]),
        psharp_minus=jnp.asarray([-3.0, 0.0]),
        p_plus=jnp.asarray([5.0, 0.0]),
        psharp_plus=jnp.asarray([5.0, 0.0]),
        rho=jnp.asarray([2.0, 0.0]),
    )
    # full merge rho = [4,0]: dot(x.psharp_minus, rho) > 0, dot(y.psharp_plus,
    # rho) > 0 -> check 3 alone would NOT turn...
    rho = x.rho + y.rho
    assert float(jnp.dot(x.psharp_minus, rho)) > 0
    assert float(jnp.dot(y.psharp_plus, rho)) > 0
    # ...but check 1 (x.rho + y.p_minus = [-1, 0] against x edge) catches it.
    _, turning = _combine_turn_statistics(x, y)
    assert bool(turning)


def test_acceptance_statistic_combination():
    # NUTS.jl:59-87
    a = AcceptanceStatistic(
        log_sum_alpha=jnp.log(jnp.float64(0.5)), steps=jnp.int32(1)
    )
    b = AcceptanceStatistic(
        log_sum_alpha=jnp.log(jnp.float64(0.25)), steps=jnp.int32(1)
    )
    from dynamichmc_tpu.nuts import make_trajectory_ops  # combine via logaddexp

    c = AcceptanceStatistic(
        log_sum_alpha=jnp.logaddexp(a.log_sum_alpha, b.log_sum_alpha),
        steps=a.steps + b.steps,
    )
    np.testing.assert_allclose(float(acceptance_rate(c)), 0.375, rtol=1e-12)
    # rate is capped at 1
    big = AcceptanceStatistic(log_sum_alpha=jnp.float64(5.0), steps=jnp.int32(1))
    assert float(acceptance_rate(big)) == 1.0


def test_always_divergent_bookkeeping():
    # test_NUTS.jl:57-85: every non-initial leaf divergent => depth 0,
    # 1 step, divergent termination, position unchanged.
    k = 2
    # a cliff: -inf everywhere except very near the start
    ld = from_logdensity_fn(
        k, lambda q: jnp.where(jnp.sum(q**2) < 1e-8, 0.0, -jnp.inf)
    )
    metric = identity_metric(k, dtype=jnp.float64)
    Q0 = evaluate(ld, jnp.zeros(k))
    Q1, stats = jax.jit(
        lambda key: sample_tree(key, NUTS(), ld, metric, Q0, 0.5)
    )(KEY)
    assert bool(stats.is_divergent)
    assert int(stats.depth) == 0
    assert int(stats.steps) == 1
    assert float(stats.acceptance_rate) == 0.0
    np.testing.assert_array_equal(np.asarray(Q1.q), np.zeros(k))


def test_single_transition_stationarity_vmapped():
    # test_NUTS.jl:87-111, TPU edition: start 8192 chains at exact draws from
    # a correlated MVN, apply ONE NUTS transition each (vmapped), and check
    # the marginal is unchanged. Also exercises per-chain isolation under vmap.
    k = 3
    rng = np.random.RandomState(0)
    a = rng.randn(k, k)
    cov = a @ a.T + k * np.eye(k)
    prec = jnp.asarray(np.linalg.inv(cov))
    ld = from_logdensity_fn(k, lambda q: -0.5 * q @ prec @ q)
    metric = identity_metric(k, dtype=jnp.float64)

    n = 8192
    chol = np.linalg.cholesky(cov)
    q0 = (chol @ rng.randn(k, n)).T  # exact draws
    Q0 = jax.vmap(lambda q: evaluate(ld, q))(jnp.asarray(q0))

    def one(key, Q):
        Qn, stats = sample_tree(key, NUTS(), ld, metric, Q, 0.3)
        return Qn.q, stats

    keys = jax.random.split(KEY, n)
    qs, stats = jax.jit(jax.vmap(one))(keys, Q0)
    qs = np.asarray(qs)
    # moments preserved
    np.testing.assert_allclose(qs.mean(0), np.zeros(k), atol=0.1)
    np.testing.assert_allclose(np.cov(qs.T), cov, rtol=0.15, atol=0.15)
    assert not np.asarray(stats.is_divergent).any()
    # chains took different-depth trees (real per-chain dynamics under vmap)
    depths = np.asarray(stats.depth)
    assert depths.min() >= 1 and len(np.unique(depths)) > 1


def test_vmap_batch1_equals_unbatched():
    # batch=1 vmapped transition is bitwise the unbatched transition
    k = 4
    ld = from_logdensity_fn(k, lambda q: -0.5 * jnp.sum(q**2))
    metric = identity_metric(k, dtype=jnp.float64)
    Q0 = evaluate(ld, jnp.linspace(-1, 1, k))
    f = lambda key, Q: sample_tree(key, NUTS(), ld, metric, Q, 0.4)
    Q1, s1 = jax.jit(f)(KEY, Q0)
    Q1b, s1b = jax.jit(jax.vmap(f, in_axes=(None, 0)))(
        KEY, jax.tree_util.tree_map(lambda x: x[None], Q0)
    )
    np.testing.assert_array_equal(np.asarray(Q1.q), np.asarray(Q1b.q)[0])
    assert int(s1.depth) == int(np.asarray(s1b.depth)[0])
    assert int(s1.steps) == int(np.asarray(s1b.steps)[0])
    np.testing.assert_allclose(
        float(s1.acceptance_rate), float(np.asarray(s1b.acceptance_rate)[0])
    )


def test_fixed_directions_injectable():
    # Deterministic tree construction with injected directions + momentum
    # (the reference's Directions unit-test hook, trees.jl:16-23).
    k = 2
    ld = from_logdensity_fn(k, lambda q: -0.5 * jnp.sum(q**2))
    metric = identity_metric(k, dtype=jnp.float64)
    Q0 = evaluate(ld, jnp.asarray([0.5, -0.5]))
    p0 = jnp.asarray([0.3, 0.7])
    out = []
    for _ in range(2):
        Q1, stats = jax.jit(
            lambda: sample_tree(
                KEY, NUTS(), ld, metric, Q0, 0.4, p=p0,
                directions=jnp.uint32(0b1010101),
            )
        )()
        out.append((np.asarray(Q1.q), int(stats.directions)))
    np.testing.assert_array_equal(out[0][0], out[1][0])
    assert out[0][1] == 0b1010101


# --- turn_statistic_configuration hook (NUTS.jl:178-195) -------------------------


class _GeneralizedReimpl:
    """Custom configuration reimplementing the generalized statistic: the
    hook must reproduce the default driver's transitions exactly."""

    def leaf(self, metric, z):
        from dynamichmc_tpu.hamiltonian import calculate_psharp

        psharp = calculate_psharp(metric, z)
        return GeneralizedTurnStatistic(
            p_minus=z.p, psharp_minus=psharp, p_plus=z.p,
            psharp_plus=psharp, rho=z.p,
        )

    def combine(self, metric, x, y):
        return _combine_turn_statistics(x, y)


class _NeverTurning:
    """Pathological configuration: no merge ever turns, so every transition
    terminates at max depth or divergence."""

    def leaf(self, metric, z):
        return GeneralizedTurnStatistic(
            p_minus=z.p, psharp_minus=z.p, p_plus=z.p, psharp_plus=z.p,
            rho=z.p,
        )

    def combine(self, metric, x, y):
        combined = GeneralizedTurnStatistic(
            p_minus=x.p_minus, psharp_minus=x.psharp_minus,
            p_plus=y.p_plus, psharp_plus=y.psharp_plus, rho=x.rho + y.rho,
        )
        return combined, jnp.asarray(False)


def test_turn_statistic_configuration_validation():
    import pytest

    NUTS(turn_statistic_configuration="generalized")
    NUTS(turn_statistic_configuration=_NeverTurning())
    with pytest.raises(ValueError):
        NUTS(turn_statistic_configuration="betancourt")


def test_custom_turn_statistic_matches_default():
    ld = from_logdensity_fn(3, lambda q: -0.5 * jnp.sum(q**2))
    metric = identity_metric(3, dtype=jnp.float64)
    Q = evaluate(ld, jnp.array([0.3, -0.8, 1.1], jnp.float64))
    default = NUTS()
    custom = NUTS(turn_statistic_configuration=_GeneralizedReimpl())
    f1 = jax.jit(lambda k, Q: sample_tree(k, default, ld, metric, Q, 0.5, fast=False))
    f2 = jax.jit(lambda k, Q: sample_tree(k, custom, ld, metric, Q, 0.5))
    for i in range(5):
        key = jax.random.fold_in(KEY, i)
        Q1, s1 = f1(key, Q)
        Q2, s2 = f2(key, Q)
        np.testing.assert_allclose(np.asarray(Q1.q), np.asarray(Q2.q))
        assert int(s1.depth) == int(s2.depth)
        assert int(s1.steps) == int(s2.steps)


def test_never_turning_statistic_reaches_max_depth():
    ld = from_logdensity_fn(2, lambda q: -0.5 * jnp.sum(q**2))
    metric = identity_metric(2, dtype=jnp.float64)
    Q = evaluate(ld, jnp.array([0.1, 0.2], jnp.float64))
    algo = NUTS(max_depth=4, turn_statistic_configuration=_NeverTurning())
    _, stats = sample_tree(KEY, algo, ld, metric, Q, 0.05)
    assert bool(stats.reached_max_depth)
    assert int(stats.steps) == 2**4 - 1


def test_batch_native_rejects_custom_turn_statistic():
    import pytest

    from dynamichmc_tpu.tree_batched import sample_tree_batched

    ld = from_logdensity_fn(2, lambda q: -0.5 * jnp.sum(q**2))
    metric = identity_metric(2, dtype=jnp.float64)
    Q = evaluate(ld, jnp.zeros(2, jnp.float64))  # raise precedes any use of Q
    algo = NUTS(turn_statistic_configuration=_NeverTurning())
    with pytest.raises(NotImplementedError):
        sample_tree_batched(KEY, algo, ld, metric, Q, 0.5)
