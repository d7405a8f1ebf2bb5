"""End-to-end MCMC driver tests.

Ports /root/reference/test/test_mcmc.jl: moment recovery within hard norms on
a 5-dim MVN for default / fixed-stepsize / explicit-eps warmups, acceptance
rate floors, adapted eps window, the 200-dim U-turn robustness regression
(zero max-depth terminations at depth 12, test_mcmc.jl:60-72), the stepwise
API, and reshaper shape checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu import (
    NUTS,
    DynamicHMCError,
    FixedStepsize,
    TuningNUTS,
    default_warmup_stages,
    fixed_stepsize_warmup_stages,
    from_logdensity_fn,
    mcmc_keep_warmup,
    mcmc_steps,
    mcmc_with_warmup,
    pool_posterior_matrices,
    stack_posterior_matrices,
)

KEY = jax.random.PRNGKey(0)


def std_mvn(k):
    return from_logdensity_fn(k, lambda q: -0.5 * jnp.sum(q**2))


def check_moments(res, n_skip=0, tol=0.04):
    qs = np.asarray(res.positions)[n_skip:]
    assert np.abs(qs.mean(0)).max() < tol, qs.mean(0)
    assert np.abs(qs.std(0) - 1).max() < tol, qs.std(0)


def test_default_warmup_5d():
    # test_mcmc.jl:15-25
    res = mcmc_with_warmup(KEY, std_mvn(5), 10_000, dtype=jnp.float64)
    check_moments(res)
    assert float(np.asarray(res.tree_statistics.acceptance_rate).mean()) >= 0.8
    assert 0.5 <= float(res.eps) <= 2.0
    # adapted diagonal metric is near identity
    np.testing.assert_allclose(np.asarray(res.metric.m_inv), np.ones(5), atol=0.25)


def test_fixed_stepsize_warmup():
    # test_mcmc.jl:29-37: explicit eps + covariance-only tuning
    res = mcmc_with_warmup(
        jax.random.PRNGKey(1),
        std_mvn(5),
        10_000,
        initialization={"eps": 0.7},
        warmup_stages=fixed_stepsize_warmup_stages(),
        dtype=jnp.float64,
    )
    check_moments(res)
    assert float(np.asarray(res.tree_statistics.acceptance_rate).mean()) >= 0.7
    assert float(res.eps) == pytest.approx(0.7)


def test_explicit_eps_still_adapted():
    # test_mcmc.jl:40-48: explicit initial eps, no search stage, still adapted
    res = mcmc_with_warmup(
        jax.random.PRNGKey(2),
        std_mvn(5),
        10_000,
        initialization={"eps": 1.0},
        warmup_stages=default_warmup_stages(stepsize_search=None),
        dtype=jnp.float64,
    )
    check_moments(res)
    assert float(np.asarray(res.tree_statistics.acceptance_rate).mean()) >= 0.8


def test_dense_metric_warmup():
    # correlated target with dense metric adaptation
    k = 4
    rng = np.random.RandomState(3)
    a = rng.randn(k, k)
    cov = a @ a.T + k * np.eye(k)
    prec = jnp.asarray(np.linalg.inv(cov))
    ld = from_logdensity_fn(k, lambda q: -0.5 * q @ prec @ q)
    res = mcmc_with_warmup(
        jax.random.PRNGKey(4),
        ld,
        8_000,
        warmup_stages=default_warmup_stages(metric_kind="dense"),
        dtype=jnp.float64,
    )
    qs = np.asarray(res.positions)
    np.testing.assert_allclose(np.cov(qs.T), cov, rtol=0.2, atol=0.2)
    # adapted dense metric approximates the covariance
    m_inv = np.asarray(res.metric.m_inv)
    assert m_inv.shape == (k, k)
    np.testing.assert_allclose(np.diag(m_inv), np.diag(cov), rtol=0.5)


def test_max_depth_regression_200d():
    # test_mcmc.jl:60-72 (issue #115 regression): 200-dim standard normal at
    # max_depth=12 must NEVER terminate by max depth. Reference: 20 runs x
    # 1000 draws; we run 4 independently-warmed chains x 1000 draws (CI time).
    k = 200
    ld = std_mvn(k)
    hits = 0
    for i in range(4):
        res = mcmc_with_warmup(
            jax.random.PRNGKey(100 + i),
            ld,
            1000,
            algorithm=NUTS(max_depth=12),
            dtype=jnp.float64,
        )
        hits += int(np.asarray(res.tree_statistics.reached_max_depth).sum())
    assert hits == 0


def test_keep_warmup_inspectable():
    out = mcmc_keep_warmup(
        jax.random.PRNGKey(5), std_mvn(3), 100, dtype=jnp.float64
    )
    history = out["warmup"]
    assert len(history) == 8  # search + 75 + 5 doubling + 50 (mcmc.jl:415-425)
    stage0, results0, state0 = history[0]
    assert "eps" in results0 and bool(results0["success"])
    # tuning stages expose positions, logdensities, tree stats, eps traces
    stage1, results1, state1 = history[1]
    assert results1["positions"].shape == (75, 3)
    assert results1["epss"].shape == (75,)
    # doubling schedule of the middle stages: 25, 50, 100, 200, 400
    for idx, n in zip(range(2, 7), [25, 50, 100, 200, 400]):
        assert history[idx][0].N == n
        assert history[idx][1]["positions"].shape == (n, 3)
    assert out["final_warmup_state"].eps is not None


def test_stepwise_api():
    # mcmc.jl:295-351
    ld = std_mvn(2)
    out = mcmc_keep_warmup(jax.random.PRNGKey(6), ld, 0, dtype=jnp.float64)
    state = out["final_warmup_state"]
    steps = mcmc_steps(ld, NUTS(), state.metric, state.eps)
    Q = state.Q
    qs = []
    for i in range(50):
        Q, stats = steps.next_step(jax.random.fold_in(KEY, i), Q)
        qs.append(np.asarray(Q.q))
    assert np.std(np.stack(qs)) > 0.1  # the chain moves


def test_stepwise_chunk_matches_next_step():
    # next_chunk(key, Q, n) == next_step folded over jax.random.split(key, n)
    # draw-for-draw (the amortized one-dispatch form of the stepwise API)
    ld = std_mvn(2)
    out = mcmc_keep_warmup(jax.random.PRNGKey(6), ld, 0, dtype=jnp.float64)
    state = out["final_warmup_state"]
    steps = mcmc_steps(ld, NUTS(), state.metric, state.eps)
    key = jax.random.PRNGKey(42)
    n = 7

    Q_fin, chunk = steps.next_chunk(key, state.Q, n)
    assert chunk.positions.shape == (n, 2)
    assert chunk.logdensities.shape == (n,)
    assert chunk.tree_statistics.depth.shape == (n,)

    Q = state.Q
    for i, k in enumerate(jax.random.split(key, n)):
        Q, stats = steps.next_step(k, Q)
        np.testing.assert_array_equal(np.asarray(Q.q), np.asarray(chunk.positions[i]))
        assert int(stats.depth) == int(chunk.tree_statistics.depth[i])
    np.testing.assert_array_equal(np.asarray(Q.q), np.asarray(Q_fin.q))

    # batched Q (C, K) routes through the batch-native driver; shapes and
    # chain isolation (distinct chains move independently)
    from dynamichmc_tpu.hamiltonian import EvaluatedPoint
    from dynamichmc_tpu.tree_batched import _evaluate_b

    q0 = jnp.stack([state.Q.q, state.Q.q + 0.5])
    vals, grads = _evaluate_b(ld, q0)
    Qb = EvaluatedPoint(q=q0, logdensity=vals, grad=grads)
    Qb_fin, bchunk = steps.next_chunk(key, Qb, n)
    assert bchunk.positions.shape == (n, 2, 2)
    assert Qb_fin.q.shape == (2, 2)
    assert not np.allclose(
        np.asarray(bchunk.positions[:, 0]), np.asarray(bchunk.positions[:, 1])
    )


def test_eps_specified_blocks_search():
    with pytest.raises(DynamicHMCError):
        mcmc_with_warmup(
            KEY, std_mvn(2), 10, initialization={"eps": 0.5}, dtype=jnp.float64
        )


def test_reshapers():
    # mcmc.jl:602-617 / test_mcmc.jl:74-80
    results = [
        mcmc_with_warmup(jax.random.PRNGKey(10 + i), std_mvn(3), 200, dtype=jnp.float64)
        for i in range(2)
    ]
    stacked = stack_posterior_matrices(results)
    assert stacked.shape == (200, 2, 3)
    pooled = pool_posterior_matrices(results)
    assert pooled.shape == (3, 400)
    # one unbatched result is a single chain, not a silent transpose
    assert stack_posterior_matrices(results[0]).shape == (200, 1, 3)
    assert pool_posterior_matrices(results[0]).shape == (3, 200)


def test_warmup_only_run():
    """n_samples=0 (inspect the adaptation only) must return empty,
    structurally-correct inference arrays on the fast path — not crash in
    the chunk assembly after the whole warmup already ran."""
    res = mcmc_with_warmup(jax.random.PRNGKey(3), std_mvn(3), 0,
                           dtype=jnp.float64)
    assert res.positions.shape == (0, 3)
    assert res.logdensities.shape == (0,)
    assert np.asarray(res.tree_statistics.depth).shape == (0,)
    assert float(res.eps) > 0  # adaptation still ran


def test_keep_warmup_matches_fast_engine():
    """mcmc_keep_warmup's collecting fast path and mcmc_with_warmup's
    non-collecting fast engine share key-derivation conventions, so the same
    seed must produce bitwise-identical adapted state and draws."""
    ld = std_mvn(3)
    key = jax.random.PRNGKey(21)
    out = mcmc_keep_warmup(key, ld, 16, dtype=jnp.float64)
    res = mcmc_with_warmup(key, ld, 16, dtype=jnp.float64)
    final = out["final_warmup_state"]
    np.testing.assert_array_equal(np.asarray(final.eps), np.asarray(res.eps))
    np.testing.assert_array_equal(
        np.asarray(final.metric.m_inv), np.asarray(res.metric.m_inv)
    )
    np.testing.assert_array_equal(
        np.asarray(out["inference"].positions), np.asarray(res.positions)
    )
    # per-stage history: epss and tree statistics recorded at every step
    tuning = [h for h in out["warmup"] if getattr(h[0], "N", None)]
    assert [h[0].N for h in tuning] == [75, 25, 50, 100, 200, 400, 50]
    for stage, results, _state in tuning:
        assert results["epss"].shape == (stage.N,)
        assert results["tree_statistics"].depth.shape == (stage.N,)
