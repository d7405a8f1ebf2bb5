"""Whole-transition Pallas tree kernel (ops/pallas_tree.py) gates.

The kernel is pinned transition-for-transition against the XLA batch-native
driver (tree_batched.sample_tree_batched): same key => same RNG stream by
construction (the wrapper reproduces the driver's exact fold_in layout), so
positions, depths, steps, termination encodings, and acceptance statistics
must agree to float32 tolerance (bitwise in practice under interpret mode —
the kernel executes the same op sequence).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu.hamiltonian import EvaluatedPoint
from dynamichmc_tpu.metric import dense_metric, diagonal_metric
from dynamichmc_tpu.models import correlated_gaussian, mvnormal
from dynamichmc_tpu.nuts import NUTS
from dynamichmc_tpu.tree_batched import _evaluate_b, sample_tree_batched

KEY = jax.random.PRNGKey(0)


def _setup(K, C, dtype=jnp.float32, seed=0, tree_kernel=True):
    ld_plain = correlated_gaussian(K, dtype=dtype)
    ld_kern = correlated_gaussian(K, dtype=dtype, tree_kernel=tree_kernel)
    q0 = jnp.asarray(
        np.random.default_rng(seed).normal(size=(C, K)), dtype
    )
    vals, grads = _evaluate_b(ld_plain, q0)
    Q = EvaluatedPoint(q=q0, logdensity=vals, grad=grads)
    return ld_plain, ld_kern, Q


def _assert_transition_equal(a, b, atol=1e-5):
    Qa, sa = a
    Qb, sb = b
    np.testing.assert_allclose(np.asarray(Qa.q), np.asarray(Qb.q), atol=atol)
    np.testing.assert_allclose(
        np.asarray(Qa.logdensity), np.asarray(Qb.logdensity), atol=atol
    )
    np.testing.assert_array_equal(np.asarray(sa.depth), np.asarray(sb.depth))
    np.testing.assert_array_equal(np.asarray(sa.steps), np.asarray(sb.steps))
    np.testing.assert_array_equal(
        np.asarray(sa.term_left), np.asarray(sb.term_left)
    )
    np.testing.assert_array_equal(
        np.asarray(sa.term_right), np.asarray(sb.term_right)
    )
    np.testing.assert_allclose(
        np.asarray(sa.acceptance_rate), np.asarray(sb.acceptance_rate),
        atol=atol,
    )
    np.testing.assert_array_equal(
        np.asarray(sa.is_divergent), np.asarray(sb.is_divergent)
    )


def test_kernel_matches_driver_dense():
    ld_plain, ld_kern, Q = _setup(K=3, C=10)
    metric = dense_metric(
        jnp.asarray(np.asarray(ld_plain.cov_fn(), np.float32))
    )
    algo = NUTS(max_depth=4)
    for i in range(4):  # chain several transitions through both paths
        key = jax.random.fold_in(KEY, i)
        a = sample_tree_batched(key, algo, ld_plain, metric, Q, 0.3)
        b = sample_tree_batched(key, algo, ld_kern, metric, Q, 0.3)
        _assert_transition_equal(a, b)
        Q = a[0]


def test_kernel_matches_driver_diagonal():
    ld_plain, ld_kern, Q = _setup(K=5, C=7, seed=3)
    metric = diagonal_metric(jnp.asarray(np.linspace(0.5, 2.0, 5), jnp.float32))
    algo = NUTS(max_depth=4)
    a = sample_tree_batched(KEY, algo, ld_plain, metric, Q, 0.25)
    b = sample_tree_batched(KEY, algo, ld_kern, metric, Q, 0.25)
    _assert_transition_equal(a, b)


def test_kernel_matches_driver_per_chain_eps():
    ld_plain, ld_kern, Q = _setup(K=4, C=9, seed=5)
    metric = diagonal_metric(jnp.ones((4,), jnp.float32))
    eps = jnp.asarray(
        np.random.default_rng(2).uniform(0.1, 0.5, size=9), jnp.float32
    )
    algo = NUTS(max_depth=5)
    a = sample_tree_batched(KEY, algo, ld_plain, metric, Q, eps)
    b = sample_tree_batched(KEY, algo, ld_kern, metric, Q, eps)
    _assert_transition_equal(a, b)


def test_kernel_honors_depth_limit():
    ld_plain, ld_kern, Q = _setup(K=3, C=16, seed=1)
    metric = dense_metric(
        jnp.asarray(np.asarray(ld_plain.cov_fn(), np.float32))
    )
    algo = NUTS(max_depth=6)
    for dl in (2, 3, 0):  # 0 = unclamped sentinel (engine convention)
        a = sample_tree_batched(
            KEY, algo, ld_plain, metric, Q, 0.2, depth_limit=dl
        )
        b = sample_tree_batched(
            KEY, algo, ld_kern, metric, Q, 0.2, depth_limit=dl
        )
        _assert_transition_equal(a, b)
        if dl:
            assert int(np.asarray(a[1].depth).max()) <= dl


def test_kernel_divergences_match():
    # a huge stepsize makes the integrator diverge; the kernel must poison
    # and terminate identically (-inf semantics, InvalidTree encodings)
    ld_plain, ld_kern, Q = _setup(K=3, C=12, seed=4)
    metric = dense_metric(
        jnp.asarray(np.asarray(ld_plain.cov_fn(), np.float32))
    )
    algo = NUTS(max_depth=4)
    a = sample_tree_batched(KEY, algo, ld_plain, metric, Q, 40.0)
    b = sample_tree_batched(KEY, algo, ld_kern, metric, Q, 40.0)
    _assert_transition_equal(a, b)
    assert bool(np.asarray(a[1].is_divergent).any())


def test_kernel_declines_f64_and_per_chain_metric():
    # outside the regime the hook returns None and the XLA driver runs
    ld_plain, ld_kern, Q64 = _setup(K=3, C=4, dtype=jnp.float64)
    metric = dense_metric(jnp.asarray(np.asarray(ld_plain.cov_fn())))
    a = sample_tree_batched(KEY, NUTS(max_depth=3), ld_kern, metric, Q64, 0.3)
    b = sample_tree_batched(
        KEY, NUTS(max_depth=3), ld_plain, metric, Q64, 0.3
    )
    np.testing.assert_array_equal(np.asarray(a[0].q), np.asarray(b[0].q))

    # per-chain dense metric (C, K, K): declined
    _, ld_kern32, Q = _setup(K=3, C=4)
    cov = np.asarray(ld_plain.cov_fn(), np.float32)
    pc = jax.vmap(dense_metric)(
        jnp.asarray(np.broadcast_to(cov, (4, 3, 3)).copy())
    )
    a = sample_tree_batched(KEY, NUTS(max_depth=3), ld_kern32, pc, Q, 0.3)
    b = sample_tree_batched(KEY, NUTS(max_depth=3), ld_plain, pc, Q, 0.3)
    np.testing.assert_array_equal(np.asarray(a[0].q), np.asarray(b[0].q))


def test_funnel_kernel_matches_driver():
    """Funnel leaf is analytic-gradient in the kernel vs AD in the model, so
    agreement is float32-tolerance (not bitwise); branch decisions (depths,
    steps, terminations) must still match at these scales."""
    from dynamichmc_tpu.models import funnel

    K, C = 5, 12
    ld_p = funnel(K, dtype=jnp.float32)
    ld_k = funnel(K, dtype=jnp.float32, tree_kernel=True)
    metric = diagonal_metric(jnp.ones((K,), jnp.float32))
    algo = NUTS(max_depth=4)
    q0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(C, K)) * 0.5, jnp.float32
    )
    vals, grads = _evaluate_b(ld_p, q0)
    Q = EvaluatedPoint(q=q0, logdensity=vals, grad=grads)
    for eps in (0.05, 0.3):
        a = sample_tree_batched(
            jax.random.PRNGKey(11), algo, ld_p, metric, Q, eps
        )
        b = sample_tree_batched(
            jax.random.PRNGKey(11), algo, ld_k, metric, Q, eps
        )
        np.testing.assert_allclose(
            np.asarray(a[0].q), np.asarray(b[0].q), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(a[1].depth), np.asarray(b[1].depth)
        )
        np.testing.assert_array_equal(
            np.asarray(a[1].steps), np.asarray(b[1].steps)
        )
        np.testing.assert_array_equal(
            np.asarray(a[1].term_left), np.asarray(b[1].term_left)
        )


def test_logreg_kernel_matches_driver():
    """Logreg leaf is analytic-gradient in the kernel vs AD in the model;
    branch decisions must match, values to float32 tolerance. Exercises the
    obs-axis padding mask (n_obs not a multiple of 8 would shift the log
    density by -log 2 per pad row if unmasked)."""
    from dynamichmc_tpu.models import logistic_regression

    K, C, NOBS = 7, 10, 53  # NOBS deliberately not a multiple of 8
    ld_p = logistic_regression(n_obs=NOBS, dim=K, dtype=jnp.float32)
    ld_k = logistic_regression(
        n_obs=NOBS, dim=K, dtype=jnp.float32, tree_kernel=True
    )
    metric = diagonal_metric(jnp.ones((K,), jnp.float32))
    algo = NUTS(max_depth=4)
    q0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(C, K)) * 0.3, jnp.float32
    )
    vals, grads = _evaluate_b(ld_p, q0)
    Q = EvaluatedPoint(q=q0, logdensity=vals, grad=grads)
    for eps in (0.05, 0.2):
        a = sample_tree_batched(
            jax.random.PRNGKey(3), algo, ld_p, metric, Q, eps
        )
        b = sample_tree_batched(
            jax.random.PRNGKey(3), algo, ld_k, metric, Q, eps
        )
        np.testing.assert_allclose(
            np.asarray(a[0].q), np.asarray(b[0].q), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(a[0].logdensity), np.asarray(b[0].logdensity),
            atol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(a[1].depth), np.asarray(b[1].depth)
        )
        np.testing.assert_array_equal(
            np.asarray(a[1].steps), np.asarray(b[1].steps)
        )


@pytest.mark.slow
def test_funnel_kernel_end_to_end():
    """Kernel-driven funnel run recovers the v-marginal (v ~ N(0, 3^2)) —
    the statistical gate for the analytic-gradient funnel leaf."""
    from dynamichmc_tpu.models import funnel
    from dynamichmc_tpu.parallel import run_chains
    from dynamichmc_tpu.stepsize import InitialStepsizeSearch
    from dynamichmc_tpu.warmup import TuningNUTS

    K, C, N = 5, 64, 256
    stages = (
        InitialStepsizeSearch(),
        TuningNUTS(N=50, metric_kind="diagonal", pooled=True),
        TuningNUTS(N=50, metric_kind="diagonal", pooled=True),
    )
    out = {}
    for name, tk in (("kernel", True), ("plain", False)):
        res = run_chains(
            jax.random.PRNGKey(5), funnel(K, dtype=jnp.float32,
                                          tree_kernel=tk),
            n_chains=C, n_samples=N,
            dtype=jnp.float32, tune="reference", warmup_stages=stages,
            algorithm=NUTS(max_depth=7), warmup_depth_clamp=2,
            warmup_depth_clamp_tail=5,
        )
        v = np.asarray(res.positions, np.float64)[:, :, 0].ravel()
        div = int(np.asarray(res.tree_statistics.is_divergent).sum())
        out[name] = (v, div)
    # v ~ N(0, 9); this SHORT warmup under-adapts eps on the funnel (the
    # plain model diverges ~4% here too), so the gate is comparative: the
    # kernel must behave like the XLA driver at the same config, and both
    # must recover the v-marginal's scale
    for v, _div in out.values():
        assert abs(v.mean()) < 0.8
        assert 2.0 < v.std() < 4.0
    k_div, p_div = out["kernel"][1], out["plain"][1]
    assert k_div < max(3 * p_div, 0.01 * C * N)


@pytest.mark.slow
def test_kernel_end_to_end_run_chains():
    """Full engine path (warmup clamp + adaptation + sampling) on the kernel
    hook. Per-transition equivalence above is the exactness gate; chained
    transitions amplify last-ulp matmul-reduction differences (the kernel's
    padded (128, B) dots reduce in a different order than the model's
    per-chain matvecs), so end-to-end agreement is STATISTICAL: moment
    recovery on the kernel-driven run, and identical stream-level behavior
    (zero divergences, same depth range) as the plain run."""
    from dynamichmc_tpu.parallel import run_chains
    from dynamichmc_tpu.stepsize import InitialStepsizeSearch
    from dynamichmc_tpu.warmup import TuningNUTS

    K, C, N = 3, 64, 192
    cov = np.array([[1.0, 0.5, 0.2], [0.5, 1.5, 0.3], [0.2, 0.3, 0.8]])
    ld_kern = mvnormal(np.zeros(K), cov, tree_kernel=True)
    stages = (
        InitialStepsizeSearch(),
        TuningNUTS(N=50, metric_kind="dense", pooled=True),
        TuningNUTS(N=50, metric_kind="dense", pooled=True),
    )
    res = run_chains(
        jax.random.PRNGKey(3), ld_kern, n_chains=C, n_samples=N,
        dtype=jnp.float32, tune="reference", warmup_stages=stages,
        algorithm=NUTS(max_depth=4), warmup_depth_clamp=2,
        warmup_depth_clamp_tail=5,
    )
    qs = np.asarray(res.positions, np.float64).reshape(-1, K)
    assert int(np.asarray(res.tree_statistics.is_divergent).sum()) == 0
    np.testing.assert_allclose(qs.mean(0), np.zeros(K), atol=0.12)
    np.testing.assert_allclose(
        np.cov(qs.T), cov, atol=0.25 * np.abs(cov).max()
    )
