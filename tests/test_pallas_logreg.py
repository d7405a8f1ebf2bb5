"""Fused Pallas logreg leaf vs the pure-JAX/AD oracle (interpret mode, CPU).

The plain logistic_regression model (AD gradient through the likelihood
matmul — the reference's L0 user contract) is the reference implementation;
the fused kernel must match it to f32 rounding, including the -inf
poisoning, across all three in-kernel metric layouts (shared diagonal,
per-chain diagonal, shared dense) and the non-128-aligned observation-count
masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu.metric import dense_metric, diagonal_metric
from dynamichmc_tpu.models import logistic_regression
from dynamichmc_tpu.tree_batched import _Edge, _joint_b, _leapfrog_b

N_OBS, K = 200, 11
C = 24


@pytest.fixture(scope="module")
def models():
    plain = logistic_regression(n_obs=N_OBS, dim=K, dtype=jnp.float32)
    fused = logistic_regression(n_obs=N_OBS, dim=K, dtype=jnp.float32,
                                fused=True)
    return plain, fused


def _operands(seed=0, c=C, k=K, scale=0.5):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(scale * rng.randn(c, k), jnp.float32)
    p = jnp.asarray(rng.randn(c, k), jnp.float32)
    eps = jnp.asarray(rng.uniform(-0.2, 0.2, c), jnp.float32)
    return q, p, eps


def _oracle_leaf(plain, metric, q, p, eps):
    _, g = jax.vmap(plain.logdensity_and_gradient)(q)
    z = _leapfrog_b(plain, metric, _Edge(q=q, p=p, grad=g,
                                         ld=jnp.zeros(q.shape[0], q.dtype)),
                    eps)
    pi = _joint_b(metric, z.ld, z.p)
    return g, (z.q, z.p, z.grad, z.ld, pi)


def _check(a, b, rtol=3e-5, atol=3e-5):
    for xa, xb in zip(a, b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=rtol, atol=atol)


def test_shared_diagonal_matches(models):
    plain, fused = models
    metric = diagonal_metric(jnp.linspace(0.5, 2.0, K, dtype=jnp.float32))
    q, p, eps = _operands(1)
    g, ref = _oracle_leaf(plain, metric, q, p, eps)
    out = fused.fused_leaf_batched_fn(metric, q, p, g, eps)
    _check(out, ref)


def test_per_chain_diagonal_matches(models):
    plain, fused = models
    rng = np.random.RandomState(2)
    metric = diagonal_metric(
        jnp.asarray(rng.uniform(0.5, 2.0, (C, K)), jnp.float32)
    )
    q, p, eps = _operands(3)
    g, ref = _oracle_leaf(plain, metric, q, p, eps)
    out = fused.fused_leaf_batched_fn(metric, q, p, g, eps)
    _check(out, ref)


def test_shared_dense_matches(models):
    plain, fused = models
    rng = np.random.RandomState(4)
    a = rng.randn(K, K)
    metric = dense_metric(jnp.asarray(a @ a.T + K * np.eye(K), jnp.float32))
    q, p, eps = _operands(5)
    g, ref = _oracle_leaf(plain, metric, q, p, eps)
    out = fused.fused_leaf_batched_fn(metric, q, p, g, eps)
    _check(out, ref, rtol=1e-4, atol=1e-4)


def test_unaligned_n_obs_masking():
    """n_obs = 37 pads to 128 observation lanes: padded rows must contribute
    nothing to the likelihood sum or the gradient matmul."""
    plain = logistic_regression(n_obs=37, dim=5, dtype=jnp.float32)
    fused = logistic_regression(n_obs=37, dim=5, dtype=jnp.float32,
                                fused=True)
    metric = diagonal_metric(jnp.ones(5, jnp.float32))
    q, p, eps = _operands(6, c=9, k=5)
    g, ref = _oracle_leaf(plain, metric, q, p, eps)
    out = fused.fused_leaf_batched_fn(metric, q, p, g, eps)
    _check(out, ref)


def test_f64_fallback_matches_ad_path(models):
    """Non-f32 operands route to the pure-JAX fallback, which must integrate
    the identical target (f64-tight agreement with the AD model)."""
    plain64 = logistic_regression(n_obs=N_OBS, dim=K, dtype=jnp.float64)
    fused = logistic_regression(n_obs=N_OBS, dim=K, dtype=jnp.float32,
                                fused=True)
    rng = np.random.RandomState(7)
    q = jnp.asarray(0.5 * rng.randn(C, K), jnp.float64)
    p = jnp.asarray(rng.randn(C, K), jnp.float64)
    eps = jnp.asarray(rng.uniform(-0.2, 0.2, C), jnp.float64)
    metric = diagonal_metric(jnp.linspace(0.5, 2.0, K, dtype=jnp.float64))
    g, ref = _oracle_leaf(plain64, metric, q, p, eps)
    out = fused.fused_leaf_batched_fn(metric, q, p, g, eps)
    _check(out, ref, rtol=1e-12, atol=1e-12)


def test_poisoning_in_fused_path(models):
    _plain, fused = models
    metric = diagonal_metric(jnp.ones(K, jnp.float32))
    q = jnp.zeros((4, K), jnp.float32)
    p = jnp.full((4, K), 1e25, jnp.float32)  # overflow the position update
    g = jnp.zeros((4, K), jnp.float32)
    eps = jnp.full((4,), 1e10, jnp.float32)
    _qn, _pn, _gn, ld, pi = fused.fused_leaf_batched_fn(metric, q, p, g, eps)
    assert np.all(np.asarray(ld) == -np.inf)
    assert np.all(np.asarray(pi) == -np.inf)


def test_fused_transition_statistics_match(models):
    """Full batch-native NUTS transitions through the fused leaf recover the
    same chain law as the AD path (same RNG stream, same arithmetic up to
    f32 fusion differences)."""
    from dynamichmc_tpu.nuts import NUTS
    from dynamichmc_tpu.tree_batched import sample_tree_batched
    from dynamichmc_tpu.hamiltonian import evaluate

    plain, fused = models
    metric = diagonal_metric(jnp.full((K,), 0.5, jnp.float32))
    c = 256
    rng = np.random.RandomState(8)
    q0 = jnp.asarray(0.3 * rng.randn(c, K), jnp.float32)
    Q0 = jax.vmap(lambda q: evaluate(plain, q))(q0)

    def run(model):
        def step(Q, i):
            Qn, stats = sample_tree_batched(
                jax.random.fold_in(jax.random.PRNGKey(9), i),
                NUTS(max_depth=6), model, metric, Q, jnp.float32(0.15),
            )
            return Qn, stats.acceptance_rate

        Q, acc = jax.lax.scan(step, Q0, jnp.arange(40))
        return np.asarray(Q.q), np.asarray(acc)

    qa, acca = run(plain)
    qb, accb = run(fused)
    np.testing.assert_allclose(qa.mean(0), qb.mean(0), atol=0.15)
    np.testing.assert_allclose(qa.std(0), qb.std(0), rtol=0.2, atol=0.05)
    assert abs(acca.mean() - accb.mean()) < 0.05


def test_auto_dispatch_heuristic():
    """fused='auto' attaches the kernel only in its measured winning regime:
    lane-filling dims with a VMEM-resident design matrix."""
    from dynamichmc_tpu.ops.pallas_logreg import fused_leaf_pays

    assert not fused_leaf_pays(1000, 25)     # 5.1x lane padding: loses
    assert fused_leaf_pays(1000, 128)        # lane-filling: wins
    assert fused_leaf_pays(1000, 100)        # 1.28x padding: admitted
    assert not fused_leaf_pays(16384, 128)   # X + X^T exceed VMEM budget

    m_small = logistic_regression(n_obs=1000, dim=25, dtype=jnp.float32,
                                  fused="auto")
    assert m_small.fused_leaf_batched_fn is None
    m_big = logistic_regression(n_obs=1000, dim=128, dtype=jnp.float32,
                                fused="auto")
    assert m_big.fused_leaf_batched_fn is not None


def test_auto_hook_off_tpu_takes_fallback(monkeypatch):
    """An auto-attached hook must route to the pure-JAX path off-TPU (the
    kernel would otherwise run in slow interpret mode), and still match
    the AD oracle."""
    import dynamichmc_tpu.ops.pallas_logreg as mod

    k = 128
    plain = logistic_regression(n_obs=300, dim=k, dtype=jnp.float32)
    auto = logistic_regression(n_obs=300, dim=k, dtype=jnp.float32,
                               fused="auto")
    assert auto.fused_leaf_batched_fn is not None

    def _boom(*a, **kw):
        raise AssertionError("auto hook must not launch the kernel off-TPU")

    monkeypatch.setattr(mod.pl, "pallas_call", _boom)
    metric = diagonal_metric(jnp.ones(k, jnp.float32))
    q, p, eps = _operands(11, c=8, k=k, scale=0.1)
    g, ref = _oracle_leaf(plain, metric, q, p, eps)
    out = auto.fused_leaf_batched_fn(metric, q, p, g, eps)
    _check(out, ref, rtol=2e-4, atol=2e-4)


def test_vmem_budget_falls_back(monkeypatch):
    """A design matrix whose VMEM residency (X + X^T + blocks) exceeds the
    kernel budget must route to the pure-JAX fallback instead of failing at
    Mosaic compile with an opaque error (round-4 advisor finding). The
    pallas_call symbol is poisoned to prove the kernel path is never taken,
    and the fallback must still match the AD oracle."""
    import dynamichmc_tpu.ops.pallas_logreg as mod

    n_obs, k = 16384, 64  # pads to (16384, 128): X + X^T alone = 16.8 MB
    plain = logistic_regression(n_obs=n_obs, dim=k, dtype=jnp.float32)
    fused = logistic_regression(n_obs=n_obs, dim=k, dtype=jnp.float32,
                                fused=True)

    def _boom(*a, **kw):
        raise AssertionError("pallas_call must not run over the VMEM budget")

    monkeypatch.setattr(mod.pl, "pallas_call", _boom)
    metric = diagonal_metric(jnp.ones(k, jnp.float32))
    q, p, eps = _operands(10, c=8, k=k, scale=0.05)
    g, ref = _oracle_leaf(plain, metric, q, p, eps)
    out = fused.fused_leaf_batched_fn(metric, q, p, g, eps)
    _check(out, ref, rtol=2e-4, atol=2e-4)


def test_per_chain_dense_falls_back(models):
    """A per-chain (C, K, K) dense metric — the default per-chain dense
    adaptation — must route to the pure-JAX fallback instead of crashing at
    trace time (round-4 review finding), and match the oracle exactly."""
    plain, fused = models
    rng = np.random.RandomState(8)
    ms = []
    for _ in range(C):
        a = rng.randn(K, K)
        ms.append(a @ a.T + K * np.eye(K))
    metric = jax.vmap(dense_metric)(jnp.asarray(np.stack(ms), jnp.float32))
    q, p, eps = _operands(9)
    g, ref = _oracle_leaf(plain, metric, q, p, eps)
    out = fused.fused_leaf_batched_fn(metric, q, p, g, eps)
    _check(out, ref, rtol=1e-4, atol=1e-4)
