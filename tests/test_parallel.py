"""Batched/sharded chain tests: the tier the reference lacks (SURVEY.md §4).

Cross-chain batch semantics: vmapped chains adapt independently, sharded runs
produce the same statistics, pooled adaptation synchronizes the metric via
mesh collectives, and the dryrun entry point compiles + executes the full
multi-device program on the virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu import DynamicHMCError, default_warmup_stages
from dynamichmc_tpu.models import std_normal, mvnormal
from dynamichmc_tpu.parallel import chain_mesh, init_chain_states, run_chains
from dynamichmc_tpu.stats import ess_rhat

KEY = jax.random.PRNGKey(0)


def test_run_chains_vmap_basic():
    res = run_chains(KEY, std_normal(3), n_chains=4, n_samples=500, dtype=jnp.float64)
    assert res.positions.shape == (4, 500, 3)
    assert res.logdensities.shape == (4, 500)
    assert res.eps.shape == (4,)
    # chains adapt independently: stepsizes differ
    eps = np.asarray(res.eps)
    assert len(np.unique(eps)) == 4
    st = ess_rhat(np.asarray(res.positions))
    assert st["rhat"].max() < 1.02
    qs = np.asarray(res.positions).reshape(-1, 3)
    assert np.abs(qs.mean(0)).max() < 0.1
    assert np.abs(qs.std(0) - 1).max() < 0.1


def test_run_chains_sharded_matches_stats():
    mesh = chain_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices
    res = run_chains(
        jax.random.PRNGKey(1),
        std_normal(3),
        n_chains=8,
        n_samples=400,
        dtype=jnp.float64,
        mesh=mesh,
    )
    assert res.positions.shape == (8, 400, 3)
    st = ess_rhat(np.asarray(res.positions))
    assert st["rhat"].max() < 1.02
    qs = np.asarray(res.positions).reshape(-1, 3)
    assert np.abs(qs.mean(0)).max() < 0.1


def test_pooled_adaptation_synchronizes_metric():
    mesh = chain_mesh()
    res = run_chains(
        jax.random.PRNGKey(2),
        mvnormal(np.zeros(3), np.diag([0.5, 1.0, 2.0])),
        n_chains=8,
        n_samples=100,
        dtype=jnp.float64,
        mesh=mesh,
        warmup_stages=default_warmup_stages(pooled=True),
    )
    # pooled adaptation keeps ONE shared metric (unbatched)
    m_inv = np.asarray(res.metric.m_inv)
    assert m_inv.shape == (3,)
    # pooled metric approximates the target variances
    np.testing.assert_allclose(m_inv, [0.5, 1.0, 2.0], rtol=0.5)


def test_pooled_stepsize_on_vmap_fallback_is_shared():
    """A heterogeneous stage tuple (mixed metric kinds) is not fast-engine-
    expressible, so the vmapped scan fallback runs it. PooledStepsize must
    pool over the bound vmap axis there too — each lane otherwise sees only
    its own scalar acceptance and the 'shared' eps silently adapts
    per-chain (caught by review, round 3)."""
    from dynamichmc_tpu.stepsize import PooledStepsize
    from dynamichmc_tpu.warmup import TuningNUTS
    from dynamichmc_tpu.stepsize import InitialStepsizeSearch

    pooled_da = PooledStepsize()
    stages = (
        InitialStepsizeSearch(),
        TuningNUTS(N=40, metric_kind="diagonal", pooled=True,
                   stepsize_adaptation=pooled_da),
        TuningNUTS(N=40, metric_kind="dense", pooled=True,
                   stepsize_adaptation=pooled_da),
    )
    res = run_chains(
        jax.random.PRNGKey(11),
        mvnormal(np.zeros(3), np.diag([0.5, 1.0, 2.0])),
        n_chains=8,
        n_samples=50,
        dtype=jnp.float64,
        warmup_stages=stages,
    )
    eps = np.asarray(res.eps)
    assert eps.ndim == 0 or len(np.unique(eps)) == 1, eps
    assert np.isfinite(eps).all() and (eps > 0).all()


def test_pooled_stepsize_on_mesh_is_globally_shared():
    # under shard_map each device sees only its local lanes; PooledStepsize
    # must pmean the acceptance signal over the mesh axis so every device
    # adapts the SAME shared eps
    mesh = chain_mesh()
    res = run_chains(
        jax.random.PRNGKey(7),
        mvnormal(np.zeros(3), np.diag([0.5, 1.0, 2.0])),
        n_chains=16,
        n_samples=100,
        dtype=jnp.float64,
        mesh=mesh,
        warmup_stages=default_warmup_stages(pooled=True, pooled_stepsize=True),
    )
    eps = np.asarray(res.eps)
    assert eps.ndim == 0 or len(np.unique(eps)) == 1, eps
    assert np.isfinite(eps).all() and (eps > 0).all()
    qs = np.asarray(res.positions).reshape(-1, 3)
    np.testing.assert_allclose(
        qs.std(0), np.sqrt([0.5, 1.0, 2.0]), rtol=0.15
    )


def test_wavefront_warmup_on_mesh():
    """Mesh-sharded wavefront warmup: each device runs its own wavefront
    over its local lanes (per-device slot counters, no cross-device sync
    inside the loop). Per-chain adaptation; pooled metric also exercised."""
    mesh = chain_mesh()
    cov = np.diag([0.5, 1.0, 2.0])
    res = run_chains(
        jax.random.PRNGKey(8),
        mvnormal(np.zeros(3), cov),
        n_chains=16,
        n_samples=150,
        dtype=jnp.float64,
        mesh=mesh,
        warmup_driver="wavefront",
    )
    assert res.positions.shape == (16, 150, 3)
    eps = np.asarray(res.eps)
    assert eps.shape == (16,) and (eps > 0).all()
    assert len(np.unique(eps)) > 1  # per-chain adaptation
    qs = np.asarray(res.positions).reshape(-1, 3)
    np.testing.assert_allclose(qs.std(0), np.sqrt(np.diag(cov)), rtol=0.15)
    assert np.abs(qs.mean(0)).max() < 0.3

    # pooled METRIC (shared, Chan-combined across devices) still works with
    # the wavefront
    res2 = run_chains(
        jax.random.PRNGKey(9),
        mvnormal(np.zeros(3), cov),
        n_chains=16,
        n_samples=50,
        dtype=jnp.float64,
        mesh=mesh,
        warmup_driver="wavefront",
        warmup_stages=default_warmup_stages(pooled=True),
    )
    m_inv = np.asarray(res2.metric.m_inv)
    assert m_inv.shape == (3,)
    np.testing.assert_allclose(m_inv, np.diag(cov), rtol=0.5)


def test_wavefront_pooled_eps_on_mesh():
    """Pooled (shared) stepsize + wavefront warmup under a mesh: the driver
    runs epoch-lockstep — devices synchronize at aligned global-counter
    boundaries where one psum pools the acceptance signal, so the shared
    dual-averaging state stays identical across devices."""
    mesh = chain_mesh()
    cov = np.diag([0.5, 1.0, 2.0])
    res = run_chains(
        jax.random.PRNGKey(10),
        mvnormal(np.zeros(3), cov),
        n_chains=16,
        n_samples=150,
        dtype=jnp.float64,
        mesh=mesh,
        warmup_driver="wavefront",
        warmup_stages=default_warmup_stages(
            pooled=True, pooled_stepsize=True
        ),
    )
    eps = np.asarray(res.eps)
    # ONE shared eps for the whole fleet
    assert eps.ndim == 0 or len(np.unique(eps)) == 1, eps
    assert np.all(eps > 0)
    qs = np.asarray(res.positions).reshape(-1, 3)
    np.testing.assert_allclose(qs.std(0), np.sqrt(np.diag(cov)), rtol=0.15)
    assert np.abs(qs.mean(0)).max() < 0.3


def test_fused_default_init_matches_eager_construction():
    """The fused one-dispatch default init (chains._default_init_program)
    must produce bitwise the same states as the eager three-step
    construction it replaced (split -> random_position -> evaluate)."""
    from dynamichmc_tpu.hamiltonian import evaluate
    from dynamichmc_tpu.warmup import random_position

    ld = mvnormal(np.zeros(3), np.diag([0.5, 1.0, 2.0]))
    key = jax.random.PRNGKey(42)
    st = init_chain_states(key, ld, 8, dtype=jnp.float64)
    keys = jax.random.split(key, 8)
    q_ref = jax.vmap(lambda k: random_position(k, ld.dim, jnp.float64))(keys)
    Q_ref = jax.vmap(lambda qq: evaluate(ld, qq))(q_ref)
    np.testing.assert_array_equal(np.asarray(st.Q.q), np.asarray(Q_ref.q))
    # jit fusion may re-associate the logdensity reduction: ulp-level only
    np.testing.assert_allclose(
        np.asarray(st.Q.logdensity), np.asarray(Q_ref.logdensity), rtol=1e-12
    )
    # explicit-q path unchanged
    st2 = init_chain_states(key, ld, 8, q=q_ref, dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(st2.Q.q), np.asarray(Q_ref.q))


def test_unpooled_metrics_differ():
    res = run_chains(
        jax.random.PRNGKey(3), std_normal(3), n_chains=4, n_samples=50,
        dtype=jnp.float64,
    )
    m_inv = np.asarray(res.metric.m_inv)
    assert not np.allclose(m_inv[0], m_inv[1])


def test_invalid_initial_positions_reported():
    bad = mvnormal(np.zeros(2), np.eye(2))
    import dataclasses

    nasty = dataclasses.replace(
        bad,
        logdensity_fn=lambda q: jnp.where(q[0] > 0, jnp.nan, -0.5 * q @ q),
        logdensity_and_gradient_fn=None,
        sample_fn=None,
    )
    with pytest.raises(DynamicHMCError) as err:
        init_chain_states(jax.random.PRNGKey(4), nasty, 16, dtype=jnp.float64)
    assert "chains" in err.value.payload


def test_chains_divisibility_check():
    mesh = chain_mesh()
    with pytest.raises(ValueError):
        run_chains(KEY, std_normal(2), n_chains=9, n_samples=30, mesh=mesh)


@pytest.mark.slow  # the driver executes this separately every round
def test_dryrun_multichip():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    q, depth, acc = out
    assert q.shape == (64, 100)
    assert np.all(np.isfinite(np.asarray(q)))


def test_draw_sink_streams_to_memmap(tmp_path):
    import numpy as _np

    from dynamichmc_tpu.io import MemmapDrawStore

    store = MemmapDrawStore(
        str(tmp_path / "draws"), n_chains=4, n_samples=60, dim=3,
        dtype=_np.float64,
    )
    res = run_chains(
        jax.random.PRNGKey(11), std_normal(3), 4, 60, dtype=jnp.float64,
        draw_sink=store.sink,
    )
    store.flush()
    assert res.positions is None  # draws streamed, not accumulated
    assert store.written == 60
    qs = _np.asarray(store.positions)
    assert qs.shape == (4, 60, 3)
    assert _np.isfinite(qs).all()
    # tree statistics still returned on device
    assert res.tree_statistics.depth.shape == (4, 60)
    # reopen round-trip
    again = MemmapDrawStore.open(str(tmp_path / "draws"))
    _np.testing.assert_array_equal(_np.asarray(again.positions), qs)
