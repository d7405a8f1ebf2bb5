"""Diagnostics tests.

Ports /root/reference/test/test_diagnostics.jl: summary counts vs direct
recomputation on synthetic tree statistics, EBFMI sanity, and
leapfrog_trajectory vs a manual trajectory; plus tests for the TPU additions
(Welford streaming moments, checkpoint round-trip, ESS/R-hat sanity).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dynamichmc_tpu.diagnostics import (
    EBFMI,
    count_depths,
    count_terminations,
    explore_log_acceptance_ratios,
    leapfrog_trajectory,
    summarize_tree_statistics,
)
from dynamichmc_tpu.hamiltonian import PhasePoint, evaluate, joint_logdensity, leapfrog
from dynamichmc_tpu.metric import identity_metric
from dynamichmc_tpu.models import std_normal
from dynamichmc_tpu.nuts import TreeStatistics

KEY = jax.random.PRNGKey(0)


def synthetic_stats(n=100, seed=0):
    rng = np.random.RandomState(seed)
    # terminations: ~20% divergence (left==right), ~10% max depth (1,0),
    # rest turning (left<right)
    left = np.zeros(n, np.int32)
    right = np.zeros(n, np.int32)
    kinds = rng.choice(["div", "maxd", "turn"], size=n, p=[0.2, 0.1, 0.7])
    for i, k in enumerate(kinds):
        if k == "div":
            left[i] = right[i] = rng.randint(-8, 8)
        elif k == "maxd":
            left[i], right[i] = 1, 0
        else:
            left[i] = rng.randint(-8, 0)
            right[i] = left[i] + rng.randint(1, 8)
    return (
        TreeStatistics(
            logdensity=jnp.asarray(rng.randn(n)),
            depth=jnp.asarray(rng.randint(0, 6, n), jnp.int32),
            term_left=jnp.asarray(left),
            term_right=jnp.asarray(right),
            acceptance_rate=jnp.asarray(rng.uniform(size=n)),
            steps=jnp.asarray(rng.randint(1, 100, n), jnp.int32),
            directions=jnp.asarray(rng.randint(0, 2**31, n), jnp.uint32),
        ),
        kinds,
    )


def test_count_terminations_matches_direct():
    stats, kinds = synthetic_stats()
    counts = count_terminations(stats)
    assert counts["divergence"] == int((kinds == "div").sum())
    assert counts["max_depth"] == int((kinds == "maxd").sum())
    assert counts["turning"] == int((kinds == "turn").sum())


def test_count_depths_and_summary():
    stats, _ = synthetic_stats()
    depths = np.asarray(stats.depth)
    c = count_depths(stats)
    for d, n in enumerate(c):
        assert n == int((depths == d).sum())
    summary = summarize_tree_statistics(stats)
    assert summary.N == 100
    assert abs(summary.a_mean - float(np.asarray(stats.acceptance_rate).mean())) < 1e-12
    text = str(summary)
    assert "acceptance rate" in text and "termination" in text and "depth" in text


def test_ebfmi_sanity():
    # High EBFMI for iid energies; low when energies are a slow random walk
    rng = np.random.RandomState(1)
    iid = synthetic_stats()[0]
    assert float(EBFMI(iid)) > 1.0
    walk_pi = np.cumsum(rng.randn(500) * 0.05)
    walk = TreeStatistics(
        logdensity=jnp.asarray(walk_pi),
        depth=jnp.zeros(500, jnp.int32),
        term_left=jnp.ones(500, jnp.int32),
        term_right=jnp.zeros(500, jnp.int32),
        acceptance_rate=jnp.ones(500),
        steps=jnp.ones(500, jnp.int32),
        directions=jnp.zeros(500, jnp.uint32),
    )
    assert float(EBFMI(walk)) < 0.3


def test_leapfrog_trajectory_matches_manual():
    # test_diagnostics.jl:51-76
    model = std_normal(3)
    metric = identity_metric(3, dtype=jnp.float64)
    q = jnp.asarray([0.1, -0.4, 0.7])
    p = jnp.asarray([0.3, 0.2, -0.5])
    eps = 0.25
    traj = leapfrog_trajectory(model, q, eps, range(-4, 5), metric=metric, p=p)
    assert [t["position"] for t in traj] == list(range(-4, 5))
    # manual forward trajectory
    z = PhasePoint(Q=evaluate(model, q), p=p)
    pi0 = float(joint_logdensity(metric, z))
    for i in range(1, 5):
        z = leapfrog(model, metric, z, eps)
        entry = traj[4 + i]
        np.testing.assert_allclose(
            np.asarray(entry["z"].Q.q), np.asarray(z.Q.q), rtol=1e-10
        )
        np.testing.assert_allclose(
            entry["delta"], float(joint_logdensity(metric, z)) - pi0, rtol=1e-8
        )


def test_leapfrog_trajectory_stops_at_nonfinite():
    from dynamichmc_tpu.logdensity import from_logdensity_fn

    ld = from_logdensity_fn(
        1, lambda q: jnp.where(jnp.abs(q[0]) > 1.0, -jnp.inf, -0.5 * q[0] ** 2)
    )
    traj = leapfrog_trajectory(
        ld, jnp.zeros(1), 0.5, range(-10, 11), p=jnp.asarray([1.0])
    )
    positions = [t["position"] for t in traj]
    assert 0 in positions
    assert len(positions) < 21  # truncated at the cliff


def test_explore_log_acceptance_ratios_shape_and_monotone():
    model = std_normal(2)
    grid = explore_log_acceptance_ratios(model, np.zeros(2), [-5, -2, 0, 2])
    assert grid.shape == (4, 20)
    # tiny stepsize: acceptance ratio near 0 (perfect integration)
    assert np.abs(grid[0]).max() < 1e-2
    # huge stepsize: much worse
    assert np.nanmin(grid[-1]) < -1.0


def test_welford_matches_numpy():
    from dynamichmc_tpu.utils.welford import (
        welford_covariance,
        welford_init,
        welford_update,
        welford_variance,
    )

    rng = np.random.RandomState(3)
    xs = rng.randn(137, 4)
    wf = welford_init(4, dense=False, dtype=jnp.float64)
    wfd = welford_init(4, dense=True, dtype=jnp.float64)
    for x in xs:
        wf = welford_update(wf, jnp.asarray(x))
        wfd = welford_update(wfd, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(welford_variance(wf)), xs.var(0, ddof=1), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(welford_covariance(wfd)), np.cov(xs.T), rtol=1e-10
    )


def test_checkpoint_roundtrip(tmp_path):
    from dynamichmc_tpu.checkpoint import load_state, save_state
    from dynamichmc_tpu.warmup import WarmupState, initialize_warmup_state

    model = std_normal(3)
    state = initialize_warmup_state(KEY, model, dtype=jnp.float64, eps=0.3)
    save_state(str(tmp_path / "ckpt"), state, KEY)
    state2, key2 = load_state(str(tmp_path / "ckpt"))
    np.testing.assert_array_equal(np.asarray(state.Q.q), np.asarray(state2.Q.q))
    np.testing.assert_array_equal(np.asarray(state.eps), np.asarray(state2.eps))
    np.testing.assert_array_equal(np.asarray(KEY), np.asarray(key2))


def test_ess_rhat_on_iid_draws():
    from dynamichmc_tpu.stats import ess_rhat

    rng = np.random.RandomState(5)
    x = rng.randn(4, 1000, 2)
    out = ess_rhat(x)
    assert np.all(out["rhat"] < 1.01)
    # iid draws: ESS close to total draw count
    assert np.all(out["ess_bulk"] > 2500)
    assert np.all(out["ess_bulk"] < 6000)
    # tail ESS likewise (regression: ordinal tie-ranks collapsed this to ~5)
    assert np.all(out["ess_tail"] > 2500)
    assert np.all(out["ess_tail"] < 6000)


def test_ess_tail_iid_numpy_and_native_paths():
    """Tail ESS on i.i.d. draws must be ~C*N in BOTH implementations."""
    from dynamichmc_tpu import native
    from dynamichmc_tpu.stats import ess_rhat

    rng = np.random.RandomState(7)
    x = rng.randn(4, 4000, 1)
    out_np = ess_rhat(x, use_native=False)
    assert out_np["ess_tail"][0] > 10000, out_np["ess_tail"]
    out_nat = native.ess_rhat_batch(x)
    if out_nat is not None:
        np.testing.assert_allclose(
            out_nat["ess_tail"], out_np["ess_tail"], rtol=1e-7
        )


def test_rhat_detects_nonconvergence():
    from dynamichmc_tpu.stats import ess_rhat

    rng = np.random.RandomState(6)
    x = rng.randn(4, 500, 1)
    x[0] += 5.0  # one chain off in its own mode
    out = ess_rhat(x)
    assert out["rhat"][0] > 1.5
