"""Aligned wavefront warmup driver (tree_wavefront.py) + pooled stepsize.

The wavefront driver desynchronizes transition lifecycles across lanes; these
tests gate that its end-to-end statistics match the synchronized driver, that
its masked Welford folds are exact, and that the guard rails hold.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu import PooledStepsize
from dynamichmc_tpu.models import mvnormal, std_normal
from dynamichmc_tpu.parallel import run_chains
from dynamichmc_tpu.warmup import default_warmup_stages


@pytest.mark.slow
def test_wavefront_end_to_end_matches_sync_statistics():
    rng = np.random.default_rng(5)
    A = rng.normal(size=(4, 4))
    cov = A @ A.T + 0.3 * np.eye(4)
    ld = mvnormal(np.zeros(4), cov)
    res = run_chains(
        jax.random.PRNGKey(1), ld, 16, 400, dtype=jnp.float64,
        warmup_stages=default_warmup_stages(
            metric_kind="dense", pooled=True, init_steps=40,
            middle_steps=20, doubling_stages=3, terminating_steps=25,
        ),
        warmup_driver="wavefront",
    )
    qs = np.asarray(res.positions).reshape(-1, 4)
    assert np.abs(qs.std(0) / np.sqrt(np.diag(cov)) - 1).max() < 0.08
    assert np.abs(qs.mean(0) / np.sqrt(np.diag(cov))).max() < 0.08
    acc = float(np.asarray(res.tree_statistics.acceptance_rate).mean())
    assert acc > 0.7
    # pooled metric approximates the covariance
    np.testing.assert_allclose(np.asarray(res.metric.m_inv), cov,
                               atol=0.4 * np.abs(cov).max())


def test_wavefront_per_chain_adaptation():
    ld = std_normal(3)
    res = run_chains(
        jax.random.PRNGKey(2), ld, 8, 200, dtype=jnp.float64,
        warmup_stages=default_warmup_stages(
            init_steps=40, middle_steps=20, doubling_stages=3,
            terminating_steps=25,
        ),
        warmup_driver="wavefront",
    )
    eps = np.asarray(res.eps)
    assert eps.shape == (8,)
    assert len(np.unique(eps)) == 8  # lanes adapt independently
    qs = np.asarray(res.positions).reshape(-1, 3)
    assert np.abs(qs.std(0) - 1).max() < 0.12


def test_masked_welford_updates_exact():
    from dynamichmc_tpu.tree_wavefront import (
        welford_update_masked,
        welford_update_pooled_masked,
    )
    from dynamichmc_tpu.utils.welford import WelfordState

    rng = np.random.default_rng(0)
    xs = rng.normal(size=(30, 6, 3))
    masks = rng.random((30, 6)) < 0.4

    # pooled: fold masked batches; must equal the plain moments of the
    # included rows
    st = WelfordState(
        count=jnp.zeros(()), mean=jnp.zeros(3), m2=jnp.zeros((3, 3))
    )
    included = []
    for x, m in zip(xs, masks):
        st = welford_update_pooled_masked(
            st, jnp.asarray(x), jnp.asarray(m)
        )
        included.extend(x[m])
    included = np.asarray(included)
    assert int(st.count) == len(included)
    np.testing.assert_allclose(np.asarray(st.mean), included.mean(0), rtol=1e-9)
    cov_m2 = (included - included.mean(0)).T @ (included - included.mean(0))
    np.testing.assert_allclose(np.asarray(st.m2), cov_m2, rtol=1e-8, atol=1e-9)

    # per-chain: each lane's moments over its own included steps
    st2 = WelfordState(
        count=jnp.zeros(6), mean=jnp.zeros((6, 3)), m2=jnp.zeros((6, 3))
    )
    for x, m in zip(xs, masks):
        st2 = welford_update_masked(st2, jnp.asarray(x), jnp.asarray(m))
    for lane in range(6):
        rows = xs[masks[:, lane], lane, :]
        assert int(np.asarray(st2.count)[lane]) == len(rows)
        if len(rows):
            np.testing.assert_allclose(
                np.asarray(st2.mean)[lane], rows.mean(0), rtol=1e-9
            )


def test_trailing_ones():
    from dynamichmc_tpu.tree_wavefront import _trailing_ones

    for g, expect in [(0, 0), (1, 1), (2, 0), (3, 2), (7, 3), (8, 0),
                      (11, 2), (1023, 10), (1024, 0)]:
        assert int(_trailing_ones(jnp.int32(g))) == expect, g


def test_wavefront_guards():
    ld = std_normal(2)
    with pytest.raises(ValueError):
        run_chains(jax.random.PRNGKey(3), ld, 8, 10, warmup_driver="turbo")


@pytest.mark.slow
def test_wavefront_pooled_stepsize_epochal():
    # epochal pooled eps: completed-transition acceptances pool into ONE
    # shared dual-averaging update per epoch of global slots
    rng = np.random.default_rng(11)
    A = rng.normal(size=(4, 4))
    cov = A @ A.T + 0.3 * np.eye(4)
    ld = mvnormal(np.zeros(4), cov)
    res = run_chains(
        jax.random.PRNGKey(6), ld, 16, 400, dtype=jnp.float64,
        # epochal pooled eps needs more DA updates than the other e2e
        # tests' half schedules provide (one shared update per 16 global
        # slots): keep a 3/4-length schedule here
        warmup_stages=default_warmup_stages(
            metric_kind="dense", pooled=True, pooled_stepsize=True,
            init_steps=75, middle_steps=25, doubling_stages=3,
            terminating_steps=50,
        ),
        warmup_driver="wavefront",
    )
    eps = np.asarray(res.eps)
    assert eps.ndim == 0 and 0.05 < float(eps) < 5.0
    qs = np.asarray(res.positions).reshape(-1, 4)
    assert np.abs(qs.std(0) / np.sqrt(np.diag(cov)) - 1).max() < 0.08
    assert np.abs(qs.mean(0) / np.sqrt(np.diag(cov))).max() < 0.08
    acc = float(np.asarray(res.tree_statistics.acceptance_rate).mean())
    assert acc > 0.7


def test_pooled_stepsize_shared_eps():
    ld = std_normal(3)
    res = run_chains(
        jax.random.PRNGKey(4), ld, 16, 200, dtype=jnp.float64,
        warmup_stages=default_warmup_stages(pooled=True, pooled_stepsize=True),
    )
    eps = np.asarray(res.eps)
    assert eps.ndim == 0
    assert 0.4 < float(eps) < 2.5
    acc = float(np.asarray(res.tree_statistics.acceptance_rate).mean())
    assert 0.6 < acc <= 1.0
    qs = np.asarray(res.positions).reshape(-1, 3)
    assert np.abs(qs.std(0) - 1).max() < 0.1
