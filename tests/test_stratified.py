"""Depth-stratified sampling (engine.execute stratified branch).

With per-chain stepsizes the lockstep sampling batch pays every
transition's max-over-lanes tree depth; stratify_sampling=G sorts lanes by
adapted eps and samples G contiguous width-C/G groups. These tests gate
that it is scheduling-only: lane order, warmup results, and target moments
are unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu.models import mvnormal
from dynamichmc_tpu.parallel import run_chains
from dynamichmc_tpu.warmup import default_warmup_stages


def _target(dim=5, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(dim, dim))
    cov = A @ A.T + 0.5 * np.eye(dim)
    return mvnormal(np.zeros(dim), cov), cov


# half-length schedule for the fast tier: the stratification gates check
# moments, lane-order restoration and warmup-untouched equalities — none
# depend on the full 900-step schedule (same trim as the wavefront tier)
_HALF_STAGES = default_warmup_stages(
    metric_kind="dense", init_steps=40, middle_steps=20, doubling_stages=3,
    terminating_steps=25,
)


def test_stratified_moments_and_lane_order():
    ld, cov = _target()
    res = run_chains(
        jax.random.PRNGKey(1), ld, 24, 250, dtype=jnp.float64,
        warmup_stages=_HALF_STAGES,
        stratify_sampling=4,
    )
    q = np.asarray(res.positions)
    assert q.shape == (24, 250, 5)
    qs = q.reshape(-1, 5)
    assert np.abs(qs.std(0) / np.sqrt(np.diag(cov)) - 1).max() < 0.10
    assert np.abs(qs.mean(0) / np.sqrt(np.diag(cov))).max() < 0.10
    assert int(np.asarray(res.tree_statistics.is_divergent).sum()) == 0

    # warmup is untouched: eps/metric identical to the unstratified run,
    # in the caller's lane order
    res0 = run_chains(
        jax.random.PRNGKey(1), ld, 24, 8, dtype=jnp.float64,
        warmup_stages=_HALF_STAGES,
    )
    np.testing.assert_array_equal(np.asarray(res.eps), np.asarray(res0.eps))
    np.testing.assert_array_equal(
        np.asarray(res.metric.m_inv), np.asarray(res0.metric.m_inv)
    )


def test_stratified_requires_divisible_groups():
    ld, _ = _target()
    with pytest.raises(ValueError, match="divisible"):
        run_chains(
            jax.random.PRNGKey(0), ld, 10, 16, dtype=jnp.float64,
            stratify_sampling=4,
        )


def test_stratified_pooled_eps_rejected():
    # shared eps has no per-chain straggler spread to sort: the request
    # cannot be honored, and silently running unstratified would misreport
    # the measured scheduling — run_chains refuses up front
    ld, _ = _target()
    with pytest.raises(ValueError, match="per-chain stepsize"):
        run_chains(
            jax.random.PRNGKey(2), ld, 16, 200, dtype=jnp.float64,
            warmup_stages=default_warmup_stages(
                metric_kind="dense", pooled=True, pooled_stepsize=True,
                init_steps=40, middle_steps=20, doubling_stages=3,
                terminating_steps=25,
            ),
            stratify_sampling=4,
        )


def test_stratified_on_mesh_permutation():
    """Mesh stratification = lane permutation: eps-banded device shards,
    zero cross-device depth sync (shard_map already bounds each device's
    lockstep loop locally). Gates on the virtual 8-device CPU mesh:
    correct moments, untouched warmup (eps/metric bitwise-equal to the
    unstratified mesh run in caller lane order), and restored lane order.

    What one chip CANNOT confirm: the wall-clock win. On the virtual CPU
    mesh all shards share one core, so the depth-bound benefit (each
    device's loop bounded by its own eps band instead of the global
    min-eps straggler) is a prediction for real multi-chip hardware, not a
    measurement; docs/performance.md carries the honest
    predicted-vs-measured note.
    """
    from dynamichmc_tpu.parallel import chain_mesh

    mesh = chain_mesh()
    ld, cov = _target()
    kwargs = dict(
        dtype=jnp.float64,
        warmup_stages=_HALF_STAGES,
        mesh=mesh,
    )
    res = run_chains(
        jax.random.PRNGKey(3), ld, 32, 200, stratify_sampling=8, **kwargs
    )
    q = np.asarray(res.positions)
    assert q.shape == (32, 200, 5)
    qs = q.reshape(-1, 5)
    assert np.abs(qs.std(0) / np.sqrt(np.diag(cov)) - 1).max() < 0.10
    assert np.abs(qs.mean(0) / np.sqrt(np.diag(cov))).max() < 0.10

    # warmup untouched + per-lane outputs in the caller's lane order
    res0 = run_chains(jax.random.PRNGKey(3), ld, 32, 8, **kwargs)
    np.testing.assert_array_equal(np.asarray(res.eps), np.asarray(res0.eps))
    np.testing.assert_array_equal(
        np.asarray(res.metric.m_inv), np.asarray(res0.metric.m_inv)
    )
