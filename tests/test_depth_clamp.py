"""Warmup depth clamp (run_chains(warmup_depth_clamp=)): statistical gates.

The clamp caps tree doublings during every warmup block but the last
(engine.WarmupSchedule.depth_clamp). It is scheduling-only in the sense that
every capped transition is still a valid NUTS kernel; these gates check the
END of warmup is unaffected where it matters — adapted eps in the healthy
range, clean sampling moments, no divergences — on both pooled and
per-chain adaptation. (The wall-clock win is measured on the TPU:
BENCH_NOTES.md round 3 — 65% -> 33% warmup straggler waste, 467k -> 660k
ESS/s on the headline config at unchanged sampling quality.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu.models import mvnormal
from dynamichmc_tpu.parallel import run_chains
from dynamichmc_tpu.warmup import default_warmup_stages


def _target(dim=5, seed=4):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(dim, dim))
    cov = A @ A.T + 0.5 * np.eye(dim)
    return mvnormal(np.zeros(dim), cov), cov


@pytest.mark.parametrize(
    "pooled,pooled_eps,clamp",
    [
        pytest.param(False, False, 3, marks=pytest.mark.slow),
        (True, True, 3),
        # pooled metric + PER-CHAIN eps at clamp 2: the TPU headline config
        (True, False, 2),
        pytest.param(True, False, 3, marks=pytest.mark.slow),
    ],
)
def test_clamped_warmup_moments(pooled, pooled_eps, clamp):
    ld, cov = _target()
    stages = default_warmup_stages(
        metric_kind="dense", pooled=pooled, pooled_stepsize=pooled_eps
    )
    res = run_chains(
        jax.random.PRNGKey(11), ld, 24, 400, dtype=jnp.float64,
        warmup_stages=stages, warmup_depth_clamp=clamp,
    )
    qs = np.asarray(res.positions).reshape(-1, 5)
    assert np.abs(qs.std(0) / np.sqrt(np.diag(cov)) - 1).max() < 0.08
    assert np.abs(qs.mean(0) / np.sqrt(np.diag(cov))).max() < 0.08
    assert int(np.asarray(res.tree_statistics.is_divergent).sum()) == 0
    eps = np.asarray(res.eps)
    assert (eps > 0.05).all() and (eps < 5).all()
    acc = np.asarray(res.tree_statistics.acceptance_rate)
    assert acc.mean() > 0.7


def test_clamp_tail_moments():
    """Extending the clamp into the head of the final eps-only block (the
    DA-restart transient, run_chains(warmup_depth_clamp_tail=)) must leave
    adapted eps and sampling moments clean — the tail of the block still
    re-adapts eps under the unclamped kernel."""
    ld, cov = _target()
    stages = default_warmup_stages(metric_kind="dense", pooled=True)
    res = run_chains(
        jax.random.PRNGKey(13), ld, 24, 400, dtype=jnp.float64,
        warmup_stages=stages, warmup_depth_clamp=3,
        warmup_depth_clamp_tail=25,
    )
    qs = np.asarray(res.positions).reshape(-1, 5)
    assert np.abs(qs.std(0) / np.sqrt(np.diag(cov)) - 1).max() < 0.08
    assert np.abs(qs.mean(0) / np.sqrt(np.diag(cov))).max() < 0.08
    assert int(np.asarray(res.tree_statistics.is_divergent).sum()) == 0
    eps = np.asarray(res.eps)
    assert (eps > 0.05).all() and (eps < 5).all()
    acc = np.asarray(res.tree_statistics.acceptance_rate)
    assert acc.mean() > 0.7


@pytest.mark.slow
def test_clamped_wavefront_warmup_moments():
    """End-to-end: the clamp is honored by the wavefront warmup driver too
    (per-block ``depth_limit`` operand; engine.execute wiring)."""
    ld, cov = _target()
    stages = default_warmup_stages(metric_kind="dense")
    res = run_chains(
        jax.random.PRNGKey(12), ld, 24, 400, dtype=jnp.float64,
        warmup_stages=stages, warmup_depth_clamp=3,
        warmup_driver="wavefront",
    )
    qs = np.asarray(res.positions).reshape(-1, 5)
    assert np.abs(qs.std(0) / np.sqrt(np.diag(cov)) - 1).max() < 0.08
    assert np.abs(qs.mean(0) / np.sqrt(np.diag(cov))).max() < 0.08
    assert int(np.asarray(res.tree_statistics.is_divergent).sum()) == 0
    eps = np.asarray(res.eps)
    assert (eps > 0.05).all() and (eps < 5).all()


def test_clamp_validates_range():
    ld, _ = _target()
    with pytest.raises(ValueError, match="1..max_depth"):
        run_chains(
            jax.random.PRNGKey(0), ld, 8, 16, dtype=jnp.float64,
            warmup_depth_clamp=99,
        )


@pytest.mark.slow
def test_clamp_tail_wavefront_moments():
    """Round 4: the wavefront warmup honors the DA-restart tail clamp too
    (per-lane ``tail_steps`` operand — each lane's first `tail` transitions
    of the final block run clamped, the rest re-adapt unclamped)."""
    ld, cov = _target()
    stages = default_warmup_stages(metric_kind="dense")
    res = run_chains(
        jax.random.PRNGKey(12), ld, 24, 400, dtype=jnp.float64,
        warmup_stages=stages, warmup_depth_clamp=3,
        warmup_depth_clamp_tail=25, warmup_driver="wavefront",
    )
    qs = np.asarray(res.positions).reshape(-1, 5)
    assert np.abs(qs.std(0) / np.sqrt(np.diag(cov)) - 1).max() < 0.08
    assert np.abs(qs.mean(0) / np.sqrt(np.diag(cov))).max() < 0.08
    assert int(np.asarray(res.tree_statistics.is_divergent).sum()) == 0
    eps = np.asarray(res.eps)
    assert (eps > 0.05).all() and (eps < 5).all()


def test_clamp_tail_requires_clamp():
    ld, _ = _target()
    with pytest.raises(ValueError, match="warmup_depth_clamp"):
        run_chains(
            jax.random.PRNGKey(0), ld, 8, 16, dtype=jnp.float64,
            warmup_depth_clamp_tail=10,
        )


def test_clamp_rejects_unexpressible_schedule():
    """A clamp request must never be silently dropped: the scan-based
    fallback path (heterogeneous stage tuples WarmupSchedule.from_stages
    cannot normalize) runs unclamped, so run_chains refuses."""
    from dynamichmc_tpu.stepsize import DualAveraging
    from dynamichmc_tpu.warmup import TuningNUTS

    ld, _ = _target()
    # two blocks with different stepsize adaptations -> from_stages is None
    stages = (
        TuningNUTS(N=20, metric_kind="diagonal"),
        TuningNUTS(N=20, metric_kind="diagonal",
                   stepsize_adaptation=DualAveraging(delta=0.9)),
    )
    with pytest.raises(NotImplementedError, match="expressible"):
        run_chains(
            jax.random.PRNGKey(0), ld, 8, 16, dtype=jnp.float64,
            warmup_stages=stages, warmup_depth_clamp=3,
        )
