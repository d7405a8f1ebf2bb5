"""Performance autopilot (autotune.py + run_chains tune="auto").

Pins the measured decision table (BENCH_NOTES.md rounds 2-4) and gates the
auto-picked configurations statistically: the autopilot may only re-schedule
and re-pool — posterior moments, acceptance, and divergence behavior must
match the target at every auto configuration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu import autotune
from dynamichmc_tpu.autotune import auto_choices
from dynamichmc_tpu.models import correlated_gaussian, std_normal
from dynamichmc_tpu.nuts import NUTS
from dynamichmc_tpu.parallel import run_chains
from dynamichmc_tpu.warmup import default_warmup_stages


# --- decision table pins --------------------------------------------------


def test_headline_fleet_choices():
    """4096 x 100-d: the hand-tuned bench configuration (pooled dense
    metric, per-chain eps, warmup clamp 2/25, sampling max_depth 4)."""
    c = auto_choices(4096, 100)
    assert c.metric_kind == "dense"
    assert c.pooled_metric
    assert not c.pooled_stepsize
    assert c.warmup_depth_clamp == 2
    assert c.warmup_depth_clamp_tail == 25
    assert c.max_depth == 4


def test_per_chain_eps_at_every_fleet_size():
    """Round-5 re-measure under the depth cap (8192 chains, same session):
    per-chain eps 2.92M ESS/s / total min ESS 9.44M vs pooled-eps 1.74M /
    4.54M — the round-4 pool-at-8k rule was an md=10 artifact (the eps
    spread's straggler tax is exactly what the cap removes)."""
    assert not auto_choices(4096, 100).pooled_stepsize
    assert not auto_choices(8192, 100).pooled_stepsize
    assert not auto_choices(16384, 100).pooled_stepsize


def test_small_fleet_keeps_reference_semantics():
    c = auto_choices(64, 100)
    assert c.metric_kind == "diagonal"
    assert not c.pooled_metric
    assert not c.pooled_stepsize
    assert c.warmup_depth_clamp is None
    assert c.max_depth is None


def test_high_dim_goes_diagonal():
    c = auto_choices(4096, 1000)
    assert c.metric_kind == "diagonal"
    assert c.pooled_metric


def test_user_max_depth_limits_cap_and_clamp():
    c = auto_choices(4096, 100, max_depth_limit=3)
    assert c.max_depth == 3
    assert c.warmup_depth_clamp == 2
    c2 = auto_choices(4096, 100, max_depth_limit=1)
    assert c2.max_depth == 1
    assert c2.warmup_depth_clamp == 1


def test_caller_metric_kind_pins_structure():
    c = auto_choices(4096, 100, metric_kind="diagonal")
    assert c.metric_kind == "diagonal"
    assert c.pooled_metric  # pooling decision still automatic


# --- run_chains integration -----------------------------------------------

DIM = 6
STAGES_KW = dict(init_steps=20, middle_steps=20, doubling_stages=2,
                 terminating_steps=20)


def _run(n_chains=256, n_samples=64, **kw):
    logs = []
    res = run_chains(
        jax.random.PRNGKey(11),
        std_normal(DIM, dtype=jnp.float32),
        n_chains=n_chains,
        n_samples=n_samples,
        log=logs.append,
        **kw,
    )
    return res, logs


def _auto_line(logs):
    lines = [l for l in logs if l.startswith("autotune:")]
    assert len(lines) <= 1
    return lines[0] if lines else ""


def test_auto_applies_and_logs_at_fleet_scale():
    res, logs = _run(n_chains=256)
    line = _auto_line(logs)
    assert "max_depth=4" in line
    assert "pooled dense metric" in line
    assert "per-chain eps" in line
    assert "warmup clamp 2/25" in line
    # the cap is live in the compiled kernel
    assert int(np.asarray(res.tree_statistics.depth).max()) <= 4
    # pooled metric: ONE shared (K, K) matrix
    assert np.asarray(res.metric.m_inv).shape == (DIM, DIM)
    # per-chain eps
    assert np.asarray(res.eps).shape == (256,)


def test_reference_mode_keeps_reference_defaults():
    res, logs = _run(n_chains=256, tune="reference", n_samples=16)
    assert _auto_line(logs) == ""
    # per-chain diagonal metric (reference default_warmup_stages)
    assert np.asarray(res.metric.m_inv).shape == (256, DIM)


def test_explicit_algorithm_wins():
    _res, logs = _run(n_chains=256, algorithm=NUTS(), n_samples=16)
    assert "max_depth" not in _auto_line(logs)


def test_explicit_no_clamp():
    _res, logs = _run(n_chains=256, warmup_depth_clamp=0, n_samples=16)
    assert "clamp" not in _auto_line(logs)
    assert "max_depth=4" in _auto_line(logs)


def test_small_fleet_logs_only_structural_choices():
    _res, logs = _run(n_chains=32, n_samples=16)
    line = _auto_line(logs)
    assert "max_depth" not in line
    assert "clamp" not in line


def test_explicit_stages_respected():
    stages = default_warmup_stages(metric_kind="diagonal", **STAGES_KW)
    res, logs = _run(n_chains=256, warmup_stages=stages, n_samples=16)
    # per-chain diagonal preserved; the warmup clamp (exactness-neutral
    # scheduling) still applies, but the depth CAP does not — its safety
    # was measured to depend on fleet-pooled metric quality, which user
    # stages don't guarantee (test_bench_kernel_semantics_bench_dim)
    assert np.asarray(res.metric.m_inv).shape == (256, DIM)
    assert "clamp" in _auto_line(logs)
    assert "max_depth" not in _auto_line(logs)


def test_tune_validates():
    with pytest.raises(ValueError, match="tune"):
        _run(tune="fastest")


# --- statistical gates at the auto-picked configurations -------------------


@pytest.mark.slow
def test_auto_config_moment_recovery():
    """The fleet-scale auto configuration (pooled dense + clamp 2/25 +
    max_depth 4) must recover the moments of a correlated Gaussian."""
    model = correlated_gaussian(DIM, dtype=jnp.float64)
    logs = []
    res = run_chains(
        jax.random.PRNGKey(5), model, n_chains=256, n_samples=256,
        dtype=jnp.float64, log=logs.append,
    )
    assert "max_depth=4" in _auto_line(logs)
    q = np.asarray(res.positions).reshape(-1, DIM)
    cov = np.asarray(model.cov_fn())
    sd = np.sqrt(np.diag(cov))
    assert np.abs(q.mean(0) / sd).max() < 0.05
    assert np.abs(q.std(0) / sd - 1).max() < 0.05
    acc = np.asarray(res.tree_statistics.acceptance_rate)
    assert acc.mean() > 0.7
    div = np.asarray(res.tree_statistics.is_divergent).mean()
    assert div < 0.001


@pytest.mark.slow
def test_cap_saturation_warning_fires():
    """Neal's funnel builds genuinely deep trees that no Euclidean metric
    preconditions away; the auto cap saturates under the autopilot's own
    pooled stages and the post-run warning must say so (the safety valve
    for funnel-like targets)."""
    from dynamichmc_tpu.models import funnel

    model = funnel(8, dtype=jnp.float64)
    logs = []
    res = run_chains(
        jax.random.PRNGKey(6), model, n_chains=256, n_samples=64,
        dtype=jnp.float64, log=logs.append,
    )
    assert "max_depth=4" in _auto_line(logs)
    depth = np.asarray(res.tree_statistics.depth)
    assert (depth >= 4).mean() > autotune.CAP_SATURATION_WARN
    assert any("autotune WARNING" in l for l in logs)
