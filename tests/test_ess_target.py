"""ESS-target ("sample until converged") sampling on the batched engine.

The batched-engine realization of the reference's stepwise
run-until-criterion pattern (/root/reference/src/mcmc.jl:320-333): after
sampling-chunk boundaries the engine evaluates the accumulated draws'
min-over-parameters pooled bulk ESS on device and stops once it reaches the
target, returning exactly the draws taken.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu import stats
from dynamichmc_tpu.models import std_normal
from dynamichmc_tpu.parallel import run_chains
from dynamichmc_tpu.warmup import default_warmup_stages

DIM = 4
CHAINS = 32
CHUNK = 32
CAP = 1024


def _stages():
    # short but complete schedule: search + 20 eps-only + 2 metric blocks
    # + 20 eps-only = 100 warmup steps (fast-engine expressible)
    return default_warmup_stages(
        init_steps=20, middle_steps=20, doubling_stages=2,
        terminating_steps=20,
    )


def _run(ess_target=None, n_samples=CAP, **kw):
    return run_chains(
        jax.random.PRNGKey(7),
        std_normal(DIM, dtype=jnp.float32),
        n_chains=CHAINS,
        n_samples=n_samples,
        warmup_stages=_stages(),
        sample_chunk=CHUNK,
        ess_target=ess_target,
        **kw,
    )


def _min_bulk_ess(positions):
    r = stats.ess_rhat(np.asarray(positions, np.float64))
    return float(np.min(r["ess_bulk"]))


def test_stops_within_one_chunk_of_target():
    """With every chunk boundary checked (factor=1.0), the run must stop at
    the FIRST boundary where min bulk ESS >= target: the target is met at
    the stop, and was not yet met one chunk earlier."""
    target = 2000.0
    res = _run(ess_target=target, ess_check_factor=1.0)
    n_drawn = res.positions.shape[1]
    assert n_drawn < CAP, "well-conditioned target must converge before cap"
    assert n_drawn % CHUNK == 0
    # the on-device check (f32) and the host oracle (f64) agree to ~1e-3;
    # assert with that slack rather than bitwise
    assert _min_bulk_ess(res.positions) >= 0.99 * target
    if n_drawn > CHUNK:
        assert _min_bulk_ess(res.positions[:, : n_drawn - CHUNK]) < 1.01 * target


def test_early_stop_draws_match_fixed_run():
    """The draws of an ESS-target run are bitwise identical to a fixed-length
    run of the same draw count (the criterion is pure scheduling)."""
    res = _run(ess_target=2000.0, ess_check_factor=1.0)
    n_drawn = res.positions.shape[1]
    fixed = _run(n_samples=CAP)  # same cap => same chunk layout
    np.testing.assert_array_equal(
        np.asarray(res.positions), np.asarray(fixed.positions[:, :n_drawn])
    )


def test_unreachable_target_runs_to_cap():
    res = _run(ess_target=1e12, n_samples=4 * CHUNK, ess_check_factor=1.0)
    assert res.positions.shape[1] == 4 * CHUNK


def test_geometric_check_schedule():
    """factor=2 checks at ~doubling draw counts: the stop lands on a chunk
    boundary that is >= the target's first-met boundary (never earlier)."""
    target = 2000.0
    every = _run(ess_target=target, ess_check_factor=1.0)
    geo = _run(ess_target=target, ess_check_factor=2.0)
    assert geo.positions.shape[1] >= every.positions.shape[1]
    assert _min_bulk_ess(geo.positions) >= 0.99 * target


def test_ess_target_rejects_draw_sink():
    with pytest.raises(Exception, match="draw_sink"):
        _run(ess_target=100.0, draw_sink=lambda *a: None)


def test_ess_target_rejects_epoch_driver():
    with pytest.raises(NotImplementedError, match="sync"):
        _run(ess_target=100.0, sampling_driver="epoch")


def test_ess_target_rejects_group_serial_stratification():
    with pytest.raises(NotImplementedError, match="stratify"):
        _run(ess_target=100.0, stratify_sampling=4)
