"""Kill-and-resume through the fast engine's monolithic warmup.

VERDICT round-3 item 5: a 900-step warmup that dies at block 5 must not
restart from zero. The engine's step keys fold absolute indices (the same
invariant behind retry-after-watchdog-kill bitwise identity), so resuming
from a WarmupCheckpoint taken at any dispatch boundary reproduces the
uninterrupted run's draws exactly. Architectural hook per SURVEY §5 /
/root/reference/src/mcmc.jl:72-79 (warmup as a pure state fold).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu.models import correlated_gaussian
from dynamichmc_tpu.parallel import run_chains
from dynamichmc_tpu.warmup import default_warmup_stages


def _stages():
    return default_warmup_stages(
        metric_kind="dense", init_steps=20, middle_steps=20,
        doubling_stages=1, terminating_steps=20,
    )


def _run(key, ld, sink=None, resume=None):
    return run_chains(
        key, ld, n_chains=8, n_samples=16, warmup_stages=_stages(),
        dtype=jnp.float64, warmup_checkpoint_sink=sink, warmup_resume=resume,
    )


def test_warmup_resume_bitwise(tmp_path):
    from dynamichmc_tpu.checkpoint import load_state, save_state

    ld = correlated_gaussian(3, dtype=jnp.float64)
    key = jax.random.PRNGKey(7)

    ckpts = []
    ref = _run(key, ld, sink=ckpts.append)
    # the adaptive chunker starts at 4 steps/dispatch: a fresh program sees
    # several dispatch boundaries across the 48-step schedule
    assert len(ckpts) >= 2, [int(c.step) for c in ckpts]
    assert int(ckpts[-1].step) == 60
    mid = next(c for c in ckpts if 0 < int(c.step) < 60)

    # process-death simulation: the checkpoint round-trips through disk
    save_state(str(tmp_path / "ck"), mid)
    restored, _ = load_state(str(tmp_path / "ck"))

    res = _run(key, ld, resume=restored)
    np.testing.assert_array_equal(
        np.asarray(res.positions), np.asarray(ref.positions)
    )
    np.testing.assert_array_equal(np.asarray(res.eps), np.asarray(ref.eps))
    np.testing.assert_array_equal(
        np.asarray(res.metric.m_inv), np.asarray(ref.metric.m_inv)
    )
    # per-draw statistics agree too (same trees, same bookkeeping)
    np.testing.assert_array_equal(
        np.asarray(res.tree_statistics.depth),
        np.asarray(ref.tree_statistics.depth),
    )


def test_warmup_resume_validations():
    ld = correlated_gaussian(3, dtype=jnp.float64)
    with pytest.raises(NotImplementedError, match="sync"):
        run_chains(
            jax.random.PRNGKey(0), ld, 8, 4, warmup_stages=_stages(),
            dtype=jnp.float64, warmup_driver="wavefront",
            warmup_checkpoint_sink=lambda c: None,
        )
    # shape mismatch: a checkpoint from another fleet size must not load
    ckpts = []
    _run(jax.random.PRNGKey(7), ld, sink=ckpts.append)
    from dynamichmc_tpu.errors import DynamicHMCError

    with pytest.raises(DynamicHMCError, match="shape"):
        run_chains(
            jax.random.PRNGKey(7), ld, 16, 4, warmup_stages=_stages(),
            dtype=jnp.float64, warmup_resume=ckpts[0],
        )
