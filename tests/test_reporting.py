"""Reporter smoke tests (the reference's test_logging.jl tier): every
reporter strategy must run warmup+sampling without erroring, and the logging
reporter must emit throttled progress records. These test *logging*, not
sampling, so they use a 2-d model with a tiny warmup schedule."""

import logging

import jax
import jax.numpy as jnp

from dynamichmc_tpu import mcmc_with_warmup, from_logdensity_fn
from dynamichmc_tpu.reporting import (
    LogProgressReport,
    NoProgressReport,
    TqdmProgressReport,
    default_reporter,
    stage_log,
)
from dynamichmc_tpu.stepsize import InitialStepsizeSearch
from dynamichmc_tpu.warmup import TuningNUTS

LD = from_logdensity_fn(2, lambda q: -0.5 * jnp.sum(q**2))
STAGES = (InitialStepsizeSearch(), TuningNUTS(N=20, metric_kind="diagonal"))


def test_no_progress_report_silent(caplog):
    with caplog.at_level(logging.INFO, logger="dynamichmc_tpu"):
        mcmc_with_warmup(
            jax.random.PRNGKey(0), LD, 20, dtype=jnp.float64,
            warmup_stages=STAGES, reporter=NoProgressReport(),
        )
    assert not caplog.records


def test_log_progress_report_emits(caplog):
    reporter = LogProgressReport(chain_id=7, step_interval=5)
    with caplog.at_level(logging.INFO, logger="dynamichmc_tpu"):
        mcmc_with_warmup(
            jax.random.PRNGKey(1), LD, 16, dtype=jnp.float64,
            warmup_stages=STAGES, reporter=reporter,
        )
    text = "\n".join(r.getMessage() for r in caplog.records)
    assert "Starting MCMC" in text
    assert "MCMC progress" in text
    assert "chain_id=7" in text
    assert "found initial stepsize" in text


def test_tqdm_reporter_runs():
    mcmc_with_warmup(
        jax.random.PRNGKey(2), LD, 10, dtype=jnp.float64,
        warmup_stages=STAGES, reporter=TqdmProgressReport(),
    )


def test_default_reporter_noninteractive():
    # test runners are not a tty -> silent default (reporting.jl:184-190)
    assert isinstance(default_reporter(), NoProgressReport)


def test_stage_log_silent_for_no_progress():
    assert stage_log(None) is None
    assert stage_log(NoProgressReport()) is None
    assert callable(stage_log(LogProgressReport()))


def test_default_interactive_reporter_uses_fast_engine(caplog, monkeypatch):
    """An interactive default reporter logs stage-boundary progress through
    the fast engine (no step callbacks, no retraces; reporting.jl:184-190)."""
    import sys

    monkeypatch.setattr(sys.stdout, "isatty", lambda: True)
    assert isinstance(default_reporter(), LogProgressReport)
    with caplog.at_level(logging.INFO, logger="dynamichmc_tpu"):
        mcmc_with_warmup(
            jax.random.PRNGKey(3), LD, 20, dtype=jnp.float64,
            warmup_stages=STAGES, reporter=None,
        )
    text = "\n".join(r.getMessage() for r in caplog.records)
    assert "warmup block" in text


def test_chunk_boundary_rate_and_eta():
    """The fast engine's dispatch-boundary progress lines carry steps/sec and
    an ETA estimate (reporting.jl:118-136 parity at chunk granularity)."""
    from dynamichmc_tpu.parallel import run_chains

    messages = []
    run_chains(
        jax.random.PRNGKey(4), LD, 4, 8, dtype=jnp.float64,
        warmup_stages=STAGES, log=messages.append,
    )
    text = "\n".join(messages)
    assert "steps/s" in text and "s left" in text  # warmup chunks
    assert "draws/s" in text  # sampling chunks
