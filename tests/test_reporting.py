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


class _RecordingReporter:
    """Step-callback reporter that records every report_step call."""

    def __init__(self):
        self.steps = []
        self.stages = []

    def report_message(self, message: str, **meta):
        pass

    def make_stage_reporter(self, total_steps: int, currently_warmup: bool,
                            **meta):
        self.stages.append((total_steps, currently_warmup))
        return self

    def report_step(self, step: int, **meta):
        self.steps.append(step)

    @property
    def wants_step_callbacks(self) -> bool:
        return True


def test_step_reporter_routes_fast_with_dispatch_replay():
    """An explicit step-callback reporter no longer selects the per-stage-
    inlined scan path: it runs on the fast engine with report_step replayed
    at dispatch boundaries — each stage's final replayed step is its last
    step index, and a sampling stage reporter is created too."""
    rep = _RecordingReporter()
    mcmc_with_warmup(
        jax.random.PRNGKey(5), LD, 16, dtype=jnp.float64,
        warmup_stages=STAGES, reporter=rep,
    )
    # one warmup block (N=20) + sampling (16 draws)
    assert (20, True) in rep.stages
    assert (16, False) in rep.stages
    assert 19 in rep.steps  # last warmup step replayed
    assert 15 in rep.steps  # last sampling step replayed
    assert all(0 <= s < 20 for s in rep.steps)


def test_inline_reporting_optin_keeps_per_step_callbacks():
    """inline_reporting=True restores the scan path's true per-step host
    callbacks (CPU debugging contract)."""
    rep = _RecordingReporter()
    mcmc_with_warmup(
        jax.random.PRNGKey(6), LD, 8, dtype=jnp.float64,
        warmup_stages=STAGES, reporter=rep, inline_reporting=True,
    )
    warmup_steps = [s for s in rep.steps]
    # per-step callbacks: every index of the 20-step block appears
    assert set(range(20)).issubset(set(warmup_steps))
