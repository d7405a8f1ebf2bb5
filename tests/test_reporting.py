"""Reporter smoke tests (the reference's test_logging.jl tier): every
reporter strategy must run a full warmup+sampling without erroring, and the
logging reporter must emit throttled progress records."""

import logging

import jax
import jax.numpy as jnp

from dynamichmc_tpu import mcmc_with_warmup, from_logdensity_fn
from dynamichmc_tpu.reporting import (
    LogProgressReport,
    NoProgressReport,
    TqdmProgressReport,
    default_reporter,
)

LD = from_logdensity_fn(2, lambda q: -0.5 * jnp.sum(q**2))


def test_no_progress_report_silent(caplog):
    with caplog.at_level(logging.INFO, logger="dynamichmc_tpu"):
        mcmc_with_warmup(
            jax.random.PRNGKey(0), LD, 50, dtype=jnp.float64,
            reporter=NoProgressReport(),
        )
    assert not caplog.records


def test_log_progress_report_emits(caplog):
    reporter = LogProgressReport(chain_id=7, step_interval=25)
    with caplog.at_level(logging.INFO, logger="dynamichmc_tpu"):
        mcmc_with_warmup(
            jax.random.PRNGKey(1), LD, 60, dtype=jnp.float64, reporter=reporter
        )
    text = "\n".join(r.getMessage() for r in caplog.records)
    assert "Starting MCMC" in text
    assert "MCMC progress" in text
    assert "chain_id=7" in text
    assert "found initial stepsize" in text


def test_tqdm_reporter_runs():
    mcmc_with_warmup(
        jax.random.PRNGKey(2), LD, 30, dtype=jnp.float64,
        reporter=TqdmProgressReport(),
    )


def test_default_reporter_noninteractive():
    # test runners are not a tty -> silent default (reporting.jl:184-190)
    assert isinstance(default_reporter(), NoProgressReport)
