"""Progress reporting — the observability side channel.

TPU re-design of /root/reference/src/reporting.jl: the same strategy pattern
(``NoProgressReport`` / ``LogProgressReport`` / ``TqdmProgressReport``), but
adapted to the XLA execution model: per-transition reporting from inside a
compiled ``lax.scan`` uses ``jax.debug.callback`` (off by default — host
callbacks serialize the hot loop), while stage-boundary reporting is free
(eager Python between stage scans). A *step* is a NUTS transition, not a
leapfrog step (reporting.jl:30).
"""

from __future__ import annotations

import dataclasses
import logging
import sys
import time
from typing import Optional

logger = logging.getLogger("dynamichmc_tpu")


class NoProgressReport:
    """Silent default (reporting.jl:14); also the default in non-interactive
    sessions (reporting.jl:184-190)."""

    def report_message(self, message: str, **meta):
        pass

    def make_stage_reporter(self, total_steps: int, currently_warmup: bool, **meta):
        return self

    def report_step(self, step: int, **meta):
        pass

    @property
    def wants_step_callbacks(self) -> bool:
        return False


@dataclasses.dataclass
class LogProgressReport:
    """Throttled logging reporter (reporting.jl:62-136): reports at most every
    ``step_interval`` steps / ``time_interval_s`` seconds, with steps/sec and
    an ETA estimate."""

    chain_id: Optional[object] = None
    step_interval: int = 100
    time_interval_s: float = 1000.0

    def __post_init__(self):
        self._total_steps = 0
        self._last_step = -1
        self._last_time = time.monotonic()

    def _meta_str(self, meta):
        items = dict(meta)
        if self.chain_id is not None:
            items = {"chain_id": self.chain_id, **items}
        return " ".join(f"{k}={v}" for k, v in items.items())

    def report_message(self, message: str, **meta):
        logger.info("%s %s", message, self._meta_str(meta))

    def make_stage_reporter(self, total_steps: int, currently_warmup: bool, **meta):
        r = LogProgressReport(
            chain_id=self.chain_id,
            step_interval=self.step_interval,
            time_interval_s=self.time_interval_s,
        )
        r._total_steps = total_steps
        r._last_step = -1
        r._last_time = time.monotonic()
        logger.info(
            "Starting MCMC total_steps=%d %s", total_steps, self._meta_str(meta)
        )
        return r

    def report_step(self, step: int, **meta):
        now = time.monotonic()
        d_steps = step - self._last_step
        d_time = now - self._last_time
        if (
            self._last_step < 0
            or d_steps >= self.step_interval
            or d_time >= self.time_interval_s
        ):
            sec_per_step = d_time / max(d_steps, 1)
            eta = (self._total_steps - step) * sec_per_step
            logger.info(
                "MCMC progress step=%d seconds_per_step=%.2g "
                "estimated_seconds_left=%.2g %s",
                step,
                sec_per_step,
                eta,
                self._meta_str(meta),
            )
            self._last_step = step
            self._last_time = now

    @property
    def wants_step_callbacks(self) -> bool:
        return True


@dataclasses.dataclass
class TqdmProgressReport:
    """Progress-bar reporter (the reference's ProgressMeterReport,
    reporting.jl:148-176), using tqdm when available."""

    def report_message(self, message: str, **meta):
        pass

    def make_stage_reporter(self, total_steps: int, currently_warmup: bool, **meta):
        try:
            from tqdm import tqdm  # type: ignore

            bar = tqdm(
                total=total_steps,
                desc="Warmup" if currently_warmup else "MCMC",
                leave=False,
            )
        except Exception:  # pragma: no cover - tqdm absent
            bar = None
        r = TqdmProgressReport()
        r._bar = bar
        r._count = 0
        return r

    def report_step(self, step: int, **meta):
        bar = getattr(self, "_bar", None)
        if bar is None:
            return
        # ``step`` is the 0-based scan index; callbacks may arrive out of
        # order (ordered=False), so track the monotone max of completed
        # steps and close the bar at 100% (it would otherwise park at
        # total-1 and linger until GC, garbling later stage bars)
        done = step + 1
        count = getattr(self, "_count", 0)
        if done > count:
            bar.update(done - count)
            self._count = done
        if bar.total is not None and self._count >= bar.total:
            bar.close()

    @property
    def wants_step_callbacks(self) -> bool:
        return True


def default_reporter():
    """Interactive sessions log, non-interactive are silent
    (reporting.jl:184-190)."""
    if sys.stdout.isatty():
        return LogProgressReport()
    return NoProgressReport()


def stage_log(reporter):
    """The engine's stage-boundary ``log`` hook for a reporter: ``None`` for
    silent reporters (no per-chunk host sync), else a message callable.

    This is how the default interactive reporter attaches to the fast engine
    (reporting.jl:184-190 wired via mcmc.jl:521-532) without per-step host
    callbacks: progress is reported at each watchdog-safe dispatch boundary.
    """
    if reporter is None or isinstance(reporter, NoProgressReport):
        return None
    return reporter.report_message
