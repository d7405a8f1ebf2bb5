"""Performance autopilot: measured configuration rules as defaults.

Rounds 2-4 established, by same-session A/B measurement on a TPU v5e chip
(BENCH_NOTES.md), a decision table for the scheduling/adaptation knobs that
dominate wall clock at fleet scale. This module encodes that table so a
plain ``run_chains(key, ld, n_chains, n_samples)`` lands near the hand-tuned
benchmark configuration instead of ~4x below it, while every choice stays
overridable per-argument and is logged through the reporter.

The reference library has no analogue (it runs one chain with fixed
defaults, /root/reference/src/NUTS.jl:178-195 and mcmc.jl:415-425); the
statistical *semantics* of those defaults are what the "reference" tuning
mode preserves. The rules, with their measurements:

- **Pooled metric adaptation** (shared metric + Chan-combined Welford
  moments) once the fleet is large enough to estimate it: per-chain dense
  metrics are an O(C K^2) HBM read per leaf — the hot loop's dominant
  traffic at large C (round 2; 78x slower scatter paths); pooling lifted
  1024-chain dense runs ~20x.
- **Dense metric for moderate dimension** when pooled: the headline
  100-d correlated Gaussian requires it (a diagonal metric cannot
  precondition a rotated covariance; tau ~ 30 draws vs ~1). Diagonal
  beyond ``DENSE_DIM_MAX`` where O(K^2) leaf matmuls and metric estimation
  stop paying.
- **Per-chain dual-averaging stepsize** (reference semantics) at every
  fleet size: each chain lands at its own acceptance optimum, where NUTS
  draws antithetically (~2.26 ESS/draw vs ~1.07 pooled, round 3). The
  round-4 "pool eps at >= 8k chains" rule was an md=10 artifact — the
  per-chain eps spread's straggler tax that motivated it is exactly what
  the depth cap removes. Re-measured at 8192 chains under the cap
  (round 5, same session): per-chain 3.24 s / 2.92M ESS/s / total min
  ESS 9.44M vs pooled-eps 2.61 s / 1.74M / 4.54M — per-chain wins
  outright. Pooled stepsize remains available via
  ``default_warmup_stages(pooled_stepsize=True)`` for wall-clock-bound
  runs.
- **Warmup depth clamp 2 with a 25-step tail clamp**: cap tree doublings
  during all warmup blocks but the last (+ the final block's DA-restart
  transient). Cut warmup straggler waste 65% -> ~5% at IDENTICAL total
  ESS and zero divergences (round 3 sweep: clamp 3 = 1.89M, 2 = 2.09M,
  1 = 1.62M ESS/s).
- **Sampling max_depth 4** for large lockstep fleets: the rare deep tree
  stalls every lane; the cap converts pure straggler slots into wall time
  at unchanged total min ESS (round-4 sweep: md=10 2.15M -> md=4 2.87M
  ESS/s, total ESS 4.739M vs 4.732M). A capped kernel is ordinary NUTS
  (Stan's treedepth). Targets whose trees genuinely need depth (e.g.
  Neal's funnel reaches 10) lose mixing, never exactness — the autopilot
  therefore warns post-run when the cap saturates (see
  ``CAP_SATURATION_WARN``) so the user can pass an explicit ``algorithm``
  or ``tune="reference"``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# measured thresholds (BENCH_NOTES.md); module constants so tests pin them
POOLED_METRIC_MIN_CHAINS = 128
DENSE_DIM_MAX = 256
MAX_DEPTH_CAP = 4
MAX_DEPTH_CAP_MIN_CHAINS = 256
WARMUP_DEPTH_CLAMP = 2
WARMUP_DEPTH_CLAMP_MIN_CHAINS = 256
WARMUP_DEPTH_CLAMP_TAIL = 25
CAP_SATURATION_WARN = 0.2  # warn when > 20% of draws hit the auto cap


@dataclasses.dataclass(frozen=True)
class TuningChoices:
    """The autopilot's picks for one run; every field maps to a
    ``run_chains`` argument (``max_depth=None`` = leave the kernel alone)."""

    metric_kind: str
    pooled_metric: bool
    pooled_stepsize: bool
    warmup_depth_clamp: Optional[int]
    warmup_depth_clamp_tail: int
    max_depth: Optional[int]

    def describe(self) -> str:
        eps = "pooled" if self.pooled_stepsize else "per-chain"
        metric = ("pooled " if self.pooled_metric else "per-chain ") + (
            self.metric_kind
        )
        clamp = (
            f"warmup clamp {self.warmup_depth_clamp}"
            f"/{self.warmup_depth_clamp_tail}"
            if self.warmup_depth_clamp
            else "no warmup clamp"
        )
        md = (
            f"max_depth {self.max_depth}" if self.max_depth
            else "reference max_depth"
        )
        return f"{metric} metric, {eps} eps, {clamp}, {md}"


def auto_choices(
    n_chains: int,
    dim: int,
    max_depth_limit: int = 10,
    metric_kind: Optional[str] = None,
) -> TuningChoices:
    """The measured decision table, keyed on (n_chains, dim).

    ``metric_kind`` pins the metric structure when the caller chose one
    (only the pooling decision remains); ``max_depth_limit`` bounds the
    clamp/cap (a user algorithm with a smaller max_depth wins).
    """
    pooled_metric = n_chains >= POOLED_METRIC_MIN_CHAINS
    if metric_kind is None:
        # dense needs pooling to avoid the per-leaf (C, K, K) HBM read and
        # stops paying past DENSE_DIM_MAX; otherwise reference default
        metric_kind = (
            "dense" if (pooled_metric and dim <= DENSE_DIM_MAX) else "diagonal"
        )
    # per-chain eps at every fleet size (see module docstring: the pooled-
    # eps-at-8k rule died with the depth cap)
    pooled_eps = False
    cap = (
        min(MAX_DEPTH_CAP, max_depth_limit)
        if n_chains >= MAX_DEPTH_CAP_MIN_CHAINS
        else None
    )
    # the clamp and cap fix the LOCKSTEP straggler tax — a large-fleet
    # phenomenon; small fleets keep unmodified reference warmup semantics
    clamp = None
    if n_chains >= WARMUP_DEPTH_CLAMP_MIN_CHAINS:
        clamp = min(
            WARMUP_DEPTH_CLAMP, cap if cap is not None else max_depth_limit
        )
    return TuningChoices(
        metric_kind=metric_kind,
        pooled_metric=pooled_metric,
        pooled_stepsize=pooled_eps,
        warmup_depth_clamp=clamp,
        warmup_depth_clamp_tail=WARMUP_DEPTH_CLAMP_TAIL if clamp else 0,
        max_depth=cap,
    )
