"""Post-hoc NUTS diagnostics and interactive debugging tools.

TPU re-design of the Diagnostics submodule (/root/reference/src/diagnostics.jl):
EBFMI, termination/depth histograms and acceptance quantiles over the
per-transition ``TreeStatistics`` arrays (which vmap trivially and stay
on-device), plus the two numerical explorers — acceptance-ratio grids and
bidirectional leapfrog trajectory dumps — as host-side debug APIs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .hamiltonian import PhasePoint, evaluate, joint_logdensity, leapfrog
from .logdensity import LogDensity
from .metric import Metric, identity_metric, rand_p
from .nuts import TreeStatistics
from .stepsize import local_log_acceptance_ratio

ACCEPTANCE_QUANTILES = (0.05, 0.25, 0.5, 0.75, 0.95)
"""diagnostics.jl:35."""


def EBFMI(tree_statistics: TreeStatistics) -> jnp.ndarray:
    """Energy Bayesian fraction of missing information (diagnostics.jl:29-32):
    mean(diff(pi)^2) / var(pi). Values <= 0.3 indicate a poorly chosen
    kinetic energy (Betancourt 2016). Works on (N,) or batched (C, N) stats."""
    pis = tree_statistics.logdensity
    d = jnp.diff(pis, axis=-1)
    # ddof=1: Julia's var() is the corrected sample variance — ddof=0 would
    # read the statistic high by N/(N-1) vs the reference on short windows
    return jnp.mean(d**2, axis=-1) / jnp.var(pis, axis=-1, ddof=1)


@dataclasses.dataclass(frozen=True)
class TreeStatisticsSummary:
    """diagnostics.jl:47-58 (host-side, pretty-printable)."""

    N: int
    a_mean: float
    a_quantiles: np.ndarray
    termination_counts: dict  # max_depth / divergence / turning
    depth_counts: np.ndarray  # first element is depth 0

    def __str__(self) -> str:
        lines = [f"Hamiltonian Monte Carlo sample of length {self.N}"]
        qs = " ".join(f"{q:.2f}" for q in self.a_quantiles)
        lines.append(
            f"  acceptance rate mean: {self.a_mean:.2f}, 5/25/50/75/95%: {qs}"
        )
        term = ", ".join(
            f"{k} => {round(100 * v / self.N)}%"
            for k, v in sorted(self.termination_counts.items())
        )
        lines.append(f"  termination: {term}")
        depth = ", ".join(
            f"{d} => {round(100 * c / self.N)}%"
            for d, c in enumerate(self.depth_counts)
        )
        lines.append(f"  depth: {depth}")
        return "\n".join(lines)


def termination_description(term_left: int, term_right: int) -> str:
    """Human-readable termination reason, mirroring InvalidTree's display
    (trees.jl:189-199): divergence at a position, turning over positions, or
    the reached-max-depth sentinel."""
    left, right = int(term_left), int(term_right)
    if left == 1 and right == 0:
        return "reached maximum depth without divergence or turning"
    if left == right:
        return f"divergence at position {left}"
    return f"turning at positions {left}:{right}"


def count_terminations(tree_statistics: TreeStatistics) -> dict:
    """diagnostics.jl:65-80."""
    max_depth = int(np.asarray(tree_statistics.reached_max_depth).sum())
    divergence = int(np.asarray(tree_statistics.is_divergent).sum())
    turning = int(np.asarray(tree_statistics.is_turning).sum())
    return {"max_depth": max_depth, "divergence": divergence, "turning": turning}


def count_depths(tree_statistics: TreeStatistics) -> np.ndarray:
    """diagnostics.jl:87-93: counts indexed by depth, trailing zeros trimmed."""
    depths = np.asarray(tree_statistics.depth).ravel()
    c = np.bincount(depths, minlength=1)
    last = np.nonzero(c)[0]
    return c[: (last[-1] + 1 if last.size else 0)]


def summarize_tree_statistics(tree_statistics: TreeStatistics) -> TreeStatisticsSummary:
    """diagnostics.jl:100-106."""
    a = np.asarray(tree_statistics.acceptance_rate).ravel()
    return TreeStatisticsSummary(
        N=a.size,
        a_mean=float(a.mean()),
        a_quantiles=np.quantile(a, ACCEPTANCE_QUANTILES),
        termination_counts=count_terminations(tree_statistics),
        depth_counts=count_depths(tree_statistics),
    )


def explore_log_acceptance_ratios(
    ld: LogDensity,
    q,
    log2_epsilons,
    key: Optional[jax.Array] = None,
    metric: Optional[Metric] = None,
    n_momenta: int = 20,
    momenta=None,
) -> np.ndarray:
    """Grid of uncapped one-step log acceptance ratios over log2 stepsizes x
    random momenta (diagnostics.jl:144-152). Useful for diagnosing stepsize /
    divergence pathologies. Returns (len(log2_epsilons), n_momenta)."""
    q = jnp.asarray(q)
    if metric is None:
        metric = identity_metric(ld.dim, dtype=q.dtype)
    if momenta is None:
        key = jax.random.PRNGKey(0) if key is None else key
        momenta = jax.vmap(lambda k: rand_p(k, metric, dtype=q.dtype))(
            jax.random.split(key, n_momenta)
        )
    Q = evaluate(ld, q)
    epsilons = jnp.asarray(2.0, q.dtype) ** jnp.asarray(log2_epsilons, q.dtype)

    def one(p):
        A, _ = local_log_acceptance_ratio(ld, metric, PhasePoint(Q=Q, p=p))
        return jax.vmap(A)(epsilons)

    return np.asarray(jax.jit(jax.vmap(one, out_axes=1))(momenta))


def leapfrog_trajectory(
    ld: LogDensity,
    q,
    eps,
    positions: range,
    key: Optional[jax.Array] = None,
    metric: Optional[Metric] = None,
    p=None,
):
    """Bidirectional leapfrog trajectory dump (diagnostics.jl:214-227).

    Visits ``positions`` (a range containing 0) relative to the start, stopping
    each direction at the first non-finite log density. Returns a list of
    dicts with ``z`` (PhasePoint), ``position``, and ``delta`` (energy change
    relative to position 0), sorted by position. Host-side debug tool.

    A strided range still *integrates* every intermediate leapfrog step
    (physics — a step cannot be skipped) but only the requested positions
    are returned.
    """
    requested = set(positions) | {0}
    lo, hi = min(positions), max(positions)
    if not lo <= 0 <= hi:
        raise ValueError("positions must contain 0")
    q = jnp.asarray(q)
    if metric is None:
        metric = identity_metric(ld.dim, dtype=q.dtype)
    if p is None:
        key = jax.random.PRNGKey(0) if key is None else key
        p = rand_p(key, metric, dtype=q.dtype)
    Q = evaluate(ld, q)
    z0 = PhasePoint(Q=Q, p=p)
    pi0 = joint_logdensity(metric, z0)
    step = jax.jit(lambda z, e: leapfrog(ld, metric, z, e))

    def info(z, i):
        return {
            "z": z,
            "position": i,
            "delta": float(joint_logdensity(metric, z) - pi0),
        }

    out = [info(z0, 0)]
    z = z0
    for i in range(1, hi + 1):
        if not np.isfinite(float(z.Q.logdensity)):
            break
        z = step(z, jnp.asarray(eps, q.dtype))
        out.append(info(z, i))
    z = z0
    for i in range(1, -lo + 1):
        if not np.isfinite(float(z.Q.logdensity)):
            break
        z = step(z, jnp.asarray(-eps, q.dtype))
        out.append(info(z, -i))
    out = [r for r in out if r["position"] in requested]
    return sorted(out, key=lambda r: r["position"])


def straggler_waste(tree_statistics) -> float:
    """Fraction of batch-native leaf slots spent on already-terminated lanes.

    The batch-native driver (tree_batched.py) advances all chains in
    lockstep, so every transition costs ``work`` leaf slots per chain (the
    executed loop iterations) while only ``steps`` of them were useful per
    chain. Returns ``1 - mean(steps) / mean(work)`` over all transitions —
    the SURVEY.md hard-part-#2 variable-depth waste metric. Requires stats
    from the batch-native driver (``work`` is not recorded by the per-chain
    drivers).
    """
    if tree_statistics.work is None:
        raise ValueError("straggler_waste needs batch-native tree statistics "
                         "(per-chain drivers do not record work)")
    steps = np.asarray(tree_statistics.steps, np.float64)
    work = np.asarray(tree_statistics.work, np.float64)
    return float(1.0 - steps.mean() / work.mean())
