"""NUTS: binding the tree algebra to Hamiltonian dynamics.

TPU re-design of /root/reference/src/NUTS.jl (L3): multinomial (biased
progressive) proposal sampling, the generalized U-turn criterion with the
three-sub-check robustness fix (NUTS.jl:130-139, Stan discourse #9727),
divergence bookkeeping, and the single-transition entry point ``sample_tree``
— all as one jit/vmap-compatible pure function ``(key, state) -> (state, stats)``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .hamiltonian import (
    EvaluatedPoint,
    PhasePoint,
    calculate_psharp,
    joint_logdensity,
    leapfrog,
)
from .logdensity import LogDensity
from .metric import Metric, rand_p
from .tree import (
    FastTrajectoryOps,
    TrajectoryOps,
    biased_progressive_logprob2,
    random_directions,
    sample_trajectory,
    sample_trajectory_fast,
)
from .utils.pytree import pytree_dataclass, tree_where

DEFAULT_MAX_TREE_DEPTH = 10
"""NUTS.jl:166."""


@dataclasses.dataclass(frozen=True)
class NUTS:
    """Algorithm configuration (static under jit), cf. NUTS.jl:178-195.

    ``turn_statistic_configuration`` mirrors NUTS.jl:184-189 (default
    ``Val(:generalized)``): the string ``"generalized"`` selects the built-in
    generalized U-turn statistic; a custom (hashable) object providing
    ``leaf(metric, z) -> tau`` and ``combine(metric, tau_x, tau_y) ->
    (tau, turning)`` routes the transition through the generic tree driver
    with that statistic (the fast/batch-native drivers require the default).
    """

    max_depth: int = DEFAULT_MAX_TREE_DEPTH
    min_delta: float = -1000.0
    turn_statistic_configuration: object = "generalized"

    def __post_init__(self):
        from .tree import MAX_TREE_DEPTH_BOUND

        if not 0 < self.max_depth <= MAX_TREE_DEPTH_BOUND:
            # 30, not the reference's 32: int32 leaf counters / position
            # indices overflow at depth 31 (see tree.MAX_TREE_DEPTH_BOUND)
            raise ValueError(
                f"max_depth must be in 1..{MAX_TREE_DEPTH_BOUND}"
            )
        if not self.min_delta < 0:
            raise ValueError("min_delta must be negative")
        c = self.turn_statistic_configuration
        if c != "generalized" and not (hasattr(c, "leaf") and hasattr(c, "combine")):
            raise ValueError(
                "turn_statistic_configuration must be 'generalized' or an "
                "object with leaf(metric, z) and combine(metric, x, y)"
            )


@pytree_dataclass
class GeneralizedTurnStatistic:
    """Edge momenta/velocities and the momentum sum rho (NUTS.jl:107-118)."""

    p_minus: jnp.ndarray
    psharp_minus: jnp.ndarray
    p_plus: jnp.ndarray
    psharp_plus: jnp.ndarray
    rho: jnp.ndarray


@pytree_dataclass
class AcceptanceStatistic:
    """log sum of Metropolis acceptance probabilities + leapfrog step count
    over all visited leaves, including invalid subtrees (NUTS.jl:59-67)."""

    log_sum_alpha: jnp.ndarray  # scalar
    steps: jnp.ndarray  # int32 scalar


def acceptance_rate(a: AcceptanceStatistic) -> jnp.ndarray:
    """NUTS.jl:87."""
    steps = jnp.maximum(a.steps, 1)
    return jnp.minimum(jnp.exp(a.log_sum_alpha) / steps, 1.0)


@pytree_dataclass
class TreeStatistics:
    """Per-transition diagnostics, cf. TreeStatisticsNUTS (NUTS.jl:208-221).

    ``term_left``/``term_right`` encode the termination reason like
    ``InvalidTree``: (1, 0) = reached max depth; left == right = divergence at
    that position; left < right = turning over those positions.
    """

    logdensity: jnp.ndarray  # joint log density (negative energy) at proposal
    depth: jnp.ndarray  # int32
    term_left: jnp.ndarray  # int32
    term_right: jnp.ndarray  # int32
    acceptance_rate: jnp.ndarray
    steps: jnp.ndarray  # int32, number of leapfrog steps (= gradient evals)
    directions: jnp.ndarray  # uint32 direction bits
    # batch-native driver only: leaf SLOTS executed for the whole batch this
    # transition (same value on every chain) — steps.mean/work.mean is the
    # useful-work fraction, the straggler-waste diagnostic. None from the
    # per-chain drivers.
    work: Optional[jnp.ndarray] = None

    @property
    def is_divergent(self):
        return self.term_left == self.term_right

    @property
    def reached_max_depth(self):
        return (self.term_left == 1) & (self.term_right == 0)

    @property
    def is_turning(self):
        return ~self.is_divergent & ~self.reached_max_depth


def _is_turning(psharp_minus, psharp_plus, rho):
    """NUTS.jl:130."""
    return (jnp.dot(psharp_minus, rho) < 0) | (jnp.dot(psharp_plus, rho) < 0)


def _combine_turn_statistics(x: GeneralizedTurnStatistic, y: GeneralizedTurnStatistic):
    """Three-way check of NUTS.jl:132-139; x precedes y in trajectory time.

    Returns (combined statistic, turning flag) — the flag replaces the
    reference's ``nothing`` return.
    """
    t1 = _is_turning(x.psharp_minus, y.psharp_minus, x.rho + y.p_minus)
    t2 = _is_turning(x.psharp_plus, y.psharp_plus, x.p_plus + y.rho)
    rho = x.rho + y.rho
    t3 = _is_turning(x.psharp_minus, y.psharp_plus, rho)
    combined = GeneralizedTurnStatistic(
        p_minus=x.p_minus,
        psharp_minus=x.psharp_minus,
        p_plus=y.p_plus,
        psharp_plus=y.psharp_plus,
        rho=rho,
    )
    return combined, t1 | t2 | t3


def combine_acceptance_statistics(a: AcceptanceStatistic, b: AcceptanceStatistic):
    """NUTS.jl:69-71 — shared by the generic and fast ops bundles (any
    change to the acceptance bookkeeping must reach both in lockstep; the
    equivalence gates compare the drivers built on them)."""
    return AcceptanceStatistic(
        log_sum_alpha=jnp.logaddexp(a.log_sum_alpha, b.log_sum_alpha),
        steps=a.steps + b.steps,
    )


def acceptance_identity(v: AcceptanceStatistic):
    """Identity element for :func:`combine_acceptance_statistics`
    (the reference encodes it as the initial leaf, NUTS.jl:78-80)."""
    return AcceptanceStatistic(
        log_sum_alpha=jnp.full_like(v.log_sum_alpha, -jnp.inf),
        steps=jnp.zeros_like(v.steps),
    )


def _leaf_acceptance(delta, is_initial: bool, min_delta):
    """(acceptance statistic, divergent) for one leaf given delta = pi - pi0
    (NUTS.jl:59-67,148-159); the initial leaf contributes nothing and is
    never divergent."""
    if is_initial:
        return (
            AcceptanceStatistic(
                log_sum_alpha=jnp.asarray(-jnp.inf, delta.dtype),
                steps=jnp.int32(0),
            ),
            jnp.asarray(False),
        )
    return (
        AcceptanceStatistic(
            log_sum_alpha=jnp.minimum(delta, 0.0), steps=jnp.int32(1)
        ),
        delta < min_delta,
    )


def make_trajectory_ops(
    ld: LogDensity, metric: Metric, pi0, eps, min_delta,
    turn_statistic_configuration="generalized",
) -> TrajectoryOps:
    """Build the TrajectoryOps bundle for one NUTS transition
    (cf. TrajectoryNUTS, NUTS.jl:15-53, 148-159). A non-default
    ``turn_statistic_configuration`` supplies the leaf/combine turn-statistic
    pair (leaf_turn_statistic dispatch, NUTS.jl:120-139)."""
    custom = turn_statistic_configuration != "generalized"

    def move(z: PhasePoint, is_forward):
        signed_eps = jnp.where(is_forward, eps, -eps)
        return leapfrog(ld, metric, z, signed_eps)

    def leaf(z: PhasePoint, is_initial: bool):
        delta = (
            jnp.zeros_like(pi0)
            if is_initial
            else joint_logdensity(metric, z) - pi0
        )
        v, divergent = _leaf_acceptance(delta, is_initial, min_delta)
        if custom:
            tau = turn_statistic_configuration.leaf(metric, z)
        else:
            psharp = calculate_psharp(metric, z)
            tau = GeneralizedTurnStatistic(
                p_minus=z.p, psharp_minus=psharp, p_plus=z.p,
                psharp_plus=psharp, rho=z.p,
            )
        return z, delta, tau, divergent, v

    def combine_turn(tau_x, tau_y):
        if custom:
            return turn_statistic_configuration.combine(metric, tau_x, tau_y)
        return _combine_turn_statistics(tau_x, tau_y)

    def calculate_logprob2(is_doubling, w1, w2, w):
        return biased_progressive_logprob2(is_doubling, w1, w2, w)

    def combine_proposals(key, z1, z2, logprob2, is_forward):
        # Accept z2 with probability exp(logprob2); the exponential-draw form
        # is distributionally identical to NUTS.jl:43-45.
        accept = (logprob2 >= 0) | (jax.random.exponential(key) > -logprob2)
        return tree_where(accept, z2, z1)

    return TrajectoryOps(
        move=move,
        leaf=leaf,
        combine_turn=combine_turn,
        calculate_logprob2=calculate_logprob2,
        combine_proposals=combine_proposals,
        combine_visited=combine_acceptance_statistics,
        visited_identity=acceptance_identity,
    )


@pytree_dataclass
class CompactTurnStatistic:
    """Edge momenta + momentum sum for the fast driver: psharp is folded into
    the dot products (dot(psharp_a, rho) == dot(p_a, M^-1 rho)), so only three
    vectors are stored per merge-stack level instead of five."""

    p_minus: jnp.ndarray
    p_plus: jnp.ndarray
    rho: jnp.ndarray


def make_fast_trajectory_ops(
    ld: LogDensity, metric: Metric, pi0, eps, min_delta
) -> FastTrajectoryOps:
    """Ops bundle for the multinomial fast driver (see tree.py): leaf payload
    carries (q, logdensity, grad, pi) so no recomputation is needed for the
    returned evaluated position or the tree statistics."""
    from .metric import psharp as metric_psharp

    def move(z: PhasePoint, is_forward):
        signed_eps = jnp.where(is_forward, eps, -eps)
        return leapfrog(ld, metric, z, signed_eps)

    def _check(p_a, p_b, rho):
        # dot(psharp_a, rho) = dot(p_a, M^-1 rho): one psharp per check
        mrho = metric_psharp(metric, rho)
        return (jnp.dot(p_a, mrho) < 0) | (jnp.dot(p_b, mrho) < 0)

    def leaf(z: PhasePoint, is_initial: bool):
        pi = joint_logdensity(metric, z)
        delta = jnp.zeros_like(pi0) if is_initial else pi - pi0
        v, divergent = _leaf_acceptance(delta, is_initial, min_delta)
        tau = CompactTurnStatistic(p_minus=z.p, p_plus=z.p, rho=z.p)
        payload = {
            "q": z.Q.q,
            "logdensity": z.Q.logdensity,
            "grad": z.Q.grad,
            "pi": pi,
        }
        return delta, tau, divergent, v, payload

    def combine_turn(x: CompactTurnStatistic, y: CompactTurnStatistic):
        # the three sub-checks of NUTS.jl:132-139
        t1 = _check(x.p_minus, y.p_minus, x.rho + y.p_minus)
        t2 = _check(x.p_plus, y.p_plus, x.p_plus + y.rho)
        rho = x.rho + y.rho
        t3 = _check(x.p_minus, y.p_plus, rho)
        combined = CompactTurnStatistic(p_minus=x.p_minus, p_plus=y.p_plus, rho=rho)
        return combined, t1 | t2 | t3

    return FastTrajectoryOps(
        move=move,
        leaf=leaf,
        combine_turn=combine_turn,
        combine_visited=combine_acceptance_statistics,
        visited_identity=acceptance_identity,
    )


def sample_tree(
    key: jax.Array,
    algorithm: NUTS,
    ld: LogDensity,
    metric: Metric,
    Q: EvaluatedPoint,
    eps,
    p: Optional[jnp.ndarray] = None,
    directions: Optional[jnp.ndarray] = None,
    fast: bool = True,
    noise=None,
):
    """One NUTS transition (NUTS.jl:232-241): draw momentum and direction
    bits, build the trajectory tree, return (new evaluated position, stats).

    ``p`` and ``directions`` are injectable for deterministic tests; ``noise``
    (a :class:`~dynamichmc_tpu.tree.TreeNoise`, fast driver only) additionally
    injects the per-leaf Gumbel and per-doubling Exponential draws, making the
    whole transition deterministic — the exact-equivalence gates pin the
    batch-native and wavefront drivers against this path.
    ``fast=True`` uses the multinomial Gumbel-argmax driver (identical
    proposal distribution, ~3x less merge-stack HBM traffic); ``fast=False``
    uses the generic progressive-merge driver (the semantics oracle).
    """
    k_p, k_dir, k_tree = jax.random.split(key, 3)
    if p is None:
        p = rand_p(k_p, metric, dtype=Q.q.dtype)
    if directions is None:
        directions = random_directions(k_dir)
    z = PhasePoint(Q=Q, p=p)
    pi0 = joint_logdensity(metric, z)
    min_delta = jnp.asarray(algorithm.min_delta, pi0.dtype)

    if algorithm.turn_statistic_configuration != "generalized":
        # custom turn statistics run through the generic driver
        fast = False

    if noise is not None and not fast:
        raise ValueError("noise injection requires the fast driver")

    if fast:
        ops = make_fast_trajectory_ops(ld, metric, pi0, eps, min_delta)
        result = sample_trajectory_fast(
            ops, k_tree, z, algorithm.max_depth, directions, noise
        )
        payload = result.zeta
        Q_new = EvaluatedPoint(
            q=payload["q"], logdensity=payload["logdensity"], grad=payload["grad"]
        )
        pi_new = payload["pi"]
    else:
        ops = make_trajectory_ops(
            ld, metric, pi0, eps, min_delta,
            algorithm.turn_statistic_configuration,
        )
        result = sample_trajectory(ops, k_tree, z, algorithm.max_depth, directions)
        zeta: PhasePoint = result.zeta
        Q_new = zeta.Q
        pi_new = joint_logdensity(metric, zeta)

    stats = TreeStatistics(
        logdensity=pi_new,
        depth=result.depth,
        term_left=result.term_left,
        term_right=result.term_right,
        acceptance_rate=acceptance_rate(result.v),
        steps=result.v.steps,
        directions=directions,
    )
    return Q_new, stats
