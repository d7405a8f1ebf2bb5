"""Stepsize heuristics and adaptation.

TPU re-design of /root/reference/src/stepsize.jl: the Hoffman–Gelman bracketing
search for the initial stepsize (stepsize.jl:46-60) becomes a bounded
``lax.while_loop`` returning a success flag instead of throwing; Nesterov dual
averaging (stepsize.jl:98-156) is a pure state fold carried through the warmup
``lax.scan``.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from .hamiltonian import PhasePoint, joint_logdensity, leapfrog
from .logdensity import LogDensity
from .metric import Metric
from .utils.pytree import pytree_dataclass


# --- initial stepsize search --------------------------------------------------


@dataclasses.dataclass(frozen=True)
class InitialStepsizeSearch:
    """Bracketing parameters (stepsize.jl:23-36): double/halve the stepsize
    until the local log acceptance ratio crosses ``log_threshold``."""

    initial_eps: float = 0.1
    log_threshold: float = math.log(0.8)
    maxiter_crossing: int = 400

    def __post_init__(self):
        if not (math.isfinite(self.log_threshold) and self.log_threshold < 0):
            raise ValueError("log_threshold must be finite and negative")
        if not (math.isfinite(self.initial_eps) and self.initial_eps > 0):
            raise ValueError("initial_eps must be finite and positive")
        if self.maxiter_crossing < 50:
            raise ValueError("maxiter_crossing must be >= 50")


def local_log_acceptance_ratio(ld: LogDensity, metric: Metric, z: PhasePoint):
    """Return a traced function eps -> A(eps), the uncapped one-step log
    acceptance ratio around ``z`` (stepsize.jl:75-85)."""
    l0 = joint_logdensity(metric, z)

    def A(eps):
        z1 = leapfrog(ld, metric, z, eps)
        return joint_logdensity(metric, z1) - l0

    return A, l0


def find_initial_stepsize(params: InitialStepsizeSearch, A, dtype=None):
    """Bounded bracketing search (stepsize.jl:46-60).

    Returns ``(eps, success)``; ``success`` is a traced bool that is False if
    the threshold was never crossed within ``maxiter_crossing`` iterations
    (the reference throws; jitted code cannot, so callers check the flag on
    host and raise ``DynamicHMCError`` eagerly). ``dtype`` pins the stepsize
    dtype to the sampler's (otherwise x64 mode would upcast it and poison the
    chain state dtype downstream).
    """
    eps0 = jnp.asarray(params.initial_eps, dtype)
    thr = params.log_threshold
    a0 = A(eps0)
    double = a0 > thr

    def cond(carry):
        return (~carry["found"]) & (carry["it"] < params.maxiter_crossing)

    def body(carry):
        eps_new = jnp.where(double, carry["eps"] * 2, carry["eps"] / 2)
        a_new = A(eps_new)
        crossed = jnp.where(double, a_new < thr, a_new > thr)
        return {
            "eps": eps_new,
            "found": carry["found"] | crossed,
            "it": carry["it"] + 1,
        }

    out = jax.lax.while_loop(
        cond, body, {"eps": eps0, "found": jnp.asarray(False), "it": jnp.int32(0)}
    )
    return out["eps"], out["found"]


# --- dual averaging -------------------------------------------------------------


@pytree_dataclass
class DualAveragingState:
    """stepsize.jl:121-127."""

    mu: jnp.ndarray
    m: jnp.ndarray  # iteration counter, kept as float for the update formulas
    h_bar: jnp.ndarray
    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class DualAveraging:
    """Nesterov dual averaging of log-stepsize toward a target acceptance rate
    ``delta`` (Hoffman & Gelman 2014, Alg. 6; stepsize.jl:98-117)."""

    delta: float = 0.8
    gamma: float = 0.05
    kappa: float = 0.75
    t0: int = 10

    def __post_init__(self):
        if not 0 < self.delta < 1:
            raise ValueError("delta must be in (0, 1)")
        if not self.gamma > 0:
            raise ValueError("gamma must be positive")
        if not 0.5 < self.kappa <= 1:
            raise ValueError("kappa must be in (0.5, 1]")
        if self.t0 < 0:
            raise ValueError("t0 must be non-negative")

    def init(self, eps) -> DualAveragingState:
        """stepsize.jl:134-138: mu = log(10) + log(eps), m = 1."""
        log_eps = jnp.log(jnp.asarray(eps))
        return DualAveragingState(
            mu=jnp.log(10.0) + log_eps,
            m=jnp.ones_like(log_eps),
            h_bar=jnp.zeros_like(log_eps),
            log_eps=log_eps,
            log_eps_bar=jnp.zeros_like(log_eps),
        )

    def update(self, state: DualAveragingState, a) -> DualAveragingState:
        """stepsize.jl:147-156; ``a`` is the tree-averaged acceptance rate."""
        a = jnp.clip(a, 0.0, 1.0)
        m = state.m + 1
        h_bar = state.h_bar + (self.delta - a - state.h_bar) / (m + self.t0)
        log_eps = state.mu - jnp.sqrt(m) / self.gamma * h_bar
        log_eps_bar = state.log_eps_bar + m ** (-self.kappa) * (
            log_eps - state.log_eps_bar
        )
        return DualAveragingState(
            mu=state.mu, m=m, h_bar=h_bar, log_eps=log_eps, log_eps_bar=log_eps_bar
        )

    def current(self, state: DualAveragingState):
        """Stepsize for the next transition while tuning (stepsize.jl:163)."""
        return jnp.exp(state.log_eps)

    def final(self, state: DualAveragingState):
        """Averaged stepsize after adaptation (stepsize.jl:170)."""
        return jnp.exp(state.log_eps_bar)


@dataclasses.dataclass(frozen=True)
class PooledStepsize:
    """Cross-chain stepsize adaptation (TPU-native addition; the reference
    adapts each chain separately).

    Wraps a per-chain adaptation with a SHARED state driven by the batch-mean
    acceptance rate: one eps for the whole fleet, adapted from a nearly
    noise-free signal. This removes the warmup straggler tax measured with
    per-chain dual averaging — early acceptance noise drives individual
    chains' eps down, and those chains then pay hundreds of leapfrog steps
    per transition for whole blocks while the rest of the batch waits
    (persistent slow lanes; measured 86-95% of warmup leaf slots on the
    headline config). Warmup-only coupling: sampling runs fixed shared eps,
    so each chain remains a valid NUTS chain (same approximation class as
    pooled metric adaptation).
    """

    inner: object = None
    # named mesh axis to pool over IN ADDITION to the local chain batch:
    # under shard_map each device only sees its local lanes, and a purely
    # local mean would adapt a different "shared" eps per device. Set by the
    # engine when building mesh programs; users need not touch it.
    axis_name: object = None

    def __post_init__(self):
        if self.inner is None:
            object.__setattr__(self, "inner", DualAveraging())

    def _pool_eps(self, eps):
        eps = jnp.asarray(eps)
        if eps.ndim == 0:
            if self.axis_name is None:
                return eps
            # scalar PER-LANE view (inside a vmapped/shard_mapped body):
            # the pool IS the mean over the bound axis — without it each
            # lane's DA would start from its own search eps and the
            # "shared" stepsize would silently adapt per-chain
            return jnp.exp(jax.lax.pmean(jnp.log(eps), self.axis_name))
        pooled = jnp.mean(jnp.log(eps))
        pooled = self._pmean(pooled)
        return jnp.exp(pooled)  # geometric mean

    def _pmean(self, x):
        """pmean over the mesh axis when inside the sharded program.

        INVARIANT (kept by the program builders, parallel/chains.py): an
        instance with ``axis_name`` set exists only inside the shard_map-
        wrapped program bodies where that axis is bound; every host-side
        call (init/current/final in engine.execute) goes through the
        original unbound instance, whose local view IS the global pool. No
        exception-based fallback — an unbound-axis NameError here is a real
        builder bug and must surface."""
        if self.axis_name is None:
            return x
        return jax.lax.pmean(x, self.axis_name)

    def init(self, eps):
        return self.inner.init(self._pool_eps(eps))

    def update(self, state, a):
        a = jnp.asarray(a)
        pooled = a if a.ndim == 0 else jnp.mean(a)
        pooled = self._pmean(pooled)
        return self.inner.update(state, pooled)

    def current(self, state):
        return self.inner.current(state)

    def final(self, state):
        return self.inner.final(state)


@dataclasses.dataclass(frozen=True)
class FixedStepsize:
    """No-op adaptation with the same four-function interface
    (stepsize.jl:181-189)."""

    def init(self, eps):
        return jnp.asarray(eps)

    def update(self, state, a):
        return state

    def current(self, state):
        return state

    def final(self, state):
        return state
