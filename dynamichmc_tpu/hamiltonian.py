"""Hamiltonian dynamics: cached evaluations, phase points, leapfrog.

TPU-native redesign of /root/reference/src/hamiltonian.jl (L1 of the layer map).
Key semantics preserved exactly, but with branchless ``jnp.where`` instead of
exceptions:

- ``EvaluatedPoint`` caches (q, logdensity, gradient) so each leapfrog step costs
  exactly one gradient evaluation (hamiltonian.jl:165-176).
- Non-finite log density or gradient is *poisoned* to -inf instead of raising
  (hamiltonian.jl:202-217): the resulting leaf becomes divergent and the sampler
  rejects and continues.
- The joint density H(q, p) converts any non-finite value to -inf
  (hamiltonian.jl:251-256).

The strict mode (used only for the user-supplied initial position,
mcmc.jl:131) lives in ``evaluate_strict`` and runs eagerly on host so it can
raise ``DynamicHMCError`` with a full debug payload.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .errors import DynamicHMCError
from .logdensity import LogDensity
from .metric import Metric, kinetic_energy, psharp
from .utils.pytree import pytree_dataclass


@pytree_dataclass
class EvaluatedPoint:
    """Log density evaluated at a position; gradient cached for reuse."""

    q: jnp.ndarray  # (K,)
    logdensity: jnp.ndarray  # scalar
    grad: jnp.ndarray  # (K,)


@pytree_dataclass
class PhasePoint:
    """Position (with cached evaluation) plus momentum."""

    Q: EvaluatedPoint
    p: jnp.ndarray  # (K,)


def evaluate(ld: LogDensity, q: jnp.ndarray) -> EvaluatedPoint:
    """Evaluate log density + gradient with -inf poisoning (non-strict mode).

    Exactly reproduces hamiltonian.jl:202-217: if the log density and gradient
    are all finite, or the log density is exactly -inf (a clean rejection),
    keep them; otherwise replace the log density with -inf so the downstream
    leaf is treated as divergent rather than crashing.
    """
    value, grad = ld.logdensity_and_gradient(q)
    value = jnp.asarray(value)
    ok = jnp.isfinite(value) & jnp.all(jnp.isfinite(grad))
    clean_reject = value == -jnp.inf
    poisoned = jnp.where(ok | clean_reject, value, -jnp.inf)
    return EvaluatedPoint(q=q, logdensity=poisoned, grad=grad)


def evaluate_strict(ld: LogDensity, q) -> EvaluatedPoint:
    """Eager, host-side strict evaluation for the *initial* position.

    Raises :class:`DynamicHMCError` with a debug payload on any non-finite
    result, mirroring the ``strict = true`` branch of hamiltonian.jl:202-217
    (used at mcmc.jl:131) — with one deliberate deviation: the reference's
    first branch accepts a log density of exactly ``-Inf`` even in strict
    mode, but a ``-Inf`` initial joint density makes every leaf's
    ``delta = pi - pi0`` NaN (NaN never compares below ``min_delta``, so no
    divergence ever fires and the sampler runs max-depth NaN trees). An
    initial point must be inside the support; the batched init path
    (parallel/chains.init_chain_states) applies the same rule.
    """
    q = jnp.asarray(q)
    if not bool(np.all(np.isfinite(np.asarray(q)))):
        raise DynamicHMCError("Position vector has non-finite elements.", q=q)
    value, grad = ld.logdensity_and_gradient(q)
    value_np = np.asarray(value)
    grad_np = np.asarray(grad)
    if np.isfinite(value_np) and np.all(np.isfinite(grad_np)):
        return EvaluatedPoint(q=q, logdensity=jnp.asarray(value), grad=jnp.asarray(grad))
    if np.isfinite(value_np):
        raise DynamicHMCError("Gradient has non-finite elements.", q=q, grad=grad_np)
    raise DynamicHMCError("Invalid log posterior.", q=q, logdensity=value_np)


def joint_logdensity(metric: Metric, z: PhasePoint) -> jnp.ndarray:
    """log p(q) - K(p), with non-finite values poisoned to -inf.

    Mirrors ``logdensity(H, z)`` at hamiltonian.jl:251-256: a non-finite
    position log density short-circuits to -inf; a non-finite kinetic energy
    (NaN/Inf from a blown-up leapfrog step) is treated as +inf energy, also
    producing -inf.
    """
    lq = z.Q.logdensity
    k = kinetic_energy(metric, z.p)
    k = jnp.where(jnp.isfinite(k), k, jnp.inf)
    value = lq - k
    return jnp.where(jnp.isfinite(lq), value, -jnp.inf)


def calculate_psharp(metric: Metric, z: PhasePoint) -> jnp.ndarray:
    return psharp(metric, z.p)


def leapfrog(ld: LogDensity, metric: Metric, z: PhasePoint, eps) -> PhasePoint:
    """One velocity-Verlet step (hamiltonian.jl:273-282).

    Exactly one gradient evaluation per step; gradients at both endpoints are
    cached in the ``EvaluatedPoint``s. A non-finite gradient at the new point
    propagates into the momentum, is caught by ``joint_logdensity`` and turns
    the leaf divergent — never an error.

    Models may provide ``fused_leapfrog_fn`` (e.g. the single-kernel Pallas
    Gaussian leapfrog) which replaces the whole step.
    """
    if ld.fused_leapfrog_fn is not None:
        return ld.fused_leapfrog_fn(metric, z, eps)
    half = eps / 2
    p_mid = z.p + half * z.Q.grad
    q_new = z.Q.q + eps * psharp(metric, p_mid)
    Q_new = evaluate(ld, q_new)
    p_new = p_mid + half * Q_new.grad
    return PhasePoint(Q=Q_new, p=p_new)
