"""The log-density (model) contract.

The reference's single most important design decision is that the model is an
opaque gradient oracle implementing the ``LogDensityProblems`` API: ``dimension``
and ``logdensity_and_gradient`` (/root/reference/src/DynamicHMC.jl:18, enforced at
hamiltonian.jl:146-147). The TPU-native analogue: a model is any JAX-traceable
scalar function ``q -> logdensity``; the gradient comes from ``jax.value_and_grad``
and fuses into the leapfrog update under XLA. Models that have a cheaper fused
value+gradient (e.g. Gaussians, where both are one matmul) can override it.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax


@dataclasses.dataclass(frozen=True)
class LogDensity:
    """A target log density on R^dim.

    Attributes:
      dim: dimension of the position vector ``q``.
      logdensity_fn: traced scalar function ``q -> log p(q)`` (up to a constant).
      logdensity_and_gradient_fn: optional fused override returning
        ``(logdensity, gradient)``; defaults to ``jax.value_and_grad``.

    This object is *static* configuration: it is captured in jit closures, not
    traced. Two instances with the same functions hash equal under jit caching
    only if the function objects are identical, so construct once and reuse.
    """

    dim: int
    logdensity_fn: Callable
    logdensity_and_gradient_fn: Optional[Callable] = None
    fused_leapfrog_fn: Optional[Callable] = None
    """Optional fused integrator hook ``(metric, z, eps_signed) -> PhasePoint``
    (e.g. the Pallas Gaussian leapfrog in ops/pallas_leapfrog.py); used by
    ``hamiltonian.leapfrog`` when present. Must implement the same -inf
    poisoning semantics as ``evaluate``."""
    fused_leaf_batched_fn: Optional[Callable] = None
    """Optional batched fused leaf hook
    ``(metric, q, p, g, eps_signed) -> (q', p', g', ld', pi')`` used by the
    batch-native driver (tree_batched.py): one Pallas kernel per leaf
    (ops/pallas_leaf.py). Same poisoning semantics."""
    tree_transition_fn: Optional[Callable] = None
    """Optional whole-transition kernel hook
    ``(key, algorithm, metric, Q, eps, depth_limit) -> (Q', stats) | None``
    (ops/pallas_tree.py): the ENTIRE NUTS transition as one Pallas kernel
    with VMEM-resident tree state. ``sample_tree_batched`` dispatches to it
    when present and applicable (must return None to decline at trace
    time); RNG stream and semantics are pinned to the XLA driver by
    tests/test_pallas_tree.py."""

    def logdensity(self, q):
        return self.logdensity_fn(q)

    def logdensity_and_gradient(self, q):
        if self.logdensity_and_gradient_fn is not None:
            return self.logdensity_and_gradient_fn(q)
        return jax.value_and_grad(self.logdensity_fn)(q)


def from_logdensity_fn(dim: int, fn: Callable) -> LogDensity:
    """Wrap a plain ``q -> scalar`` function as a :class:`LogDensity`."""
    return LogDensity(dim=dim, logdensity_fn=fn)
