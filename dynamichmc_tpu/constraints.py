"""Constrained-parameter transforms: sample on R^n, report in the domain.

The reference deliberately delegates domain transforms to the sibling
TransformVariables/TransformedLogDensities packages (docs/src/index.md:23-25;
SURVEY.md L0: "AD, domain transforms, and model DSLs live in sibling
packages"). A user switching to this framework needs the same capability, so
a minimal, composable, JAX-native version ships in-tree: elementwise and
block transforms with log-Jacobian corrections, a builder that turns a
constrained log density into an unconstrained :class:`LogDensity`, and a
vectorized inverse for mapping draws back to the constrained domain.

All transforms are pure jnp functions — they trace, vmap and differentiate
like everything else; the Jacobian term fuses into the gradient under XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from .logdensity import LogDensity


@dataclasses.dataclass(frozen=True)
class Transform:
    """A bijection from a block of unconstrained reals to a constrained
    domain.

    Attributes:
      input_dim: number of unconstrained inputs consumed.
      output_dim: number of constrained outputs produced.
      forward: (x: (input_dim,)) -> (y: (output_dim,), log|det J|): constrained
        value and the log absolute Jacobian determinant of the forward map.
      inverse: (y) -> x.
    """

    input_dim: int
    output_dim: int
    forward: Callable
    inverse: Callable


def identity(dim: int = 1) -> Transform:
    """Unconstrained block."""
    return Transform(
        input_dim=dim,
        output_dim=dim,
        forward=lambda x: (x, jnp.zeros((), x.dtype)),
        inverse=lambda y: y,
    )


def positive(dim: int = 1) -> Transform:
    """(0, inf) via exp; log|J| = sum(x)."""
    return Transform(
        input_dim=dim,
        output_dim=dim,
        forward=lambda x: (jnp.exp(x), jnp.sum(x)),
        inverse=lambda y: jnp.log(y),
    )


def bounded(lo: float, hi: float, dim: int = 1) -> Transform:
    """(lo, hi) via a scaled logistic; log|J| = sum(log sigmoid'(x)) + log w."""
    if not lo < hi:
        raise ValueError("need lo < hi")
    width = hi - lo

    def forward(x):
        s = jax.nn.sigmoid(x)
        y = lo + width * s
        log_j = jnp.sum(jnp.log(width) + jax.nn.log_sigmoid(x) + jax.nn.log_sigmoid(-x))
        return y, log_j

    def inverse(y):
        u = (y - lo) / width
        return jnp.log(u) - jnp.log1p(-u)

    return Transform(input_dim=dim, output_dim=dim, forward=forward, inverse=inverse)


def simplex(n: int) -> Transform:
    """The (n-1)-dim stick-breaking parameterization of the n-simplex
    (as in Stan): n-1 unconstrained inputs -> n positive outputs summing to 1."""
    if n < 2:
        raise ValueError("simplex needs n >= 2")

    def forward(x):
        k = n - 1
        offsets = jnp.log(jnp.arange(k, 0, -1, dtype=x.dtype))
        z = jax.nn.sigmoid(x - offsets)  # break fractions

        def body(remaining, zi):
            yi = remaining * zi
            # d y_i / d x_i = remaining * z_i * (1 - z_i); the map is lower
            # triangular so the log-determinant is the sum of these.
            lj = jnp.log(remaining) + jnp.log(zi) + jnp.log1p(-zi)
            return remaining - yi, (yi, lj)

        remaining, (ys, ljs) = jax.lax.scan(body, jnp.ones((), x.dtype), z)
        y = jnp.concatenate([ys, remaining[None]])
        return y, jnp.sum(ljs)

    def inverse(y):
        k = n - 1
        cums = jnp.concatenate([jnp.zeros((1,), y.dtype), jnp.cumsum(y[:-1])])[:k]
        z = y[:k] / (1 - cums)
        offsets = jnp.log(jnp.arange(k, 0, -1, dtype=y.dtype))
        return jnp.log(z) - jnp.log1p(-z) + offsets

    return Transform(input_dim=n - 1, output_dim=n, forward=forward, inverse=inverse)


@dataclasses.dataclass(frozen=True)
class TransformStack:
    """An ordered sequence of transforms applied to contiguous blocks of the
    unconstrained vector."""

    transforms: Tuple[Transform, ...]

    @property
    def input_dim(self) -> int:
        return sum(t.input_dim for t in self.transforms)

    @property
    def output_dim(self) -> int:
        return sum(t.output_dim for t in self.transforms)

    def forward_with_logdet(self, x):
        if x.shape[-1] != self.input_dim:
            # a mismatched vector would silently slice short/past the data
            # and return wrong-but-plausible values
            raise ValueError(
                f"expected an unconstrained vector of length "
                f"{self.input_dim}, got {x.shape[-1]}"
            )
        ys, log_j, off = [], jnp.zeros((), x.dtype), 0
        for t in self.transforms:
            y, lj = t.forward(x[off : off + t.input_dim])
            ys.append(jnp.atleast_1d(y))
            log_j = log_j + lj
            off += t.input_dim
        return jnp.concatenate(ys), log_j

    def forward(self, x):
        return self.forward_with_logdet(x)[0]

    def inverse(self, y):
        if y.shape[-1] != self.output_dim:
            raise ValueError(
                f"expected a constrained vector of length "
                f"{self.output_dim}, got {y.shape[-1]}"
            )
        xs, off = [], 0
        for t in self.transforms:
            xs.append(jnp.atleast_1d(t.inverse(y[off : off + t.output_dim])))
            off += t.output_dim
        return jnp.concatenate(xs)


def as_stack(transforms: Sequence[Transform]) -> TransformStack:
    return TransformStack(transforms=tuple(transforms))


def transformed_logdensity(
    constrained_logdensity_fn: Callable, transforms: Sequence[Transform]
) -> LogDensity:
    """Build an unconstrained :class:`LogDensity` from a log density defined
    on a constrained domain: lp(x) = lp_constrained(T(x)) + log|det J_T(x)|.

    The TPU analogue of TransformedLogDensity in the reference's ecosystem.
    Use ``constrain_draws`` to map posterior draws back.
    """
    stack = as_stack(transforms)

    def logdensity_fn(x):
        y, log_j = stack.forward_with_logdet(x)
        return constrained_logdensity_fn(y) + log_j

    return LogDensity(dim=stack.input_dim, logdensity_fn=logdensity_fn)


def constrain_draws(transforms: Sequence[Transform], draws):
    """Map (N, input_dim) unconstrained draws to (N, output_dim) constrained
    values (vmapped forward transform)."""
    stack = as_stack(transforms)
    return jax.vmap(stack.forward)(jnp.asarray(draws))
