"""A JAX-compatible dummy integer trajectory for unit-testing the tree driver.

Port of the DummyTrajectory strategy from the reference test suite
(/root/reference/test/test_trees.jl:28-103): positions are integers, ``move``
is +-1, turning and divergence are injected via position ranges, and proposals
carry the *full* within-tree probability vector instead of a sampled point —
which makes exhaustive detailed-balance checks possible with no MCMC at all.

Fixed-shape encoding (everything must jit):
  z     : int32 scalar position
  zeta  : (lo, hi, logp) — logp is absolutely indexed: logp[pos + OFFSET],
          -inf outside the tree's [lo, hi] range
  tau   : (all_turning: bool, first: int32, last: int32)
  v     : (acceptance_sum: float, steps: int32)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dynamichmc_tpu.tree import TrajectoryOps, biased_progressive_logprob2

OFFSET = 64
SPAN = 2 * OFFSET + 1


def log1mexp(x):
    """log(1 - exp(x)) for x <= 0, stable; log1mexp(0) = -inf."""
    return jnp.where(
        x > jnp.log(0.5),
        jnp.log(-jnp.expm1(jnp.minimum(x, 0.0))),
        jnp.log1p(-jnp.exp(x)),
    )


def dummy_logdensity(z):
    """The reference's testl (test_trees.jl:106)."""
    return -((z - 3.0) ** 2) * 0.1


def make_dummy_ops(turning=(1, 0), divergent=(1, 0)):
    """Build TrajectoryOps for the dummy trajectory.

    ``turning`` / ``divergent`` are inclusive (lo, hi) integer ranges; the
    default (1, 0) is empty.
    """
    t_lo, t_hi = turning
    d_lo, d_hi = divergent

    def move(z, is_forward):
        return z + jnp.where(is_forward, jnp.int32(1), jnp.int32(-1))

    def leaf(z, is_initial):
        delta = dummy_logdensity(z.astype(jnp.float64))
        logp = jnp.full((SPAN,), -jnp.inf, jnp.float64)
        logp = logp.at[z + OFFSET].set(0.0)
        zeta = (z, z, logp)
        tau = ((z >= t_lo) & (z <= t_hi), z, z)
        divergent_flag = (z >= d_lo) & (z <= d_hi)
        if is_initial:
            v = (jnp.float64(0.0), jnp.int32(0))
            divergent_flag = jnp.asarray(False)
        else:
            v = (jnp.minimum(jnp.exp(delta), 1.0), jnp.int32(1))
        return zeta, delta, tau, divergent_flag, v

    def combine_turn(tau_x, tau_y):
        fx, x_first, x_last = tau_x
        fy, y_first, y_last = tau_y
        flag = fx & fy
        return (flag, x_first, y_last), flag

    def calculate_logprob2(is_doubling, w1, w2, w):
        return biased_progressive_logprob2(is_doubling, w1, w2, w)

    def combine_proposals(key, zeta1, zeta2, logprob2, is_forward):
        lo1, hi1, logp1 = zeta1
        lo2, hi2, logp2 = zeta2
        lp2 = jnp.minimum(logprob2, 0.0)
        lp1 = log1mexp(lp2)
        logp = jnp.logaddexp(logp1 + lp1, logp2 + lp2)
        return (jnp.minimum(lo1, lo2), jnp.maximum(hi1, hi2), logp)

    def combine_visited(v1, v2):
        return (v1[0] + v2[0], v1[1] + v2[1])

    def visited_identity(v):
        return (jnp.zeros_like(v[0]), jnp.zeros_like(v[1]))

    return TrajectoryOps(
        move=move,
        leaf=leaf,
        combine_turn=combine_turn,
        calculate_logprob2=calculate_logprob2,
        combine_proposals=combine_proposals,
        combine_visited=combine_visited,
        visited_identity=visited_identity,
    )
