"""Tests for the iterative tree driver against the dummy integer trajectory.

Ports the reference's proof-grade tree tests (test/test_trees.jl): direction
bit mechanics, adjacent-tree traversal order observables (termination
positions, step counts, probability normalization), and — critically — the
exhaustive detailed-balance enumeration over all 2^depth direction masks
(test_trees.jl:171-262), run through the exact jitted lax.while_loop driver.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dummy_trajectory import OFFSET, SPAN, make_dummy_ops, dummy_logdensity
from dynamichmc_tpu.tree import (
    TERM_MAX_DEPTH,
    is_divergent_termination,
    is_turning_termination,
    next_direction,
    random_directions,
    reached_max_depth,
    sample_trajectory,
)

KEY = jax.random.PRNGKey(0)


def test_directions_bits():
    # test_trees.jl:8-17
    flags = jnp.uint32(0b110101)
    seen = []
    for _ in range(6):
        bit, flags = next_direction(flags)
        seen.append(bool(bit))
    assert seen == [True, False, True, False, True, True]
    bits = random_directions(KEY)
    assert bits.dtype == jnp.uint32


def run_trajectory(ops, z0, max_depth, flags):
    fn = functools.partial(sample_trajectory, ops)
    jitted = jax.jit(fn, static_argnums=(2,))
    return jitted(KEY, jnp.int32(z0), max_depth, jnp.uint32(flags))


def test_dummy_full_tree():
    # Analogue of "dummy sampled tree" (test_trees.jl:156-165): directions
    # 0b101 with depth 3 visits [1, -1, -2, 2, 3, 4, 5].
    ops = make_dummy_ops()
    result = run_trajectory(ops, 0, 3, 0b101)
    lo, hi, logp = result.zeta
    assert int(lo) == -2 and int(hi) == 5
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(), 1.0, rtol=1e-12)
    assert reached_max_depth(result.term_left, result.term_right)
    assert int(result.depth) == 3
    acc_sum, steps = result.v
    assert int(steps) == 7  # initial node does not count
    expected = sum(min(np.exp(dummy_logdensity(z)), 1) for z in [1, -1, -2, 2, 3, 4, 5])
    np.testing.assert_allclose(float(acc_sum), expected, rtol=1e-12)


def test_dummy_turning():
    # Analogue of "dummy adjacent tree turning" (test_trees.jl:126-133):
    # turning at 5:7, all-forward directions, depth 3. The reference's
    # adjacent_tree visits 1:6 and returns InvalidTree(5, 6).
    ops = make_dummy_ops(turning=(5, 7))
    result = run_trajectory(ops, 0, 3, 0b111111)
    # Doubling structure: [1]; [2,3]; [4,5,6,7]. Within the depth-2 adjacent
    # tree the first merge with both halves in the turning set is (6,7).
    assert is_turning_termination(result.term_left, result.term_right)
    assert int(result.term_left) == 6 and int(result.term_right) == 7
    assert int(result.depth) == 2  # two successful doublings before the invalid tree
    _, steps = result.v
    assert int(steps) == 7  # visited 1..7, then stopped


def test_dummy_divergent():
    # Analogue of "dummy adjacent tree divergent" (test_trees.jl:135-142).
    ops = make_dummy_ops(divergent=(5, 7))
    result = run_trajectory(ops, 0, 3, 0b111111)
    assert is_divergent_termination(result.term_left, result.term_right)
    assert int(result.term_left) == 5
    _, steps = result.v
    assert int(steps) == 5  # visited 1..5, stopped at the divergence
    acc_sum, _ = result.v
    expected = sum(min(np.exp(dummy_logdensity(z)), 1) for z in range(1, 6))
    np.testing.assert_allclose(float(acc_sum), expected, rtol=1e-12)


def test_dummy_backward_tree():
    # All-backward directions, depth 3 doublings: visits -1; -2,-3; -4..-7.
    ops = make_dummy_ops()
    result = run_trajectory(ops, 0, 3, 0b000)
    lo, hi, _ = result.zeta
    assert int(lo) == -7 and int(hi) == 0
    _, steps = result.v
    assert int(steps) == 7


# --- detailed balance --------------------------------------------------------


def make_visited_log_probabilities(ops, depth):
    """P(z -> .) over all 2^depth direction masks as a (Z, SPAN) batch of log
    probabilities (test_trees.jl:188-199), one compile for all start points."""
    fn = functools.partial(sample_trajectory, ops)

    def one(z0, flags):
        result = fn(KEY, z0, depth, flags)
        return result.zeta[2]

    all_flags = jnp.arange(2**depth, dtype=jnp.uint32)

    @jax.jit
    def batch(z0s):
        logps = jax.vmap(
            lambda z0: jax.vmap(lambda f: one(z0, f))(all_flags)
        )(z0s)  # (Z, 2^depth, SPAN)
        return jax.scipy.special.logsumexp(logps, axis=1) + depth * jnp.log(0.5)

    return batch


def check_detailed_balance(ops, z0, depth, atol=1e-8):
    """P(z) P(z'|z) == P(z') P(z|z') for every reachable z'
    (test_trees.jl:239-246)."""
    batch = make_visited_log_probabilities(ops, depth)
    acc0 = np.asarray(batch(jnp.asarray([z0], jnp.int32))[0])
    lz0 = dummy_logdensity(z0)
    reachable = np.nonzero(np.isfinite(acc0))[0]
    assert reachable.size > 0
    # transition probabilities from z0 must sum to one
    np.testing.assert_allclose(np.exp(acc0[reachable]).sum(), 1.0, rtol=1e-10)
    z1s = reachable - OFFSET
    acc_all = np.asarray(batch(jnp.asarray(z1s, jnp.int32)))  # (Z, SPAN)
    for row, (idx, z1) in enumerate(zip(reachable, z1s)):
        lhs = acc0[idx] + lz0
        rhs = acc_all[row, z0 + OFFSET] + dummy_logdensity(z1)
        assert abs(lhs - rhs) < atol, (
            f"detailed balance violated: z={z0} z'={z1} depth={depth}: "
            f"{lhs} vs {rhs}"
        )


@pytest.mark.parametrize(
    "depth",
    [1, 2, 3, pytest.param(4, marks=pytest.mark.slow),
     pytest.param(5, marks=pytest.mark.slow)],
)
def test_detailed_balance_plain(depth):
    check_detailed_balance(make_dummy_ops(), 0, depth)


@pytest.mark.parametrize(
    "depth",
    [1, 2, 3, pytest.param(4, marks=pytest.mark.slow),
     pytest.param(5, marks=pytest.mark.slow)],
)
def test_detailed_balance_turning(depth):
    check_detailed_balance(make_dummy_ops(turning=(1, 2)), 3, depth)


@pytest.mark.parametrize(
    "depth",
    [1, 2, 3, pytest.param(4, marks=pytest.mark.slow),
     pytest.param(5, marks=pytest.mark.slow),
     pytest.param(6, marks=pytest.mark.slow)],
)
def test_detailed_balance_divergent(depth):
    check_detailed_balance(make_dummy_ops(divergent=(10, 11)), 3, depth)


@pytest.mark.parametrize(
    "depth",
    [1, 2, 3, pytest.param(4, marks=pytest.mark.slow),
     pytest.param(5, marks=pytest.mark.slow),
     pytest.param(6, marks=pytest.mark.slow)],
)
def test_detailed_balance_both(depth):
    check_detailed_balance(
        make_dummy_ops(divergent=(10, 12), turning=(-3, -2)), 3, depth
    )


def test_termination_encoding():
    left, right = TERM_MAX_DEPTH
    assert reached_max_depth(left, right)
    assert not is_divergent_termination(left, right)
    assert is_divergent_termination(jnp.int32(4), jnp.int32(4))
    assert is_turning_termination(jnp.int32(2), jnp.int32(5))
