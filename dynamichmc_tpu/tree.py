"""Sampler-agnostic trajectory-tree algebra, as an iterative XLA loop.

This is the TPU re-derivation of /root/reference/src/trees.jl (L2): the
recursive ``adjacent_tree`` (trees.jl:231-262) and doubling driver
``sample_trajectory`` (trees.jl:283-319) become bounded ``lax.while_loop``s
with a fixed-size merge stack, so the whole transition jit-compiles and vmaps
over thousands of chains.

Algorithm equivalence
---------------------
The reference recursion is depth-first, left-to-right. Visiting the 2^depth
leaves of an adjacent tree in traversal order and merging pending subtrees
whenever the (0-based) leaf counter ``n`` has trailing one-bits reproduces the
recursion's merge points *exactly*: after leaf ``n``, merge levels
``0..trailing_ones(n)-1``, each merge combining the pending subtree stored at
that level with the current node. At most one pending subtree per level exists
at any time, so the "stack" is an array indexed by level (max_depth slots).

All reference semantics are preserved:

- early exit on first divergence / first turning subtree, *keeping* visited
  statistics from invalid subtrees (trees.jl:247-250, 294);
- the three-way generalized U-turn check at every merge, applied in
  trajectory-time order (combine(tau_earlier, tau_later), swapped when moving
  backward, trees.jl:135-141);
- biased progressive sampling: within an adjacent tree, unbiased
  (logprob2 = w2 - logaddexp(w1, w2)); at a doubling, biased (w2 - w1)
  (trees.jl:143-161);
- the proposal from a doubling that *turns* is still kept — the reference
  combines proposals and increments depth before the merged-tree turn check
  (trees.jl:310-316);
- termination bookkeeping as an ``InvalidTree``-style (left, right) pair of
  positions relative to the start (trees.jl:180-202), normalized so that
  turning always has left < right.

The algebra is generic over a ``TrajectoryOps`` bundle of callables, mirroring
the seven-operation interface of trees.jl:45-121, so the driver is unit-tested
against a dummy integer trajectory with exhaustively enumerated direction
masks (detailed balance), exactly like test/test_trees.jl:171-262.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .utils.pytree import tree_select_level, tree_update_level, tree_where

MAX_DIRECTIONS_DEPTH = 32
"""Direction bits per transition; one uint32 draw (trees.jl:10,19-23)."""

MAX_TREE_DEPTH_BOUND = 30
"""Largest permitted ``max_depth``. The drivers track leaf counters and
signed position indices in int32: indices span ``[-2^depth, +2^depth]`` and
the adjacent-tree leaf count is ``1 << depth`` with ``depth`` up to
``max_depth - 1``, so depth 31 overflows (``1 << 31`` wraps negative and the
leaf loop silently no-ops, fabricating an all-zeros subtree). 30 keeps every
counter in range. Deliberate deviation from the reference's bound of 32
(trees.jl:10) — 2^30 leapfrog steps per transition is already far beyond any
practical budget, and the reference's own Int64 counters are the only reason
its bound is higher."""


class TreeNoise(NamedTuple):
    """Injectable randomness for exact cross-driver equivalence gates.

    The production drivers draw two kinds of randomness inside the tree loop:
    a per-leaf Gumbel (the running-argmax multinomial proposal) and a
    per-doubling Exponential (the biased progressive accept). Injecting both
    makes a transition fully deterministic given (p, directions), so the
    batch-native and wavefront drivers can be pinned EXACTLY (not just
    distributionally) against the per-chain fast driver — which is itself
    pinned to the generic oracle that carries the detailed-balance proof
    (tests/test_trees.py; cf. /root/reference/test/test_trees.jl:171-262).

    gumbel : (max_depth, 2**(max_depth-1), ...) indexed [doubling, leaf]
    expo   : (max_depth, ...) indexed [doubling]

    Trailing dims: none for the per-chain driver, (C,) for the batched ones.
    ``None`` (the default everywhere) keeps the production RNG stream and
    adds zero ops to the traced program.
    """

    gumbel: jnp.ndarray
    expo: jnp.ndarray


def make_tree_noise(rng, max_depth: int, n_transitions: int, C: int = 0,
                    dtype=jnp.float64):
    """Draw a (T, ...) stack of TreeNoise from a numpy RandomState; helper for
    the equivalence tests (per-chain when C == 0, batched otherwise)."""
    L = 1 << (max_depth - 1)
    shape_tail = () if C == 0 else (C,)
    g = rng.gumbel(size=(n_transitions, max_depth, L) + shape_tail)
    e = rng.exponential(size=(n_transitions, max_depth) + shape_tail)
    return TreeNoise(
        gumbel=jnp.asarray(g, dtype), expo=jnp.asarray(e, dtype)
    )


def next_direction(flags: jnp.ndarray):
    """Pop the next doubling direction bit (trees.jl:31-34)."""
    flags = flags.astype(jnp.uint32)
    return (flags & jnp.uint32(1)) == jnp.uint32(1), flags >> jnp.uint32(1)


def random_directions(key: jax.Array) -> jnp.ndarray:
    """Draw 32 direction bits with one RNG call (trees.jl:23)."""
    return jax.random.bits(key, shape=(), dtype=jnp.uint32)


# --- termination descriptions -------------------------------------------------
#
# Encoded as an int32 (left, right) pair, mirroring InvalidTree
# (trees.jl:180-202):
#   left == 1, right == 0   sentinel: reached max depth, no invalid tree
#   left == right           divergence at that position
#   left < right            turning over positions left:right

# numpy scalars (not jnp): creating a device array at import time would
# initialize the XLA backend, which breaks jax.distributed.initialize()
# ordering for multi-process users of this library
TERM_MAX_DEPTH = (np.int32(1), np.int32(0))


def is_divergent_termination(left, right):
    return left == right


def reached_max_depth(left, right):
    return (left == 1) & (right == 0)


def is_turning_termination(left, right):
    return ~is_divergent_termination(left, right) & ~reached_max_depth(left, right)


def normalize_termination(left, right):
    """Canonicalize a turning span to ``left <= right`` (the reference can
    emit reversed pairs for backward turning), keeping the divergence and
    max-depth-sentinel encodings intact. Shared by all three drivers —
    the encoding must stay byte-identical across them for the cross-driver
    equivalence gates."""
    is_sentinel = reached_max_depth(left, right)
    lo = jnp.where(is_sentinel, left, jnp.minimum(left, right))
    hi = jnp.where(is_sentinel, right, jnp.maximum(left, right))
    return lo, hi


@dataclasses.dataclass(frozen=True)
class TrajectoryOps:
    """The seven-operation trajectory interface (trees.jl:45-121), TPU edition.

    All callables take/return fixed-shape pytrees and must be traceable.

    move(z, is_forward) -> z'
        One integrator step in the given (traced bool) direction.
    leaf(z, is_initial: static bool) -> (zeta, omega, tau, divergent, v)
        Leaf information: proposal, log weight, turn statistic, a traced
        divergence flag (replaces the reference's ``nothing``), and visited
        statistics. Divergent leaves must still return placeholder
        zeta/omega/tau of the correct structure.
    combine_turn(tau_earlier, tau_later) -> (tau, turning)
        Merge turn statistics of two adjacent subtrees given in
        *trajectory-time* order; ``turning`` is a traced bool (replaces the
        reference's ``nothing`` return, NUTS.jl:132-139).
    calculate_logprob2(is_doubling: static bool, w1, w2, w) -> logprob2
        Log probability of selecting the second subtree (trees.jl:94,159-161).
    combine_proposals(key, zeta1, zeta2, logprob2, is_forward) -> zeta
        Combine proposals; zeta1 precedes zeta2 in traversal order
        (trees.jl:97-104).
    combine_visited(v1, v2) -> v
        Commutative merge of visited statistics (trees.jl:73-78).
    visited_identity(v) -> v0
        Identity element for combine_visited (the reference encodes this as
        the initial leaf's statistic, NUTS.jl:78-80).
    """

    move: Callable
    leaf: Callable
    combine_turn: Callable
    calculate_logprob2: Callable
    combine_proposals: Callable
    combine_visited: Callable
    visited_identity: Callable


def _combine_turn_in_direction(ops: TrajectoryOps, tau_first, tau_second, is_forward):
    """Merge turn stats where ``tau_first`` precedes ``tau_second`` in
    *traversal* order; swaps into trajectory-time order when moving backward
    (trees.jl:135-141)."""
    tau_a = tree_where(is_forward, tau_first, tau_second)
    tau_b = tree_where(is_forward, tau_second, tau_first)
    return ops.combine_turn(tau_a, tau_b)


def _combine_proposals_and_logweights(
    ops: TrajectoryOps, key, zeta1, zeta2, w1, w2, is_forward, is_doubling
):
    """trees.jl:143-149."""
    w = jnp.logaddexp(w1, w2)
    logprob2 = ops.calculate_logprob2(is_doubling, w1, w2, w)
    zeta = ops.combine_proposals(key, zeta1, zeta2, logprob2, is_forward)
    return zeta, w


def biased_progressive_logprob2(bias: bool, w1, w2, w=None):
    """trees.jl:159-161. ``bias`` may be a static Python bool or traced."""
    if w is None:
        w = jnp.logaddexp(w1, w2)
    return w2 - jnp.where(jnp.asarray(bias), w1, w)


class _AdjacentResult(NamedTuple):
    valid: Any
    left: Any  # invalid-tree positions when not valid
    right: Any
    zeta: Any
    omega: Any
    tau: Any
    z_end: Any
    i_end: Any
    v: Any


def _adjacent_tree(ops: TrajectoryOps, key, z, i, depth, is_forward, max_depth: int):
    """Iterative re-derivation of the recursive adjacent_tree (trees.jl:231-262).

    ``depth`` is traced (the current doubling level); ``max_depth`` is static
    and bounds the merge stack. Returns an ``_AdjacentResult``.
    """
    # Template leaf for shapes (cheap: evaluated lazily by tracing only).
    zeta_t, omega_t, tau_t, _, v_t = ops.leaf(z, False)
    node_t = (zeta_t, omega_t, tau_t)
    stack0 = jax.tree_util.tree_map(
        lambda x: jnp.zeros((max_depth + 1,) + jnp.shape(x), jnp.result_type(x)), node_t
    )

    step = jnp.where(is_forward, jnp.int32(1), jnp.int32(-1))
    n_leaves = jnp.int32(1) << depth

    def merge_pending(n, key, stack, node, i_start):
        """Merge the new ``node`` with pending subtrees for every trailing
        one-bit of ``n``. Returns (node, level, turned, turn_left)."""

        def mcond(carry):
            _node, level, turned, _tl = carry
            pending = ((n >> level) & jnp.int32(1)) == jnp.int32(1)
            return pending & ~turned

        def mbody(carry):
            node, level, _turned, _tl = carry
            zeta2, w2, tau2 = node
            popped = tree_select_level(stack, level, max_depth + 1)
            zeta1, w1, tau1 = popped
            tau_c, turning = _combine_turn_in_direction(ops, tau1, tau2, is_forward)
            # First leaf position of the merged subtree of size 2^(level+1)
            # ending at leaf n: leaves a..n with a = n - 2^(level+1) + 1; leaf j
            # sits at position i_start + step*(j+1). The reference reports
            # InvalidTree(entry+dir, last) = (i_start + step*(a+1), i_new)
            # (trees.jl:255 via the recursion's i', i+).
            a = n - (jnp.int32(1) << (level + 1)) + jnp.int32(1)
            turn_left = i_start + step * (a + jnp.int32(1))
            mkey = jax.random.fold_in(key, level)
            zeta_c, w_c = _combine_proposals_and_logweights(
                ops, mkey, zeta1, zeta2, w1, w2, is_forward, False
            )
            merged = (zeta_c, w_c, tau_c)
            new_node = tree_where(turning, node, merged)
            return (new_node, level + jnp.int32(1), turning, turn_left)

        return jax.lax.while_loop(
            mcond, mbody, (node, jnp.int32(0), jnp.asarray(False), jnp.int32(0))
        )

    def cond(carry):
        return (carry["n"] < n_leaves) & carry["valid"]

    def body(carry):
        key, kleaf = jax.random.split(carry["key"])
        z_new = ops.move(carry["z"], is_forward)
        i_new = carry["i"] + step
        zeta_l, omega_l, tau_l, divergent, v_l = ops.leaf(z_new, False)
        v = ops.combine_visited(carry["v"], v_l)

        node, level, turned, turn_left = merge_pending(
            carry["n"], kleaf, carry["stack"], (zeta_l, omega_l, tau_l), i
        )
        # Guard: a divergent leaf never merges (the reference returns before
        # merging, trees.jl:236-237). The merge above ran unconditionally for
        # SPMD-friendliness; discard its result on divergence.
        invalid = divergent | (turned & ~divergent)
        left = jnp.where(divergent, i_new, turn_left)
        right = i_new

        stack = tree_update_level(carry["stack"], level, node, max_depth + 1)
        res = tree_where(carry["valid"] & ~invalid, node, carry["result"])

        return {
            "n": carry["n"] + jnp.int32(1),
            "z": z_new,
            "i": i_new,
            "v": v,
            "stack": stack,
            "result": res,
            "valid": carry["valid"] & ~invalid,
            "left": jnp.where(invalid, left, carry["left"]),
            "right": jnp.where(invalid, right, carry["right"]),
            "key": key,
        }

    init = {
        "n": jnp.int32(0),
        "z": z,
        "i": jnp.asarray(i, jnp.int32),
        "v": ops.visited_identity(v_t),
        "stack": stack0,
        "result": jax.tree_util.tree_map(
            lambda x: jnp.zeros(jnp.shape(x), jnp.result_type(x)), node_t
        ),
        "valid": jnp.asarray(True),
        "left": jnp.int32(0),
        "right": jnp.int32(0),
        "key": key,
    }
    out = jax.lax.while_loop(cond, body, init)
    zeta, omega, tau = out["result"]
    return _AdjacentResult(
        valid=out["valid"],
        left=out["left"],
        right=out["right"],
        zeta=zeta,
        omega=omega,
        tau=tau,
        z_end=out["z"],
        i_end=out["i"],
        v=out["v"],
    )


class TrajectoryResult(NamedTuple):
    zeta: Any  # proposal
    v: Any  # visited statistics
    term_left: Any  # termination description, see module docstring
    term_right: Any
    depth: Any  # int32 tree depth


def sample_trajectory(
    ops: TrajectoryOps, key, z, max_depth: int, directions
) -> TrajectoryResult:
    """Doubling driver: iterative re-derivation of trees.jl:283-319.

    ``max_depth`` is static (bounds both loops and the merge stack);
    ``directions`` is a uint32 of pre-drawn direction bits.
    """
    if not 0 < max_depth <= MAX_TREE_DEPTH_BOUND:
        raise ValueError(f"max_depth must be in 1..{MAX_TREE_DEPTH_BOUND}")

    zeta0, omega0, tau0, _div0, v0 = ops.leaf(z, True)

    def cond(carry):
        return (carry["depth"] < max_depth) & ~carry["terminated"]

    def body(carry):
        key, kadj, kdouble = jax.random.split(carry["key"], 3)
        is_forward, dirs = next_direction(carry["directions"])
        z_edge = tree_where(is_forward, carry["z_plus"], carry["z_minus"])
        i_edge = jnp.where(is_forward, carry["i_plus"], carry["i_minus"])

        adj = _adjacent_tree(
            ops, kadj, z_edge, i_edge, carry["depth"], is_forward, max_depth
        )
        v = ops.combine_visited(carry["v"], adj.v)

        # Invalid adjacent tree: stop, no doubling (trees.jl:297).
        invalid = ~adj.valid

        # Valid: update edges, combine proposals (biased), then check the
        # merged tree for turning (trees.jl:300-316).
        z_plus = tree_where(adj.valid & is_forward, adj.z_end, carry["z_plus"])
        i_plus = jnp.where(adj.valid & is_forward, adj.i_end, carry["i_plus"])
        z_minus = tree_where(adj.valid & ~is_forward, adj.z_end, carry["z_minus"])
        i_minus = jnp.where(adj.valid & ~is_forward, adj.i_end, carry["i_minus"])

        zeta_c, omega_c = _combine_proposals_and_logweights(
            ops, kdouble, carry["zeta"], adj.zeta, carry["omega"], adj.omega,
            is_forward, True,
        )
        zeta = tree_where(adj.valid, zeta_c, carry["zeta"])
        omega = jnp.where(adj.valid, omega_c, carry["omega"])
        depth = carry["depth"] + jnp.where(adj.valid, jnp.int32(1), jnp.int32(0))

        tau_c, turning = _combine_turn_in_direction(
            ops, carry["tau"], adj.tau, is_forward
        )
        turning = adj.valid & turning
        tau = tree_where(adj.valid & ~turning, tau_c, carry["tau"])

        terminated = invalid | turning
        term_left = jnp.where(
            invalid, adj.left, jnp.where(turning, i_minus, carry["term_left"])
        )
        term_right = jnp.where(
            invalid, adj.right, jnp.where(turning, i_plus, carry["term_right"])
        )

        return {
            "z_minus": z_minus,
            "z_plus": z_plus,
            "i_minus": i_minus,
            "i_plus": i_plus,
            "zeta": zeta,
            "omega": omega,
            "tau": tau,
            "v": v,
            "depth": depth,
            "terminated": terminated,
            "term_left": term_left,
            "term_right": term_right,
            "directions": dirs,
            "key": key,
        }

    init = {
        "z_minus": z,
        "z_plus": z,
        "i_minus": jnp.int32(0),
        "i_plus": jnp.int32(0),
        "zeta": zeta0,
        "omega": omega0,
        "tau": tau0,
        "v": v0,
        "depth": jnp.int32(0),
        "terminated": jnp.asarray(False),
        "term_left": TERM_MAX_DEPTH[0],
        "term_right": TERM_MAX_DEPTH[1],
        "directions": jnp.asarray(directions, jnp.uint32),
        "key": key,
    }
    out = jax.lax.while_loop(cond, body, init)

    lo, hi = normalize_termination(out["term_left"], out["term_right"])
    return TrajectoryResult(
        zeta=out["zeta"], v=out["v"], term_left=lo, term_right=hi, depth=out["depth"]
    )


# --- fast multinomial driver ----------------------------------------------------
#
# Within one adjacent tree, the reference's unbiased progressive sampling
# (logprob2 = w2 - logaddexp(w1, w2) at every merge, trees.jl:143-161) is
# EXACTLY multinomial sampling over the tree's leaves with weights exp(Delta):
# by induction, each merge preserves P(leaf i) = exp(w_i) / sum exp(w).
# A multinomial over a stream of leaves can be drawn with a running
# Gumbel-argmax (score_i = Delta_i + Gumbel_i; keep the argmax), so proposals
# never need to flow through the merge stack at all. The stack then holds
# ONLY turn statistics — (p_minus, p_plus, rho), three vectors per level
# instead of a full phase point + five-vector statistic — which cuts the
# dominant HBM traffic of the batched tree loop by ~3x. The biased combine at
# each *doubling* (logprob2 = w2 - w1, trees.jl:159-161) remains an explicit
# Bernoulli between the old tree's proposal and the new subtree's, so the
# overall proposal distribution is exactly the reference's.
#
# The generic driver above remains the semantics oracle (and the detailed-
# balance test vehicle); the fast driver is validated against it
# distributionally (tests/test_fast_driver.py).


@dataclasses.dataclass(frozen=True)
class FastTrajectoryOps:
    """Trajectory interface for the multinomial fast driver.

    leaf(z, is_initial) -> (delta, tau, divergent, v, payload)
        ``delta`` is the leaf's log weight; ``payload`` is the (small) value
        returned as the proposal (e.g. position + cached log density /
        gradient + joint density).
    """

    move: Callable
    leaf: Callable
    combine_turn: Callable
    combine_visited: Callable
    visited_identity: Callable


def _adjacent_tree_fast(
    ops: FastTrajectoryOps, key, z, i, depth, is_forward, max_depth: int,
    noise: TreeNoise | None = None,
):
    """Adjacent tree with tau-only merge stack and running Gumbel-argmax
    proposal selection. Same traversal, early-exit and turn-check points as
    ``_adjacent_tree``. ``noise`` (tests only) replaces the per-leaf Gumbel
    with ``noise.gumbel[depth, n]``."""
    delta_t, tau_t, _, v_t, payload_t = ops.leaf(z, False)
    # merge levels reach at most depth <= max_depth - 1, and the completed
    # tree is stored at slot == depth, so max_depth slots suffice.
    n_slots = max_depth
    stack0 = jax.tree_util.tree_map(
        lambda x: jnp.zeros((n_slots,) + jnp.shape(x), jnp.result_type(x)),
        tau_t,
    )
    step = jnp.where(is_forward, jnp.int32(1), jnp.int32(-1))
    n_leaves = jnp.int32(1) << depth
    neg_inf = jnp.asarray(-jnp.inf, jnp.result_type(delta_t))

    def merge_pending(n, stack, tau, i_start):
        def mcond(carry):
            _tau, level, turned, _tl = carry
            pending = ((n >> level) & jnp.int32(1)) == jnp.int32(1)
            return pending & ~turned

        def mbody(carry):
            tau, level, _turned, _tl = carry
            tau1 = tree_select_level(stack, level, n_slots)
            tau_c, turning = _combine_turn_in_direction(ops, tau1, tau, is_forward)
            a = n - (jnp.int32(1) << (level + 1)) + jnp.int32(1)
            turn_left = i_start + step * (a + jnp.int32(1))
            new_tau = tree_where(turning, tau, tau_c)
            return (new_tau, level + jnp.int32(1), turning, turn_left)

        return jax.lax.while_loop(
            mcond, mbody, (tau, jnp.int32(0), jnp.asarray(False), jnp.int32(0))
        )

    def cond(carry):
        return (carry["n"] < n_leaves) & carry["valid"]

    i0 = jnp.asarray(i, jnp.int32)

    def body(carry):
        # per-leaf key via fold_in(adjacent-tree key, leaf counter): cheaper
        # than splitting a carried key every iteration
        kleaf = jax.random.fold_in(key, carry["n"])
        z_new = ops.move(carry["z"], is_forward)
        i_new = i0 + step * (carry["n"] + jnp.int32(1))
        delta, tau_l, divergent, v_l, payload = ops.leaf(z_new, False)
        v = ops.combine_visited(carry["v"], v_l)

        # running multinomial draw over non-divergent leaves
        if noise is None:
            g = jax.random.gumbel(kleaf, (), delta.dtype)
        else:
            g = noise.gumbel[depth, carry["n"]].astype(delta.dtype)
        score = jnp.where(divergent, neg_inf, delta + g)
        take = score > carry["best_score"]
        best_score = jnp.where(take, score, carry["best_score"])
        best_payload = tree_where(take, payload, carry["best_payload"])
        omega = jnp.logaddexp(carry["omega"], jnp.where(divergent, neg_inf, delta))

        tau, level, turned, turn_left = merge_pending(
            carry["n"], carry["stack"], tau_l, i0
        )
        invalid = divergent | (turned & ~divergent)
        left = jnp.where(divergent, i_new, turn_left)

        stack = tree_update_level(carry["stack"], level, tau, n_slots)

        return {
            "n": carry["n"] + jnp.int32(1),
            "z": z_new,
            "v": v,
            "stack": stack,
            "omega": omega,
            "best_score": best_score,
            "best_payload": best_payload,
            "valid": carry["valid"] & ~invalid,
            "left": jnp.where(invalid, left, carry["left"]),
            "right": jnp.where(invalid, i_new, carry["right"]),
        }

    init = {
        "n": jnp.int32(0),
        "z": z,
        "v": ops.visited_identity(v_t),
        "stack": stack0,
        "omega": neg_inf,
        "best_score": neg_inf,
        "best_payload": jax.tree_util.tree_map(
            lambda x: jnp.zeros(jnp.shape(x), jnp.result_type(x)), payload_t
        ),
        "valid": jnp.asarray(True),
        "left": jnp.int32(0),
        "right": jnp.int32(0),
    }
    out = jax.lax.while_loop(cond, body, init)
    # the completed tree's turn statistic sits at slot == depth (the final
    # leaf 2^depth - 1 has exactly `depth` trailing ones): one dynamic read
    # at exit instead of a per-leaf select in the carry.
    out["tau_result"] = tree_select_level(
        out["stack"], jnp.minimum(depth, n_slots - 1), n_slots
    )
    out["i"] = i0 + step * out["n"]
    return out


def sample_trajectory_fast(
    ops: FastTrajectoryOps, key, z, max_depth: int, directions,
    noise: TreeNoise | None = None,
) -> TrajectoryResult:
    """Doubling driver over the fast adjacent tree. Semantics identical to
    :func:`sample_trajectory` for multinomial-within / biased-at-doubling
    proposal sampling (the NUTS configuration). ``noise`` (tests only) makes
    the transition fully deterministic — see :class:`TreeNoise`."""
    if not 0 < max_depth <= MAX_TREE_DEPTH_BOUND:
        raise ValueError(f"max_depth must be in 1..{MAX_TREE_DEPTH_BOUND}")

    delta0, tau0, _div0, v0, payload0 = ops.leaf(z, True)

    def cond(carry):
        return (carry["depth"] < max_depth) & ~carry["terminated"]

    def body(carry):
        key, kadj, kdouble = jax.random.split(carry["key"], 3)
        is_forward, dirs = next_direction(carry["directions"])
        z_edge = tree_where(is_forward, carry["z_plus"], carry["z_minus"])
        i_edge = jnp.where(is_forward, carry["i_plus"], carry["i_minus"])

        adj = _adjacent_tree_fast(
            ops, kadj, z_edge, i_edge, carry["depth"], is_forward, max_depth,
            noise,
        )
        v = ops.combine_visited(carry["v"], adj["v"])
        valid = adj["valid"]
        invalid = ~valid

        z_plus = tree_where(valid & is_forward, adj["z"], carry["z_plus"])
        i_plus = jnp.where(valid & is_forward, adj["i"], carry["i_plus"])
        z_minus = tree_where(valid & ~is_forward, adj["z"], carry["z_minus"])
        i_minus = jnp.where(valid & ~is_forward, adj["i"], carry["i_minus"])

        # biased progressive combine at the doubling (trees.jl:159-161):
        # accept the new subtree's proposal with prob exp(w_new - w_old)
        lp2 = adj["omega"] - carry["omega"]
        if noise is None:
            e_dbl = jax.random.exponential(kdouble)
        else:
            e_dbl = noise.expo[carry["depth"]].astype(lp2.dtype)
        accept = (lp2 >= 0) | (e_dbl > -lp2)
        payload = tree_where(valid & accept, adj["best_payload"], carry["payload"])
        omega = jnp.where(valid, jnp.logaddexp(carry["omega"], adj["omega"]),
                          carry["omega"])
        depth = carry["depth"] + jnp.where(valid, jnp.int32(1), jnp.int32(0))

        tau_c, turning = _combine_turn_in_direction(
            ops, carry["tau"], adj["tau_result"], is_forward
        )
        turning = valid & turning
        tau = tree_where(valid & ~turning, tau_c, carry["tau"])

        terminated = invalid | turning
        term_left = jnp.where(
            invalid, adj["left"], jnp.where(turning, i_minus, carry["term_left"])
        )
        term_right = jnp.where(
            invalid, adj["right"], jnp.where(turning, i_plus, carry["term_right"])
        )

        return {
            "z_minus": z_minus,
            "z_plus": z_plus,
            "i_minus": i_minus,
            "i_plus": i_plus,
            "payload": payload,
            "omega": omega,
            "tau": tau,
            "v": v,
            "depth": depth,
            "terminated": terminated,
            "term_left": term_left,
            "term_right": term_right,
            "directions": dirs,
            "key": key,
        }

    init = {
        "z_minus": z,
        "z_plus": z,
        "i_minus": jnp.int32(0),
        "i_plus": jnp.int32(0),
        "payload": payload0,
        "omega": delta0,
        "tau": tau0,
        "v": v0,
        "depth": jnp.int32(0),
        "terminated": jnp.asarray(False),
        "term_left": TERM_MAX_DEPTH[0],
        "term_right": TERM_MAX_DEPTH[1],
        "directions": jnp.asarray(directions, jnp.uint32),
        "key": key,
    }
    out = jax.lax.while_loop(cond, body, init)
    lo, hi = normalize_termination(out["term_left"], out["term_right"])
    return TrajectoryResult(
        zeta=out["payload"], v=out["v"], term_left=lo, term_right=hi,
        depth=out["depth"],
    )
