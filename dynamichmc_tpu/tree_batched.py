"""Batch-native NUTS transition: the speed-of-light driver for chain fleets.

The vmapped per-chain drivers (tree.py) pay two structural taxes on TPU:
(1) loop counters become per-lane values, so the merge stack must be indexed
with per-lane levels — batched gather/scatter (catastrophic) or masked
rebuilds of every level (the current fallback, still the dominant HBM
traffic); (2) vmap's while_loop batching rule selects over the ENTIRE carry
every iteration.

This driver instead operates on (C, ...) arrays directly, exploiting an
invariant of the synchronized batched tree walk: all still-active chains
share the same doubling level ``d`` and leaf counter ``n`` (they start
together and advance together; finished chains are masked). Therefore:

- loop bounds and merge levels are true SCALARS: the merge stack is stored
  level-major (S, C, K) and accessed with scalar dynamic_update_slice /
  dynamic_slice — O(C*K) traffic per merge instead of O(S*C*K);
- the merge loop runs exactly trailing_ones(n) iterations with zero
  straggler waste;
- there is no vmap batching rule in the way: only the masks we write exist.

Proposal semantics are identical to the reference (and to tree.py's fast
driver): multinomial-within-adjacent-tree via running Gumbel-argmax, biased
Bernoulli at doublings, three-way generalized U-turn at every merge, -inf
poisoning of numerical faults, InvalidTree-style termination positions.

RNG: one scalar key drives the whole batched transition (per-leaf keys via
fold_in of a global leaf counter; (C,)-shaped draws give per-chain
randomness). This costs one threefry per leaf for ALL chains instead of C,
at the price of draw-stream dependence on the batch size (documented; the
per-chain drivers remain for bitwise single-chain reproducibility).

Measured at 4096 chains x 100-d f32 (TPU v5e, round 2): ~54 us marginal
per-leaf cost + ~0.58 ms fixed per transition (+~90 us per doubling), vs
16 us marginal for a bare leapfrog iteration — see BENCH_NOTES.md for the
cost model, the scratch-threading fix that removed the per-transition
stack materialization, and the measured-and-rejected variants (leaf-pair
unrolling, packed stack layout). End-to-end this driver + the monolithic
warmup carry the 467k ESS/s headline (round 1: 18.5k with the vmapped
generic driver, 129k at round-1 close).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .hamiltonian import EvaluatedPoint
from .logdensity import LogDensity
from .metric import DiagonalMetric, Metric
from .nuts import NUTS, AcceptanceStatistic, TreeStatistics, acceptance_rate
from .tree import normalize_termination

# Profiling-only ablation switches (scripts/profile_leaf.py): members of
# {"merge", "best", "stats"} disable pieces of the leaf body AT TRACE TIME to
# attribute per-leaf cost. Never set in production paths; results are
# statistically wrong with any ablation active.
_ablate: frozenset = frozenset()

# Merge-stack storage mode. "ref" keeps the (S, C, K) stacks in jax.Ref
# buffers mutated in place — they leave BOTH while-loop carries (the inner
# leaf loop and the outer doubling loop), so loop entries stop paying for
# them; carry mode threads them as regular carry arrays (the round-2
# "scratch threading" design). Values computed are identical either way —
# the same slots are written before they are read — so draws are bitwise
# equal (tests/test_ref_stack.py pins this).
_USE_REF_STACK = os.environ.get("DYNHMC_REF_STACK", "0") == "1"


def use_ref_stack() -> bool:
    """Whether engine drivers should allocate the merge stack as jax.Ref
    buffers (DYNHMC_REF_STACK=1) instead of threading carry arrays."""
    return _USE_REF_STACK


def make_tree_stack_refs(algorithm: NUTS, metric: Metric, C: int, K: int,
                         dtype):
    """Allocate the merge stack as in-place jax.Ref buffers. Must be called
    INSIDE the jitted program (refs are program-local state), outside its
    transition loop; pass the result to ``sample_tree_batched(stack_ref=)``.
    One allocation serves every transition of the program — slots are
    written before they are read within each doubling (see the scratch
    safety note on sample_tree_batched)."""
    tau_len = make_tau_ops(metric).tau_len
    S = algorithm.max_depth
    return tuple(
        jax.new_ref(jnp.zeros((S, C, K), dtype)) for _ in range(tau_len)
    )


# --- batched metric helpers (shared or per-chain) -------------------------------


def psharp_b(metric: Metric, p):
    """M^-1 p for p: (C, K); metric arrays shared or batched."""
    m = metric.m_inv
    if isinstance(metric, DiagonalMetric):
        return p * m  # (K,) broadcasts; (C, K) elementwise
    if m.ndim == 2:  # shared dense (K, K), symmetric
        return p @ m
    return jnp.einsum("cij,cj->ci", m, p)


def kinetic_b(metric: Metric, p):
    """0.5 p^T M^-1 p per chain, using the same M^-1 as the dynamics (see
    the consistency note on metric.kinetic_energy)."""
    if isinstance(metric, DiagonalMetric):
        return 0.5 * jnp.sum(metric.m_inv * p * p, axis=-1)
    return 0.5 * jnp.sum(p * psharp_b(metric, p), axis=-1)


def rand_p_b(key, metric: Metric, shape, dtype):
    """p ~ N(0, M) for a (C, K) batch."""
    z = jax.random.normal(key, shape, dtype)
    if isinstance(metric, DiagonalMetric):
        w = metric.w_diag
        return z * w  # (K,) or (C, K)
    w = metric.w
    if w.ndim == 2:
        return z @ w.T
    return jnp.einsum("cij,cj->ci", w, z)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _evaluate_b(ld: LogDensity, q):
    """Batched non-strict evaluation with -inf poisoning (hamiltonian.py
    semantics)."""
    value, grad = jax.vmap(ld.logdensity_and_gradient)(q)
    value = jnp.asarray(value)
    ok = jnp.isfinite(value) & jnp.all(jnp.isfinite(grad), axis=-1)
    value = jnp.where(ok | (value == -jnp.inf), value, -jnp.inf)
    return value, grad


def _joint_b(metric, ld_vals, p):
    k = kinetic_b(metric, p)
    k = jnp.where(jnp.isfinite(k), k, jnp.inf)
    return jnp.where(jnp.isfinite(ld_vals), ld_vals - k, -jnp.inf)


class _Edge(NamedTuple):
    q: jnp.ndarray
    p: jnp.ndarray
    grad: jnp.ndarray
    ld: jnp.ndarray


def _leapfrog_b(ld, metric, edge: _Edge, eps_signed):
    half = 0.5 * eps_signed[:, None]
    p_mid = edge.p + half * edge.grad
    q_new = edge.q + eps_signed[:, None] * psharp_b(metric, p_mid)
    ld_new, g_new = _evaluate_b(ld, q_new)
    p_new = p_mid + half * g_new
    return _Edge(q=q_new, p=p_new, grad=g_new, ld=ld_new)


def _where_edge(c, a: _Edge, b: _Edge) -> _Edge:
    cc = c[:, None]
    return _Edge(
        q=jnp.where(cc, a.q, b.q),
        p=jnp.where(cc, a.p, b.p),
        grad=jnp.where(cc, a.grad, b.grad),
        ld=jnp.where(c, a.ld, b.ld),
    )


class TauOps(NamedTuple):
    """The generalized-turn-statistic algebra for a metric, shared by the
    synchronized batch-native driver and the aligned wavefront driver.

    Dense metrics CARRY psharp (M^-1 p) for the two edge momenta: since
    M^-1 is symmetric, dot(p_edge, M^-1 r) == dot(psharp_edge, r), so every
    merge-time turn check becomes a plain dot — the per-leaf psharp (already
    needed for the kinetic energy) is computed ONCE and reused, cutting
    dense metric applications from ~5 to 2 per leaf (the per-chain dense
    (C, K, K) read is the hot loop's dominant HBM traffic). Diagonal
    metrics keep the compact 3-vector statistic (psharp is elementwise;
    the two extra stack arrays would cost more than they save).
    """

    tau_len: int  # 3 (compact) or 5 (psharp-carrying)
    pi_and_psharp: callable  # (ld_vals, p) -> (joint logdensity, psharp|None)
    leaf_tau: callable  # (p, sp) -> tau tuple
    combine_dir: callable  # (tau_first, tau_second, is_fwd) -> (tau, turning)


def make_tau_ops(metric: Metric) -> TauOps:
    carry_psharp = not isinstance(metric, DiagonalMetric)
    tau_len = 5 if carry_psharp else 3

    def pi_and_psharp(ld_vals, p):
        """Joint log density; for psharp-carrying metrics also M^-1 p."""
        if carry_psharp:
            sp = psharp_b(metric, p)
            k = 0.5 * jnp.sum(p * sp, axis=-1)
        else:
            sp = None
            k = kinetic_b(metric, p)
        k = jnp.where(jnp.isfinite(k), k, jnp.inf)
        return jnp.where(jnp.isfinite(ld_vals), ld_vals - k, -jnp.inf), sp

    def leaf_tau(p, sp):
        if carry_psharp:
            return (p, p, p, sp, sp)
        return (p, p, p)

    def turn_checks(pm_x, pp_x, rho_x, pm_y, pp_y, rho_y, sp_x, sp_y):
        """Three-way generalized U-turn (NUTS.jl:132-139) in trajectory-time
        order (x earlier); psharp folded into the dots (diagonal) or carried
        (dense). sp_x = (psharp_minus_x, psharp_plus_x), likewise sp_y."""
        r1 = rho_x + pm_y
        r2 = pp_x + rho_y
        rho = rho_x + rho_y
        if carry_psharp:
            spm_x, spp_x = sp_x
            spm_y, spp_y = sp_y
            t1 = (_dot(spm_x, r1) < 0) | (_dot(spm_y, r1) < 0)
            t2 = (_dot(spp_x, r2) < 0) | (_dot(spp_y, r2) < 0)
            t3 = (_dot(spm_x, rho) < 0) | (_dot(spp_y, rho) < 0)
        else:
            mr1 = psharp_b(metric, r1)
            t1 = (_dot(pm_x, mr1) < 0) | (_dot(pm_y, mr1) < 0)
            mr2 = psharp_b(metric, r2)
            t2 = (_dot(pp_x, mr2) < 0) | (_dot(pp_y, mr2) < 0)
            mrho = psharp_b(metric, rho)
            t3 = (_dot(pm_x, mrho) < 0) | (_dot(pp_y, mrho) < 0)
        return rho, t1 | t2 | t3

    def combine_dir(tau_first, tau_second, is_fwd):
        """tau = (p_minus, p_plus, rho[, psharp_minus, psharp_plus]); first
        precedes second in traversal order; swap into time order per lane
        when moving backward."""
        f = is_fwd[:, None]
        x = tuple(jnp.where(f, a, b) for a, b in zip(tau_first, tau_second))
        y = tuple(jnp.where(f, b, a) for a, b in zip(tau_first, tau_second))
        if carry_psharp:
            pm_x, pp_x, rho_x, spm_x, spp_x = x
            pm_y, pp_y, rho_y, spm_y, spp_y = y
            rho, turning = turn_checks(
                pm_x, pp_x, rho_x, pm_y, pp_y, rho_y,
                (spm_x, spp_x), (spm_y, spp_y),
            )
            return (pm_x, pp_y, rho, spm_x, spp_y), turning
        pm_x, pp_x, rho_x = x
        pm_y, pp_y, rho_y = y
        rho, turning = turn_checks(
            pm_x, pp_x, rho_x, pm_y, pp_y, rho_y, None, None
        )
        return (pm_x, pp_y, rho), turning

    return TauOps(
        tau_len=tau_len,
        pi_and_psharp=pi_and_psharp,
        leaf_tau=leaf_tau,
        combine_dir=combine_dir,
    )


def _merge_pending(n, stack, node, combine_dir, is_fwd, i_edge, step,
                   start_level, turned, turn_left, is_ref=False):
    """Trailing-ones merge run of the batch-native driver: merge ``node``
    (the just-built leaf/subtree statistic) with the pending subtree at every
    trailing one-bit level of the scalar leaf counter ``n``, freezing a lane's
    node once it turned, then park the result at its (scalar) slot with an
    in-place dynamic update. SHARED between the production driver and the
    dummy-trajectory detailed-balance shim (tests/dummy_batched.py) so the
    enumeration proof exercises this exact merge logic.

    ``is_ref``: ``stack`` is a tuple of jax.Ref buffers (make_tree_stack_refs)
    — pops become ref reads and the park becomes an in-place ref write (the
    returned ``stack`` is then the same ref tuple, mutated)."""

    def mcond(mc):
        _node, level, _turned, _tl = mc
        return ((n >> level) & jnp.int32(1)) == jnp.int32(1)

    def mbody(mc):
        node, level, turned, tl = mc
        if is_ref:
            popped = tuple(s[level] for s in stack)
        else:
            popped = tuple(
                jax.lax.dynamic_index_in_dim(s, level, 0, keepdims=False)
                for s in stack
            )
        merged, turning = combine_dir(popped, node, is_fwd)
        first_new_turn = turning & ~turned
        a = n - (jnp.int32(1) << (level + 1)) + jnp.int32(1)
        tl = jnp.where(
            first_new_turn, i_edge + step * (a + jnp.int32(1)), tl
        )
        # freeze a lane's node once it turned (its tree is discarded)
        node = tuple(
            jnp.where(turned[:, None], old, new)
            for old, new in zip(node, merged)
        )
        return (node, level + jnp.int32(1), turned | turning, tl)

    node, level, turned, turn_left = jax.lax.while_loop(
        mcond, mbody, (node, start_level, turned, turn_left)
    )
    # store the merged subtree at its (scalar) slot: in-place DUS / ref write
    if is_ref:
        for s, v in zip(stack, node):
            s[level] = v
    else:
        stack = tuple(
            jax.lax.dynamic_update_index_in_dim(s, v, level, 0)
            for s, v in zip(stack, node)
        )
    return node, level, turned, turn_left, stack


def _doubling_bookkeeping(c, adj, engaged, is_fwd, combine_dir):
    """Everything in one doubling step EXCEPT proposal selection: validity,
    visited-statistic accumulation, edge updates, the merged-tree turn check,
    depth, and InvalidTree-style termination positions. SHARED between the
    production driver and the detailed-balance shim (tests/dummy_batched.py).

    Returns the updated carry fields as a dict (the caller merges in its
    proposal fields and loop counters)."""
    tree_done = adj["building"]  # lanes whose adjacent tree completed
    valid = engaged & tree_done
    invalid = engaged & ~tree_done

    log_sum = jnp.logaddexp(c["log_sum"], adj["log_sum"])
    steps = c["steps"] + adj["steps"]
    # straggler instrumentation: leaf SLOTS the whole batch paid for this
    # doubling (the adjacent loop runs while ANY lane builds) — adj["n"]
    # is its executed iteration count
    work = c["work"] + adj["n"]

    fwd_valid = valid & is_fwd
    bwd_valid = valid & ~is_fwd
    z_plus = _where_edge(fwd_valid, adj["z"], c["z_plus"])
    i_plus = jnp.where(fwd_valid, adj["i_end"], c["i_plus"])
    z_minus = _where_edge(bwd_valid, adj["z"], c["z_minus"])
    i_minus = jnp.where(bwd_valid, adj["i_end"], c["i_minus"])

    omega = jnp.where(valid, jnp.logaddexp(c["omega"], adj["omega"]), c["omega"])

    tau_c, turning = combine_dir(c["tau"], adj["tau_tree"], is_fwd)
    turning = valid & turning
    keep = (valid & ~turning)[:, None]
    tau = tuple(
        jnp.where(keep, new, old) for old, new in zip(c["tau"], tau_c)
    )
    depth = c["depth"] + valid.astype(jnp.int32)

    newly_term = invalid | turning
    term_left = jnp.where(
        invalid,
        adj["inv_left"],
        jnp.where(turning, i_minus, c["term_left"]),
    )
    term_right = jnp.where(
        invalid,
        adj["inv_right"],
        jnp.where(turning, i_plus, c["term_right"]),
    )

    return {
        "valid": valid,
        "z_minus": z_minus,
        "z_plus": z_plus,
        "i_minus": i_minus,
        "i_plus": i_plus,
        "omega": omega,
        "tau": tau,
        "log_sum": log_sum,
        "steps": steps,
        "work": work,
        "depth": depth,
        "terminated": c["terminated"] | newly_term,
        "term_left": term_left,
        "term_right": term_right,
    }


def make_tree_scratch(algorithm: NUTS, metric: Metric, C: int, K: int, dtype):
    """Allocate the merge-stack scratch for :func:`sample_tree_batched`.

    Drivers that run many transitions should allocate this ONCE, thread it
    through their loop carry, and pass it via ``scratch=`` — materializing
    the (S, C, K) zero stacks inside every transition measured ~160 us at
    4096x100 (5 x 16 MB HBM broadcasts), ~10% of a shallow transition."""
    tau_len = make_tau_ops(metric).tau_len
    S = algorithm.max_depth
    return tuple(jnp.zeros((S, C, K), dtype) for _ in range(tau_len))


def sample_tree_batched(
    key: jax.Array,
    algorithm: NUTS,
    ld: LogDensity,
    metric: Metric,
    Q: EvaluatedPoint,  # batched: q (C, K), logdensity (C,), grad (C, K)
    eps,  # (C,) or scalar
    directions: Optional[jnp.ndarray] = None,  # (C,) uint32
    scratch=None,  # make_tree_scratch buffer, threaded through driver carries
    p: Optional[jnp.ndarray] = None,  # (C, K) injectable momenta (tests)
    noise=None,  # tree.TreeNoise with (C,)-tailed arrays (tests)
    depth_limit=None,  # runtime doubling cap <= max_depth (warmup clamp)
    stack_ref=None,  # make_tree_stack_refs buffers: in-place merge stack
):
    """One NUTS transition for a whole chain batch. Returns (Q', stats), or
    (Q', stats, scratch') when ``scratch`` is given (thread scratch' back
    into the next call — contents are meaningless between transitions; the
    return exists so enclosing while/scan carries can alias the buffer).

    ``stack_ref`` (exclusive with ``scratch``): the merge stack as a tuple
    of jax.Ref buffers (:func:`make_tree_stack_refs`), written IN PLACE —
    the (S, C, K) stacks then ride neither while-loop carry, so the
    per-doubling inner-loop entry and the per-transition outer-loop entry
    stop paying for them. Same values, same slot discipline, bitwise-equal
    draws (tests/test_ref_stack.py); returns (Q', stats) with the refs
    mutated.

    ``depth_limit`` (optional, runtime scalar) caps the number of doublings
    below the static ``max_depth`` — the warmup depth clamp: early-warmup
    trees on an unadapted metric legitimately hit max depth and pin the
    whole lockstep batch; capping them during metric-tuning blocks trades
    per-transition tail exploration (termination reads "max depth") for a
    large cut in lockstep straggler slots. Every cap is a valid NUTS
    kernel; the clamp only changes the ADAPTATION trajectory.

    Scratch safety: every stack slot is written before it is read within a
    doubling (slot ``l`` is stored by the merge at leaf ``2^l - 1``-pattern
    counters before the first pop touches it, and leaf 0 always stores slot
    0), so stale contents from earlier transitions are never observed."""
    if algorithm.turn_statistic_configuration != "generalized":
        raise NotImplementedError(
            "the batch-native driver supports only the generalized turn "
            "statistic; use sample_tree(fast=False) for custom statistics"
        )
    ref_mode = stack_ref is not None
    if ref_mode and scratch is not None:
        raise ValueError("pass either scratch= or stack_ref=, not both")
    if (
        ld.tree_transition_fn is not None
        and p is None and directions is None and noise is None
        and not ref_mode and not _ablate
    ):
        # whole-transition Pallas kernel (ops/pallas_tree.py): the hook
        # declines (returns None) at trace time outside its regime, and the
        # scratch threads through untouched — the kernel keeps its tree
        # state in VMEM instead
        out = ld.tree_transition_fn(key, algorithm, metric, Q, eps,
                                    depth_limit)
        if out is not None:
            Q_new, stats = out
            if scratch is not None:
                return Q_new, stats, scratch
            return Q_new, stats
    C, K = Q.q.shape
    dtype = Q.q.dtype
    max_depth = algorithm.max_depth
    S = max_depth  # merge-stack slots (levels 0..max_depth-1)
    if depth_limit is None:
        d_cap = jnp.int32(max_depth)
    else:
        # <= 0 means UNCLAMPED — the same runtime-operand convention the
        # wavefront driver documents (tree_wavefront.py, engine.py's
        # dl_block=0); without this, a 0 would silently disable every
        # doubling and freeze the whole fleet at the initial point
        dl = jnp.asarray(depth_limit, jnp.int32)
        d_cap = jnp.where(dl <= 0, jnp.int32(max_depth),
                          jnp.minimum(dl, max_depth))

    k_p, k_dir, k_tree = jax.random.split(key, 3)
    p0 = rand_p_b(k_p, metric, (C, K), dtype) if p is None else jnp.asarray(p, dtype)
    if directions is None:
        directions = jax.random.bits(k_dir, (C,), jnp.uint32)
    eps = jnp.broadcast_to(jnp.asarray(eps, dtype), (C,))
    min_delta = jnp.asarray(algorithm.min_delta, dtype)
    neg_inf = jnp.asarray(-jnp.inf, dtype)

    ops = make_tau_ops(metric)
    tau_len = ops.tau_len
    carry_psharp = tau_len == 5
    _pi_and_psharp = ops.pi_and_psharp
    leaf_tau = ops.leaf_tau
    combine_dir = ops.combine_dir

    pi0, sp0 = _pi_and_psharp(Q.logdensity, p0)
    z0 = _Edge(q=Q.q, p=p0, grad=Q.grad, ld=Q.logdensity)

    def adjacent(carry_key, d, z_edge: _Edge, i_edge, is_fwd, engaged, stack):
        """Build the depth-d adjacent trees for all engaged lanes.

        ``stack`` is the level-major (S, C, K) merge stack — p_minus, p_plus,
        rho [, psharp_minus, psharp_plus] — allocated ONCE per transition and
        reused across doublings: every slot is written (by a merge or the
        level-0 store) before it is read, so stale data from earlier
        doublings is never observed, and skipping the re-zeroing saves
        tau_len*S*C*K of HBM writes per doubling (~82 MB at the headline
        config — measured as the dominant per-transition cost)."""
        step = jnp.where(is_fwd, jnp.int32(1), jnp.int32(-1))
        n_leaves = jnp.int32(1) << d
        eps_signed = jnp.where(is_fwd, eps, -eps)

        def cond(c):
            return (c["n"] < n_leaves) & jnp.any(c["building"] & engaged)

        def process_leaf(c):
            """One leaf at counter c["n"]: leapfrog + leaf statistics +
            Gumbel proposal update + the dynamic trailing-ones merge run.
            (Counter-parity merge variants — static even/odd specializations
            — were built for the pair-unrolling experiment and removed with
            it; see the loop-structure note below.)"""
            kleaf = jax.random.fold_in(carry_key, c["n"])
            if ld.fused_leaf_batched_fn is not None:
                qn, pn, gn, ldn, pi = ld.fused_leaf_batched_fn(
                    metric, c["z"].q, c["z"].p, c["z"].grad, eps_signed
                )
                z = _Edge(q=qn, p=pn, grad=gn, ld=ldn)
                sp = psharp_b(metric, z.p) if carry_psharp else None
            else:
                z = _leapfrog_b(ld, metric, c["z"], eps_signed)
                pi, sp = _pi_and_psharp(z.ld, z.p)
            i_new = i_edge + step * (c["n"] + jnp.int32(1))
            delta = pi - pi0
            divergent = delta < min_delta
            live = c["building"] & engaged

            # visited statistics (all visited leaves count, NUTS.jl:59-80)
            if "stats" not in _ablate:
                v_log = jnp.where(live, jnp.minimum(delta, 0.0), neg_inf)
                log_sum = jnp.logaddexp(c["log_sum"], v_log)
                steps = c["steps"] + (live).astype(jnp.int32)
            else:
                log_sum, steps = c["log_sum"], c["steps"] + 1

            # running multinomial proposal draw
            if "best" not in _ablate:
                if noise is None:
                    g = jax.random.gumbel(kleaf, (C,), dtype)
                else:
                    g = noise.gumbel[d, c["n"]].astype(dtype)
                score = jnp.where(divergent | ~live, neg_inf, delta + g)
                take = score > c["best_score"]
                best_score = jnp.where(take, score, c["best_score"])
                tk = take[:, None]
                best_q = jnp.where(tk, z.q, c["best_q"])
                best_ld = jnp.where(take, z.ld, c["best_ld"])
                best_grad = jnp.where(tk, z.grad, c["best_grad"])
                best_pi = jnp.where(take, pi, c["best_pi"])
                omega = jnp.logaddexp(
                    c["omega"], jnp.where(divergent | ~live, neg_inf, delta)
                )
            else:
                best_score, best_q = c["best_score"], c["best_q"]
                best_ld, best_grad = c["best_ld"], c["best_grad"]
                best_pi, omega = c["best_pi"], c["omega"]

            # merge pending subtrees: scalar trailing-one levels of n
            node = leaf_tau(z.p, sp)
            turned = jnp.zeros((C,), bool)
            turn_left = jnp.zeros((C,), jnp.int32)

            if "merge" in _ablate:
                if ref_mode:
                    for s, v in zip(stack_ref, node):
                        s[0] = v
                    stack = None
                else:
                    stack = tuple(
                        jax.lax.dynamic_update_index_in_dim(s, v, 0, 0)
                        for s, v in zip(c["stack"], node)
                    )
            else:
                node, level, turned, turn_left, stack = _merge_pending(
                    c["n"], stack_ref if ref_mode else c["stack"], node,
                    combine_dir, is_fwd, i_edge,
                    step, jnp.int32(0), turned, turn_left, is_ref=ref_mode,
                )

            invalid = live & (divergent | turned)
            left = jnp.where(divergent, i_new, turn_left)
            new_c = {
                "n": c["n"] + jnp.int32(1),
                "z": z,
                "building": c["building"] & ~(divergent | turned),
                "log_sum": log_sum,
                "steps": steps,
                "omega": omega,
                "best_score": best_score,
                "best_q": best_q,
                "best_ld": best_ld,
                "best_grad": best_grad,
                "best_pi": best_pi,
                "inv_left": jnp.where(invalid, left, c["inv_left"]),
                "inv_right": jnp.where(invalid, i_new, c["inv_right"]),
            }
            if not ref_mode:
                new_c["stack"] = stack
            return new_c

        init = {
            "n": jnp.int32(0),
            "z": z_edge,
            "building": jnp.ones((C,), bool),
            "log_sum": jnp.full((C,), -jnp.inf, dtype),
            "steps": jnp.zeros((C,), jnp.int32),
            "omega": jnp.full((C,), -jnp.inf, dtype),
            "best_score": jnp.full((C,), -jnp.inf, dtype),
            "best_q": jnp.zeros((C, K), dtype),
            "best_ld": jnp.zeros((C,), dtype),
            "best_grad": jnp.zeros((C, K), dtype),
            "best_pi": jnp.zeros((C,), dtype),
            "inv_left": jnp.zeros((C,), jnp.int32),
            "inv_right": jnp.zeros((C,), jnp.int32),
        }
        if not ref_mode:
            init["stack"] = stack
        # One single-leaf loop. A peeled-leaf-0 + (odd, even)-pair unrolling
        # was built and measured: it DOUBLED per-doubling cost (87 -> 197 us)
        # because each extra while_loop instance pays a large entry cost for
        # the big carry on this runtime — fewer loop INSTANCES beat fewer
        # iterations.
        out = jax.lax.while_loop(cond, process_leaf, init)
        # the completed tree's turn statistic sits at slot == d
        slot = jnp.minimum(d, S - 1)
        if ref_mode:
            tau_tree = tuple(s[slot] for s in stack_ref)
        else:
            tau_tree = tuple(
                jax.lax.dynamic_index_in_dim(s, slot, 0, keepdims=False)
                for s in out["stack"]
            )
        out["tau_tree"] = tau_tree
        out["i_end"] = i_edge + step * out["n"]
        return out

    # --- doubling loop -----------------------------------------------------------

    def cond(c):
        return (c["d"] < d_cap) & jnp.any(~c["terminated"])

    def body(c):
        kadj = jax.random.fold_in(k_tree, 2 * c["d"])
        kdbl = jax.random.fold_in(k_tree, 2 * c["d"] + 1)
        is_fwd = ((c["dirs"] >> c["d"].astype(jnp.uint32)) & jnp.uint32(1)) == 1
        engaged = ~c["terminated"]
        z_edge = _where_edge(is_fwd, c["z_plus"], c["z_minus"])
        i_edge = jnp.where(is_fwd, c["i_plus"], c["i_minus"])

        adj = adjacent(kadj, c["d"], z_edge, i_edge, is_fwd, engaged,
                       None if ref_mode else c["stack"])
        upd = _doubling_bookkeeping(c, adj, engaged, is_fwd, combine_dir)
        valid = upd.pop("valid")

        # biased doubling combine (proposal selection stays driver-specific:
        # the detailed-balance shim replaces it with exact probability
        # vectors; everything in `upd` above is the shared logic)
        lp2 = adj["omega"] - c["omega"]
        if noise is None:
            e_dbl = jax.random.exponential(kdbl, (C,), dtype)
        else:
            e_dbl = noise.expo[c["d"]].astype(dtype)
        accept = (lp2 >= 0) | (e_dbl > -lp2)
        take = (valid & accept)[:, None]
        prop_q = jnp.where(take, adj["best_q"], c["prop_q"])
        prop_ld = jnp.where(valid & accept, adj["best_ld"], c["prop_ld"])
        prop_grad = jnp.where(take, adj["best_grad"], c["prop_grad"])
        prop_pi = jnp.where(valid & accept, adj["best_pi"], c["prop_pi"])

        new_c = {
            "d": c["d"] + jnp.int32(1),
            "dirs": c["dirs"],
            "prop_q": prop_q,
            "prop_ld": prop_ld,
            "prop_grad": prop_grad,
            "prop_pi": prop_pi,
            **upd,
        }
        if not ref_mode:
            new_c["stack"] = adj["stack"]
        return new_c

    init = {
        "d": jnp.int32(0),
        "dirs": directions,
        "z_minus": z0,
        "z_plus": z0,
        "i_minus": jnp.zeros((C,), jnp.int32),
        "i_plus": jnp.zeros((C,), jnp.int32),
        "prop_q": Q.q,
        "prop_ld": Q.logdensity,
        "prop_grad": Q.grad,
        "prop_pi": pi0,
        "omega": jnp.zeros((C,), dtype),
        "tau": leaf_tau(p0, sp0),
        "work": jnp.int32(0),
        "log_sum": jnp.full((C,), -jnp.inf, dtype),
        "steps": jnp.zeros((C,), jnp.int32),
        "depth": jnp.zeros((C,), jnp.int32),
        "terminated": jnp.zeros((C,), bool),
        "term_left": jnp.ones((C,), jnp.int32),
        "term_right": jnp.zeros((C,), jnp.int32),
    }
    if not ref_mode:
        init["stack"] = (
            tuple(jnp.zeros((S, C, K), dtype) for _ in range(tau_len))
            if scratch is None
            else tuple(scratch)
        )
    out = jax.lax.while_loop(cond, body, init)

    return _finish_transition(out, directions, C, scratch)


def _finish_transition(out, directions, C, scratch):
    """Shared epilogue: normalize termination encoding and pack statistics."""
    lo, hi = normalize_termination(out["term_left"], out["term_right"])
    stats = TreeStatistics(
        logdensity=out["prop_pi"],
        depth=out["depth"],
        term_left=lo,
        term_right=hi,
        acceptance_rate=acceptance_rate(
            AcceptanceStatistic(out["log_sum"], out["steps"])
        ),
        steps=out["steps"],
        directions=directions,
        work=jnp.broadcast_to(out["work"], (C,)),
    )
    Q_new = EvaluatedPoint(
        q=out["prop_q"], logdensity=out["prop_ld"], grad=out["prop_grad"]
    )
    if scratch is not None:
        return Q_new, stats, out["stack"]
    return Q_new, stats


# A flat single-loop variant (one while_loop over a scalar (d, n) counter
# pair, with tree-start / tree-completion under lax.cond) was built, pinned
# RNG-stream-identical against this driver, and MEASURED SLOWER on the
# headline config (TPU v5e, 4096x100 dense, eps sweep 0.18-1.4): 0.65-0.77x
# — the per-leaf lax.conds route the full carry and cost ~40 us/leaf, more
# than the ~90 us per-DOUBLING loop entry they eliminate. Removed; the
# depth_limit clamp it introduced lives on in sample_tree_batched above.
# (BENCH_NOTES.md round 3, "flat driver" row.)
