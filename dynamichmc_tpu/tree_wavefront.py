"""Aligned wavefront driver: desynchronized NUTS warmup without stragglers.

The synchronized batch-native driver (tree_batched.py) advances all chains
through the SAME transition in lockstep, so every transition costs the whole
batch the maximum tree size over all chains. Measured on the headline config
(4096 chains, 100-d correlated Gaussian): 86-95% of warmup leaf slots are
spent on already-terminated lanes — the expected max depth over 4096 i.i.d.
chains is pinned at ``max_depth`` whenever ANY chain legitimately needs it.

This driver removes the transition-level barrier: each lane runs its own
transition lifecycle inside ONE while_loop over a global leaf counter ``g``
(restart -> adjacent trees -> doubling -> completion), so a lane that
terminates immediately begins its next transition while others keep building.

The key trick is **aligned starts**, which keep the merge stack on the
scalar-indexed fast path (per-lane dynamic stack indexing lowers to
gather/scatter — measured catastrophic on TPU):

    A lane may start a depth-d adjacent tree only at global counters
    g ≡ 0 (mod 2^d).

Then a lane's internal leaf index n = g - g0 satisfies n ≡ g (mod 2^d), so
its trailing-ones merge run is exactly levels 0..min(TO(g), d)-1 — a PREFIX
of the global counter's own trailing-ones sequence. One scalar level loop
serves every lane: reads/writes of stack[level] use scalar dynamic indexing
with per-lane participation masks. Two properties make the waits cheap:

  - a depth-0 tree needs no alignment (every transition restarts instantly);
  - finishing an aligned depth-d tree lands at g0 + 2^d, which is 2^(d+1)-
    aligned half the time (binary-counter property), so successive doublings
    wait between 0 and 2^d slots — expected total overhead ≈ 50% of useful
    work, versus the ~10-20x lockstep straggler tax this replaces.

Scope: built for WARMUP stages (dual-averaging + Welford folds at transition
completion; no per-draw position recording). Sampling keeps the synchronized
driver, whose post-adaptation trees are shallow and homogeneous.

Semantics per transition are identical to tree_batched.py (multinomial
Gumbel-argmax proposals, biased doubling, 3-way generalized U-turn,
-inf poisoning); the RNG stream differs (draws are indexed by the global
counter), which is the same caveat the batch-native driver already carries
(draw streams depend on batch size). Cf. /root/reference/src/trees.jl:283-319
for the recursive semantics being reproduced.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .hamiltonian import EvaluatedPoint
from .logdensity import LogDensity
from .metric import Metric
from .nuts import NUTS, AcceptanceStatistic, acceptance_rate
from .tree_batched import (
    _Edge,
    _leapfrog_b,
    _where_edge,
    make_tau_ops,
    psharp_b,
    rand_p_b,
)
from .utils.welford import WelfordState


class WavefrontNoise(NamedTuple):
    """Injectable randomness for the wavefront exact-equivalence gate
    (tests only; ``None`` keeps the production RNG stream and adds zero ops).

    Indexed by each lane's OWN counters — transition t, doubling d, leaf
    n = g - tree_g0 — so a wavefront run can be pinned exactly against the
    synchronized drivers fed the same per-transition draws:

    p      : (T, C, K)  momentum at the restart of transition t
    dirs   : (T, C)     direction bits of transition t
    gumbel : (T, max_depth, 2**(max_depth-1), C)
    expo   : (T, max_depth, C)
    """

    p: jnp.ndarray
    dirs: jnp.ndarray
    gumbel: jnp.ndarray
    expo: jnp.ndarray


def _trailing_ones(g):
    """Number of trailing one-bits of a scalar int32 (0 for even g)."""
    x = jnp.asarray(g, jnp.uint32)
    flipped = ~x & (x + 1)  # isolates lowest zero bit: 2^TO(g)
    # log2 via float exponent (exact for powers of two < 2^24)
    return jnp.asarray(
        jnp.round(jnp.log2(flipped.astype(jnp.float32))), jnp.int32
    )


def welford_update_masked(state: WelfordState, x, mask):
    """Per-chain Welford update applied only to ``mask`` lanes."""
    count = state.count + mask.astype(state.count.dtype)
    delta = x - state.mean
    mean = state.mean + jnp.where(
        mask[..., None], delta / jnp.maximum(count, 1)[..., None], 0
    )
    delta2 = x - mean
    if state.m2.ndim == 3:
        upd = jnp.einsum("ci,cj->cij", delta, delta2)
        m2 = state.m2 + jnp.where(mask[:, None, None], upd, 0)
    else:
        m2 = state.m2 + jnp.where(mask[:, None], delta * delta2, 0)
    return WelfordState(count=count, mean=mean, m2=m2)


def welford_update_pooled_masked(state: WelfordState, x, mask):
    """Shared (Chan parallel) Welford update over the ``mask`` subset of a
    chain batch: exact two-sample combine with the masked rows as sample B."""
    dtype = x.dtype
    m = jnp.sum(mask.astype(dtype))
    safe_m = jnp.maximum(m, 1)
    xm = jnp.where(mask[:, None], x, 0)
    batch_mean = jnp.sum(xm, axis=0) / safe_m
    xc = jnp.where(mask[:, None], x - batch_mean, 0)
    count_new = state.count + m
    delta = batch_mean - state.mean
    mean = state.mean + (m / jnp.maximum(count_new, 1)) * delta
    corr = state.count * m / jnp.maximum(count_new, 1)
    if state.m2.ndim == 2:
        m2 = state.m2 + xc.T @ xc + corr * jnp.outer(delta, delta)
    else:
        m2 = state.m2 + jnp.sum(xc * xc, axis=0) + corr * delta * delta
    none = m == 0
    return WelfordState(
        count=jnp.where(none, state.count, count_new),
        mean=jnp.where(none, state.mean, mean),
        m2=jnp.where(none, state.m2, m2),
    )


# Wavefront carry layout, shared with the shard_map spec builder below.
# "g" is the global slot counter: a scalar on one device; under a mesh each
# device advances its OWN counter (that independence IS the group-per-device
# win — no cross-device depth/completion sync at all).
_CARRY_KEYS = (
    "g", "t", "need_restart", "waiting", "building",
    "da", "wf", "acc_sum", "div", "steps_total", "maxd",
    "acc_ep_sum", "acc_ep_n",
    "Q", "eps_l", "dirs", "pi0", "d", "is_fwd", "z_minus", "z_plus",
    "prop_q", "prop_ld", "prop_grad", "omega", "tau", "log_sum", "steps_tr",
    "tree_g0", "z", "stack", "omega_adj", "best_score", "best_q", "best_ld",
    "best_grad", "lsum_adj", "steps_adj",
)


def wavefront_carry_specs(P, chain_axis, pooled_eps: bool = False):
    """``shard_map`` partition-spec prefix tree for the wavefront carry.

    Every per-chain leaf shards its leading (C) axis; the (S, C, K) merge
    stacks shard axis 1; the per-device slot counter "g" is carried as a
    (n_devices,) array (one element per shard).

    ``pooled_eps=False`` (per-chain adaptation): the epochal accumulators
    stay replicated (inert) and "da" is per-lane. ``pooled_eps=True``
    (shared stepsize): "da" is ONE replicated state — the epoch-lockstep
    driver keeps it identical across devices via a psum at every aligned
    epoch boundary — and the epoch accumulators become per-device partial
    sums, carried as (n_devices,) arrays like "g"."""
    specs = {k: P(chain_axis) for k in _CARRY_KEYS}
    specs["stack"] = P(None, chain_axis)
    if pooled_eps:
        specs["da"] = P()
        specs["acc_ep_sum"] = P(chain_axis)
        specs["acc_ep_n"] = P(chain_axis)
    else:
        specs["acc_ep_sum"] = P()
        specs["acc_ep_n"] = P()
    return specs


def wavefront_init(
    Q: EvaluatedPoint, metric: Metric, da_state, welford, max_depth: int
):
    """Fresh per-stage wavefront carry: every lane flagged for restart."""
    C, K = Q.q.shape
    dtype = Q.q.dtype
    tau_len = make_tau_ops(metric).tau_len
    S = max_depth
    zeros = jnp.zeros((C,), dtype)
    zeros_i = jnp.zeros((C,), jnp.int32)
    false = jnp.zeros((C,), bool)
    zK = jnp.zeros((C, K), dtype)
    edge = _Edge(q=Q.q, p=zK, grad=Q.grad, ld=Q.logdensity)
    carry = {
        "g": jnp.int32(0),
        "t": zeros_i,
        "need_restart": jnp.ones((C,), bool),
        "waiting": false,
        "building": false,
        # adaptation folds + stage totals
        "da": da_state,
        "wf": welford,
        "acc_sum": zeros,
        "div": zeros_i,
        "steps_total": zeros_i,
        "maxd": zeros_i,
        # epochal pooled-eps accumulators (scalars; unused per-chain)
        "acc_ep_sum": jnp.zeros((), dtype),
        "acc_ep_n": jnp.zeros((), dtype),
        # transition state
        "Q": Q,
        "eps_l": zeros,
        "dirs": jnp.zeros((C,), jnp.uint32),
        "pi0": zeros,
        "d": zeros_i,
        "is_fwd": false,
        "z_minus": edge,
        "z_plus": edge,
        "prop_q": Q.q,
        "prop_ld": Q.logdensity,
        "prop_grad": Q.grad,
        "omega": zeros,
        "tau": tuple(zK for _ in range(tau_len)),
        "log_sum": jnp.full((C,), -jnp.inf, dtype),
        "steps_tr": zeros_i,
        # adjacent-tree state
        "tree_g0": zeros_i,
        "z": edge,
        "stack": tuple(jnp.zeros((S, C, K), dtype) for _ in range(tau_len)),
        "omega_adj": zeros,
        "best_score": zeros,
        "best_q": zK,
        "best_ld": zeros,
        "best_grad": zK,
        "lsum_adj": zeros,
        "steps_adj": zeros_i,
    }
    assert set(carry) == set(_CARRY_KEYS)  # keep the spec builder in sync
    return carry


def make_wavefront_stage_driver(
    ld: LogDensity,
    algorithm: NUTS,
    adaptation,
    pooled_welford: bool = False,
    use_welford: bool = True,
    pooled_eps: bool = False,
    epoch: int = 16,
    noise: WavefrontNoise | None = None,
    mesh_axis: str | None = None,
):
    """Resumable wavefront tuning-stage program.

    (key, metric, carry, n_steps, g_stop) -> (carry', all_done)

    Runs global iterations until every lane has completed ``n_steps``
    transitions or the counter reaches ``g_stop`` (the host's watchdog-safe
    dispatch budget). Step keys derive from fold_in(key, g), so chunked
    dispatches of the same stage are bitwise reproducible.

    ``pooled_eps=True`` (PooledStepsize adaptation) makes the wavefront
    compatible with a SHARED stepsize: a per-transition batch-mean update is
    impossible when lanes complete asynchronously, so completed-transition
    acceptances accumulate and ONE pooled dual-averaging update fires every
    ``epoch`` global slots (with the epoch-mean acceptance — still a nearly
    noise-free signal at fleet scale). Every transition runs at the eps it
    captured when it started, so each lane remains a valid NUTS chain; the
    update cadence only changes the adaptation trajectory, which pooled
    adaptation is robust to. Epoch boundaries key off the global counter,
    so host chunking stays bitwise reproducible.

    ``mesh_axis`` (with ``pooled_eps``): the named mesh axis to pool the
    epochal acceptance signal over. The slot loop is then restructured into
    an epoch-LOCKSTEP outer loop — devices run their divergent slot loops
    only within an epoch, and the shared dual-averaging update fires from
    psum'd accumulators at aligned global-counter boundaries, outside the
    divergent inner loop (collectives must run in lockstep). Per-chain
    adaptation (``pooled_eps=False``) never communicates and ignores this.
    """
    if algorithm.turn_statistic_configuration != "generalized":
        raise NotImplementedError(
            "the wavefront driver supports only the generalized turn statistic"
        )
    max_depth = algorithm.max_depth
    S = max_depth

    if use_welford:
        wf_update = (
            welford_update_pooled_masked if pooled_welford else welford_update_masked
        )
    else:
        def wf_update(wf, _x, _mask):
            return wf

    def stage(key, metric: Metric, carry, n_steps, g_stop, depth_limit=None,
              tail_steps=None):
        """``depth_limit`` (optional runtime scalar): cap doublings below the
        static ``max_depth`` for every transition of this stage — the warmup
        depth clamp (tree_batched.sample_tree_batched semantics; <= 0 means
        unclamped). Each capped transition is still a valid NUTS kernel.

        ``tail_steps`` (optional runtime scalar): when >= 0, the clamp
        applies only to each lane's FIRST ``tail_steps`` transitions of this
        stage (its per-lane step counter ``t``); later transitions run
        unclamped. This is the monolithic driver's DA-restart tail clamp
        (WarmupSchedule.depth_clamp_tail) expressed per lane — the lane's
        ``t`` is frozen for the whole transition (it increments at
        completion), so the limit never changes mid-tree. ``None`` or < 0 =
        clamp the whole stage (the pre-round-4 behavior)."""
        if depth_limit is None:
            dl = jnp.int32(max_depth)
        else:
            dl_in = jnp.asarray(depth_limit, jnp.int32)
            dl = jnp.where(
                dl_in <= 0,
                jnp.int32(max_depth),
                jnp.minimum(dl_in, max_depth),
            )
        ops = make_tau_ops(metric)
        tau_len = ops.tau_len
        combine_dir = ops.combine_dir
        pi_and_psharp = ops.pi_and_psharp
        leaf_tau = ops.leaf_tau

        C, K = carry["Q"].q.shape
        dtype = carry["Q"].q.dtype
        neg_inf = jnp.asarray(-jnp.inf, dtype)
        min_delta = jnp.asarray(algorithm.min_delta, dtype)

        def cond(c):
            return (c["g"] < g_stop) & jnp.any(c["t"] < n_steps)

        def body(c):
            g = c["g"]
            kit = jax.random.fold_in(key, g)
            k_norm, k_dir, k_gum, k_exp = jax.random.split(kit, 4)
            lane_live = c["t"] < n_steps

            # --- A: restarts — begin a fresh transition at the current Q ---
            restart = c["need_restart"] & lane_live
            if noise is None:
                p0 = rand_p_b(k_norm, metric, (C, K), dtype)
                dirs_new = jax.random.bits(k_dir, (C,), jnp.uint32)
            else:
                lane = jnp.arange(C)
                p0 = jax.vmap(lambda t, i: noise.p[t, i])(
                    c["t"], lane
                ).astype(dtype)
                dirs_new = jax.vmap(lambda t, i: noise.dirs[t, i])(
                    c["t"], lane
                )
            pi0_new, sp0 = pi_and_psharp(c["Q"].logdensity, p0)
            sp0 = p0 if sp0 is None else sp0
            eps_new = adaptation.current(c["da"])

            r = restart
            rc = r[:, None]
            pi0 = jnp.where(r, pi0_new, c["pi0"])
            dirs = jnp.where(r, dirs_new, c["dirs"])
            eps_l = jnp.where(r, jnp.asarray(eps_new, dtype), c["eps_l"])
            z0 = _Edge(q=c["Q"].q, p=p0, grad=c["Q"].grad, ld=c["Q"].logdensity)
            z_minus = _where_edge(r, z0, c["z_minus"])
            z_plus = _where_edge(r, z0, c["z_plus"])
            prop_q = jnp.where(rc, c["Q"].q, c["prop_q"])
            prop_ld = jnp.where(r, c["Q"].logdensity, c["prop_ld"])
            prop_grad = jnp.where(rc, c["Q"].grad, c["prop_grad"])
            omega = jnp.where(r, 0.0, c["omega"])
            tau0 = leaf_tau(p0, sp0)
            tau = tuple(
                jnp.where(rc, new, old) for old, new in zip(c["tau"], tau0)
            )
            log_sum = jnp.where(r, neg_inf, c["log_sum"])
            steps_tr = jnp.where(r, 0, c["steps_tr"])
            d = jnp.where(r, 0, c["d"])
            waiting = c["waiting"] | restart

            # --- B: aligned tree starts ------------------------------------
            aligned = (g & ((jnp.int32(1) << d) - 1)) == 0
            start = waiting & lane_live & aligned
            sc = start[:, None]
            is_fwd_new = ((dirs >> d.astype(jnp.uint32)) & jnp.uint32(1)) == 1
            is_fwd = jnp.where(start, is_fwd_new, c["is_fwd"])
            edge = _where_edge(is_fwd, z_plus, z_minus)
            z = _where_edge(start, edge, c["z"])
            tree_g0 = jnp.where(start, g, c["tree_g0"])
            omega_adj = jnp.where(start, neg_inf, c["omega_adj"])
            best_score = jnp.where(start, neg_inf, c["best_score"])
            lsum_adj = jnp.where(start, neg_inf, c["lsum_adj"])
            steps_adj = jnp.where(start, 0, c["steps_adj"])
            building = (c["building"] | start) & lane_live
            waiting = waiting & ~start

            # --- C: one leaf step for all building lanes ---------------------
            eps_signed = jnp.where(is_fwd, eps_l, -eps_l)
            if ld.fused_leaf_batched_fn is not None:
                qn, pn, gn, ldn, pi = ld.fused_leaf_batched_fn(
                    metric, z.q, z.p, z.grad, eps_signed
                )
                z_new = _Edge(q=qn, p=pn, grad=gn, ld=ldn)
                sp = psharp_b(metric, z_new.p) if tau_len == 5 else z_new.p
            else:
                z_new = _leapfrog_b(ld, metric, z, eps_signed)
                pi, sp = pi_and_psharp(z_new.ld, z_new.p)
                sp = z_new.p if sp is None else sp
            z = _where_edge(building, z_new, z)
            delta = pi - pi0
            divergent = building & (delta < min_delta)
            v_log = jnp.where(building, jnp.minimum(delta, 0.0), neg_inf)
            lsum_adj = jnp.logaddexp(lsum_adj, v_log)
            steps_adj = steps_adj + building.astype(jnp.int32)

            if noise is None:
                gum = jax.random.gumbel(k_gum, (C,), dtype)
            else:
                lane = jnp.arange(C)
                gum = jax.vmap(
                    lambda t, dd, nn, i: noise.gumbel[t, dd, nn, i]
                )(c["t"], d, g - tree_g0, lane).astype(dtype)
            score = jnp.where(divergent | ~building, neg_inf, delta + gum)
            take = score > best_score
            tk = take[:, None]
            best_score = jnp.where(take, score, best_score)
            best_q = jnp.where(tk, z_new.q, c["best_q"])
            best_ld = jnp.where(take, z_new.ld, c["best_ld"])
            best_grad = jnp.where(tk, z_new.grad, c["best_grad"])
            omega_adj = jnp.logaddexp(
                omega_adj, jnp.where(divergent | ~building, neg_inf, delta)
            )

            # --- D: scalar-level merge run ----------------------------------
            # aligned starts guarantee every lane's merge levels are a prefix
            # of the global counter's trailing ones: k_l = min(TO(g), d_l)
            to_g = _trailing_ones(g)
            k_l = jnp.minimum(to_g, d)
            node = leaf_tau(z_new.p, sp)
            turned = jnp.zeros((C,), bool)

            def mcond(m):
                return m[1] <= jnp.minimum(to_g, jnp.int32(S - 1))

            def mbody(m):
                node, level, turned, stack = m
                rows = tuple(
                    jax.lax.dynamic_index_in_dim(s, level, 0, keepdims=False)
                    for s in stack
                )
                merged, turning = combine_dir(rows, node, is_fwd)
                do_merge = building & (level < k_l)
                first_turn = do_merge & turning & ~turned
                turned = turned | first_turn
                node = tuple(
                    jnp.where((do_merge & ~turned | first_turn)[:, None], mg, nd)
                    for nd, mg in zip(node, merged)
                )
                # lanes whose merge run stops here park the node at this level
                do_push = building & (k_l == level) & (level < d)
                stack = tuple(
                    jax.lax.dynamic_update_index_in_dim(
                        s, jnp.where(do_push[:, None], nd, row), level, 0
                    )
                    for s, nd, row in zip(stack, node, rows)
                )
                return (node, level + 1, turned, stack)

            node, _lvl, turned, stack = jax.lax.while_loop(
                mcond, mbody, (node, jnp.int32(0), turned, c["stack"])
            )

            # --- E: completions ----------------------------------------------
            invalid = building & (divergent | turned)
            tree_done = building & (k_l == d) & ~invalid
            building = building & ~(invalid | tree_done)

            # fold the adjacent tree's visited stats into the transition
            log_sum = jnp.where(
                invalid | tree_done, jnp.logaddexp(log_sum, lsum_adj), log_sum
            )
            steps_tr = jnp.where(
                invalid | tree_done, steps_tr + steps_adj, steps_tr
            )
            lsum_adj = jnp.where((invalid | tree_done), neg_inf, lsum_adj)
            steps_adj = jnp.where(invalid | tree_done, 0, steps_adj)

            # doubling combine for completed valid trees
            fwd_done = tree_done & is_fwd
            bwd_done = tree_done & ~is_fwd
            z_plus = _where_edge(fwd_done, z_new, z_plus)
            z_minus = _where_edge(bwd_done, z_new, z_minus)

            lp2 = omega_adj - omega
            if noise is None:
                e_dbl = jax.random.exponential(k_exp, (C,), dtype)
            else:
                lane = jnp.arange(C)
                e_dbl = jax.vmap(lambda t, dd, i: noise.expo[t, dd, i])(
                    c["t"], d, lane
                ).astype(dtype)
            accept = (lp2 >= 0) | (e_dbl > -lp2)
            take2 = (tree_done & accept)[:, None]
            prop_q = jnp.where(take2, best_q, prop_q)
            prop_ld = jnp.where(tree_done & accept, best_ld, prop_ld)
            prop_grad = jnp.where(take2, best_grad, prop_grad)
            omega = jnp.where(tree_done, jnp.logaddexp(omega, omega_adj), omega)

            tau_c, turning_tr = combine_dir(tau, node, is_fwd)
            turning_tr = tree_done & turning_tr
            keep = (tree_done & ~turning_tr)[:, None]
            tau = tuple(
                jnp.where(keep, new, old) for old, new in zip(tau, tau_c)
            )
            d = jnp.where(tree_done, d + 1, d)
            if tail_steps is None:
                dl_eff = dl
            else:
                ts = jnp.asarray(tail_steps, jnp.int32)
                dl_eff = jnp.where(
                    (ts < 0) | (c["t"] < ts), dl, jnp.int32(max_depth)
                )
            hit_max = tree_done & ~turning_tr & (d >= dl_eff)

            tr_done = invalid | turning_tr | hit_max
            waiting = waiting | (tree_done & ~turning_tr & ~hit_max)

            # --- F: transition bookkeeping at completion ---------------------
            acc_rate = acceptance_rate(AcceptanceStatistic(log_sum, steps_tr))
            if pooled_eps:
                # SHARED eps: accumulate completed transitions' acceptance;
                # one pooled DA update per epoch of global slots. Under a
                # mesh the update moves OUT of the (device-divergent) slot
                # body to the epoch-lockstep outer loop below, where the
                # cross-device psum is legal; the body only accumulates.
                acc_ep_sum = c["acc_ep_sum"] + jnp.sum(
                    jnp.where(tr_done, acc_rate, 0.0)
                )
                acc_ep_n = c["acc_ep_n"] + jnp.sum(tr_done.astype(dtype))
                if mesh_axis is None:
                    at_epoch = ((g + 1) % jnp.int32(epoch)) == 0

                    def ep_update(args):
                        da_in, ssum, n = args
                        da_out = adaptation.update(
                            da_in, ssum / jnp.maximum(n, 1.0)
                        )
                        return da_out, jnp.zeros_like(ssum), jnp.zeros_like(n)

                    da, acc_ep_sum, acc_ep_n = jax.lax.cond(
                        at_epoch & (acc_ep_n > 0),
                        ep_update,
                        lambda args: args,
                        (c["da"], acc_ep_sum, acc_ep_n),
                    )
                else:
                    da = c["da"]
            else:
                acc_ep_sum = c["acc_ep_sum"]
                acc_ep_n = c["acc_ep_n"]
                da_new = adaptation.update(c["da"], acc_rate)
                da = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(
                        jnp.reshape(
                            tr_done, tr_done.shape + (1,) * (new.ndim - 1)
                        ),
                        new,
                        old,
                    ),
                    da_new,
                    c["da"],
                )
            Q_new = EvaluatedPoint(q=prop_q, logdensity=prop_ld, grad=prop_grad)
            Q = EvaluatedPoint(
                q=jnp.where(tr_done[:, None], prop_q, c["Q"].q),
                logdensity=jnp.where(tr_done, prop_ld, c["Q"].logdensity),
                grad=jnp.where(tr_done[:, None], prop_grad, c["Q"].grad),
            )
            wf = wf_update(c["wf"], Q.q, tr_done)
            acc_sum = c["acc_sum"] + jnp.where(tr_done, acc_rate, 0)
            div = c["div"] + (invalid & divergent).astype(jnp.int32)
            steps_total = c["steps_total"] + jnp.where(tr_done, steps_tr, 0)
            maxd = c["maxd"] + hit_max.astype(jnp.int32)
            t = c["t"] + tr_done.astype(jnp.int32)

            return {
                "g": g + 1,
                "t": t,
                "need_restart": (c["need_restart"] & ~restart) | tr_done,
                "waiting": waiting,
                "building": building,
                "da": da,
                "wf": wf,
                "acc_sum": acc_sum,
                "div": div,
                "steps_total": steps_total,
                "maxd": maxd,
                "acc_ep_sum": acc_ep_sum,
                "acc_ep_n": acc_ep_n,
                "Q": Q,
                "eps_l": eps_l,
                "dirs": dirs,
                "pi0": pi0,
                "d": d,
                "is_fwd": is_fwd,
                "z_minus": z_minus,
                "z_plus": z_plus,
                "prop_q": prop_q,
                "prop_ld": prop_ld,
                "prop_grad": prop_grad,
                "omega": omega,
                "tau": tau,
                "log_sum": log_sum,
                "steps_tr": steps_tr,
                "tree_g0": tree_g0,
                "z": z,
                "stack": stack,
                "omega_adj": omega_adj,
                "best_score": best_score,
                "best_q": best_q,
                "best_ld": best_ld,
                "best_grad": best_grad,
                "lsum_adj": lsum_adj,
                "steps_adj": steps_adj,
            }

        if not (pooled_eps and mesh_axis is not None):
            out = jax.lax.while_loop(cond, body, carry)
            all_done = jnp.all(out["t"] >= n_steps)
            return out, all_done

        # --- pooled eps under a mesh: epoch-lockstep outer loop ------------
        # Collectives must execute in lockstep, so the device-divergent slot
        # loop is bounded by ABSOLUTE epoch boundaries of the global counter
        # (every device starts the stage at g=0, so g stays uniform across
        # devices by construction): inner while advances lanes to the next
        # multiple of ``epoch``, then ONE psum pools the acceptance
        # accumulators and a single shared dual-averaging update fires —
        # outside the divergent loop, identically on every device. The DA
        # update keys off absolute g, so host chunking (any g_stop) stays
        # bitwise reproducible; a dispatch that ends mid-epoch just carries
        # the partial accumulators forward. A device whose lanes are all
        # done skips its slots (lane state is untouched either way) but
        # keeps participating in the boundary collectives until every
        # device's lanes finish.
        def outer_cond(s):
            c, gdone = s
            return (c["g"] < g_stop) & ~gdone

        def outer_body(s):
            c, _ = s
            epoch_end = jnp.minimum(
                (c["g"] // jnp.int32(epoch) + 1) * jnp.int32(epoch), g_stop
            )

            def inner_cond(cc):
                return (cc["g"] < epoch_end) & jnp.any(cc["t"] < n_steps)

            c = jax.lax.while_loop(inner_cond, body, c)
            # skipping slots is exact for a finished device: the body is a
            # no-op on dead lanes and unused RNG draws consume nothing
            c = dict(c, g=epoch_end)
            at_epoch = (c["g"] % jnp.int32(epoch)) == 0
            ssum = jax.lax.psum(c["acc_ep_sum"], mesh_axis)
            n = jax.lax.psum(c["acc_ep_n"], mesh_axis)

            def ep_update(args):
                da_in, _ssum, _n = args
                da_out = adaptation.update(da_in, ssum / jnp.maximum(n, 1.0))
                return da_out, jnp.zeros_like(_ssum), jnp.zeros_like(_n)

            da, acc_ep_sum, acc_ep_n = jax.lax.cond(
                at_epoch & (n > 0),
                ep_update,
                lambda args: args,
                (c["da"], c["acc_ep_sum"], c["acc_ep_n"]),
            )
            c = dict(c, da=da, acc_ep_sum=acc_ep_sum, acc_ep_n=acc_ep_n)
            live = jnp.any(c["t"] < n_steps)
            gdone = jax.lax.psum(live.astype(jnp.int32), mesh_axis) == 0
            return c, gdone

        live0 = jnp.any(carry["t"] < n_steps)
        gdone0 = jax.lax.psum(live0.astype(jnp.int32), mesh_axis) == 0
        out, _ = jax.lax.while_loop(outer_cond, outer_body, (carry, gdone0))
        all_done = jnp.all(out["t"] >= n_steps)
        return out, all_done

    return stage
