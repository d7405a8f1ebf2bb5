"""Dummy integer trajectory routed through the BATCH-NATIVE driver's logic.

tests/dummy_trajectory.py proves detailed balance for the generic per-chain
driver; this shim does the same for the batch-native driver's load-bearing
logic. It drives the SAME shared helpers the production driver executes —
``tree_batched._merge_pending`` (the scalar trailing-ones merge run with
freeze-on-turn and the in-place stack store) and
``tree_batched._doubling_bookkeeping`` (validity, edge updates, merged-tree
turn check, termination positions) — replacing only the physics leaf (integer
positions, injected turning/divergence ranges like
/root/reference/test/test_trees.jl:28-103) and the sampled proposal:

The production driver draws its proposal by running Gumbel-argmax + a
doubling Bernoulli; those draws are exactly a multinomial within each valid
adjacent tree and a biased progressive combine across doublings, so this shim
carries the EXACT probability vector instead — per-leaf ``logaddexp`` of the
leaf weight at its position (same live/divergence masks as production), and
the doubling's exact mixture ``(1-p2)·old + p2·new_normalized`` with
``p2 = exp(min(omega_adj - omega, 0))``, the same ``lp2`` the production
Bernoulli uses. (The Gumbel-argmax realization itself is pinned by the exact
C=1 equivalence gates in test_equivalence_batched.py.)

The result: exhaustive detailed-balance enumeration over all 2^depth
direction masks runs THROUGH the batch-native merge/termination code, so any
perturbation of that logic fails a proof-grade gate, not a statistical one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dummy_trajectory import OFFSET, SPAN, dummy_logdensity, log1mexp
from dynamichmc_tpu.tree_batched import (
    _doubling_bookkeeping,
    _Edge,
    _merge_pending,
    _where_edge,
)

F = jnp.float64


def _dummy_combine_dir(turning_range):
    """Dummy turn-statistic algebra in the batched combine_dir form:
    tau = (flag, first, last) as (C, 1) arrays; a merged tree is turning iff
    BOTH subtrees are entirely inside the turning range (the reference dummy's
    ``combine_turn``, test_trees.jl:60-66 analogue in dummy_trajectory.py)."""
    t_lo, t_hi = turning_range

    def leaf_tau(pos):
        flag = ((pos >= t_lo) & (pos <= t_hi)).astype(F)
        pf = pos.astype(F)
        return (flag[:, None], pf[:, None], pf[:, None])

    def combine_dir(tau_first, tau_second, is_fwd):
        f = is_fwd[:, None]
        x = tuple(jnp.where(f, a, b) for a, b in zip(tau_first, tau_second))
        y = tuple(jnp.where(f, b, a) for a, b in zip(tau_first, tau_second))
        flag = (x[0] > 0.5) & (y[0] > 0.5)
        combined = (flag.astype(F), x[1], y[2])
        return combined, flag[:, 0]

    return leaf_tau, combine_dir


def dummy_sample_batched(
    z0, directions, max_depth: int, turning=(1, 0), divergent=(1, 0)
):
    """One batched dummy transition; returns the (C, SPAN) log probability
    vector of the proposal over integer positions.

    ``z0``: (C,) int32 start positions; ``directions``: (C,) uint32 masks;
    ``turning`` / ``divergent``: inclusive injected ranges ((1, 0) = empty).
    """
    C = z0.shape[0]
    S = max_depth
    d_lo, d_hi = divergent
    leaf_tau, combine_dir = _dummy_combine_dir(turning)
    neg_inf = jnp.asarray(-jnp.inf, F)
    span_idx = jnp.arange(SPAN)

    def onehot_log(pos, value):
        """(C, SPAN): ``value`` at column pos+OFFSET, -inf elsewhere."""
        hit = span_idx[None, :] == (pos + OFFSET)[:, None]
        return jnp.where(hit, value[:, None], neg_inf)

    def adjacent(d, z_edge: _Edge, i_edge, is_fwd, engaged, stack):
        """Mirror of the production ``adjacent`` loop with integer moves and
        an exact within-tree log-probability accumulator; merge/termination
        logic is the SHARED ``_merge_pending``."""
        step = jnp.where(is_fwd, jnp.int32(1), jnp.int32(-1))
        n_leaves = jnp.int32(1) << d

        def cond(c):
            return (c["n"] < n_leaves) & jnp.any(c["building"] & engaged)

        def body(c):
            pos = c["z"].q[:, 0].astype(jnp.int32) + step
            z = _Edge(
                q=pos.astype(F)[:, None],
                p=c["z"].p,
                grad=c["z"].grad,
                ld=c["z"].ld,
            )
            delta = dummy_logdensity(pos.astype(F))
            div_flag = (pos >= d_lo) & (pos <= d_hi)
            i_new = i_edge + step * (c["n"] + jnp.int32(1))
            live = c["building"] & engaged

            v_log = jnp.where(live, jnp.minimum(delta, 0.0), neg_inf)
            log_sum = jnp.logaddexp(c["log_sum"], v_log)
            steps = c["steps"] + live.astype(jnp.int32)

            # exact multinomial accumulator (replaces Gumbel-argmax):
            # identical inclusion mask to the production score/omega update
            w = jnp.where(div_flag | ~live, neg_inf, delta)
            logp = jnp.logaddexp(c["logp"], onehot_log(pos, w))
            omega = jnp.logaddexp(c["omega"], w)

            node = leaf_tau(pos)
            turned = jnp.zeros((C,), bool)
            turn_left = jnp.zeros((C,), jnp.int32)
            node, level, turned, turn_left, stack = _merge_pending(
                c["n"], c["stack"], node, combine_dir, is_fwd, i_edge,
                step, jnp.int32(0), turned, turn_left,
            )

            invalid = live & (div_flag | turned)
            left = jnp.where(div_flag, i_new, turn_left)
            return {
                "n": c["n"] + jnp.int32(1),
                "z": z,
                "stack": stack,
                "building": c["building"] & ~(div_flag | turned),
                "log_sum": log_sum,
                "steps": steps,
                "omega": omega,
                "logp": logp,
                "inv_left": jnp.where(invalid, left, c["inv_left"]),
                "inv_right": jnp.where(invalid, i_new, c["inv_right"]),
            }

        init = {
            "n": jnp.int32(0),
            "z": z_edge,
            "stack": stack,
            "building": jnp.ones((C,), bool),
            "log_sum": jnp.full((C,), -jnp.inf, F),
            "steps": jnp.zeros((C,), jnp.int32),
            "omega": jnp.full((C,), -jnp.inf, F),
            "logp": jnp.full((C, SPAN), -jnp.inf, F),
            "inv_left": jnp.zeros((C,), jnp.int32),
            "inv_right": jnp.zeros((C,), jnp.int32),
        }
        out = jax.lax.while_loop(cond, body, init)
        out["tau_tree"] = tuple(
            jax.lax.dynamic_index_in_dim(
                s, jnp.minimum(d, S - 1), 0, keepdims=False
            )
            for s in out["stack"]
        )
        out["i_end"] = i_edge + step * out["n"]
        return out

    def cond(c):
        return (c["d"] < max_depth) & jnp.any(~c["terminated"])

    def body(c):
        is_fwd = ((c["dirs"] >> c["d"].astype(jnp.uint32)) & jnp.uint32(1)) == 1
        engaged = ~c["terminated"]
        z_edge = _where_edge(is_fwd, c["z_plus"], c["z_minus"])
        i_edge = jnp.where(is_fwd, c["i_plus"], c["i_minus"])

        adj = adjacent(c["d"], z_edge, i_edge, is_fwd, engaged, c["stack"])
        upd = _doubling_bookkeeping(c, adj, engaged, is_fwd, combine_dir)
        valid = upd.pop("valid")

        # exact biased progressive combine (replaces the Bernoulli draw):
        # same lp2 as the production accept probability
        lp2 = jnp.minimum(adj["omega"] - c["omega"], 0.0)
        logp_new = jnp.logaddexp(
            c["logp"] + log1mexp(lp2)[:, None],
            (adj["logp"] - adj["omega"][:, None]) + lp2[:, None],
        )
        logp = jnp.where(valid[:, None], logp_new, c["logp"])

        return {
            "d": c["d"] + jnp.int32(1),
            "dirs": c["dirs"],
            "stack": adj["stack"],
            "logp": logp,
            **upd,
        }

    z0f = z0.astype(F)
    zeros1 = jnp.zeros((C, 1), F)
    edge0 = _Edge(q=z0f[:, None], p=zeros1, grad=zeros1, ld=jnp.zeros((C,), F))
    init = {
        "d": jnp.int32(0),
        "dirs": jnp.asarray(directions, jnp.uint32),
        "stack": tuple(jnp.zeros((S, C, 1), F) for _ in range(3)),
        "z_minus": edge0,
        "z_plus": edge0,
        "i_minus": jnp.zeros((C,), jnp.int32),
        "i_plus": jnp.zeros((C,), jnp.int32),
        "logp": onehot_log(z0, jnp.zeros((C,), F)),
        "omega": dummy_logdensity(z0f),
        "tau": leaf_tau(z0),
        "work": jnp.int32(0),
        "log_sum": jnp.full((C,), -jnp.inf, F),
        "steps": jnp.zeros((C,), jnp.int32),
        "depth": jnp.zeros((C,), jnp.int32),
        "terminated": jnp.zeros((C,), bool),
        "term_left": jnp.ones((C,), jnp.int32),
        "term_right": jnp.zeros((C,), jnp.int32),
    }
    out = jax.lax.while_loop(cond, body, init)
    return out["logp"], out
