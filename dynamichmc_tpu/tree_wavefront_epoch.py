"""Epoch-specialized wavefront driver for the SAMPLING phase.

The synchronized sampling driver (engine.make_sampling_driver_batched over
tree_batched.sample_tree_batched) pays two lockstep taxes per draw at fleet
scale, measured on the headline config (4096 chains x 100-d dense, adapted
per-chain eps): ~0.8 ms of fixed per-transition overhead (~125 small ops of
issue latency + loop entries — 36% of a depth-3 draw) and max-over-lanes tree
depth (53% of leaf slots spent on already-terminated lanes). The aligned
wavefront (tree_wavefront.py) removes the transition barrier but its uniform
slot body re-pays the fixed work EVERY slot (momentum draw, merge-loop entry,
completion bookkeeping: measured 234 us/slot vs the 54 us sync marginal leaf).

This driver keeps the wavefront's desynchronized lifecycles and aligned-start
merge invariant, and removes the per-slot fat by specializing the slot body
over an 8-slot epoch — the loop body advances the global counter g by 8, and
each sub-slot's position r = g mod 8 makes the trailing-ones count of g
STATIC:

    r:      0  1  2  3  4  5  6  7
    TO(g):  0  1  0  2  0  1  0  >=3

so 7 of 8 sub-slots trace exactly the merge levels they need (no merge at
all on even sub-slots, one statically-unrolled level at r=1/5, two at r=3)
and only r=7 carries a dynamic merge loop (entered once per 8 slots, looping
only when TO(g) >= 4 AND a lane is that deep). The bottom three merge-stack
levels are plain named (C, K) arrays — a static level index turns the
dynamic-update-slice rows of the level-major stack into jnp.where on named
buffers; levels >= 3 keep an (S-3, C, K) stack for the rare deep loop.

The other amortizations, all exactness-preserving:

- restarts (momentum draw + joint density + proposal reset — the per-
  transition prologue) run only at sub-slots 0 and 4; a finished lane waits
  0-3 slots to restart, which costs strictly less than the sync driver's
  whole-batch barrier, and ONE (C, K) momentum draw serves every lane
  restarting at that slot;
- tree/transition completion bookkeeping (doubling accept, tau combine,
  edge updates) runs only at ODD sub-slots: a depth-d>=1 adjacent tree can
  only complete at a slot with TO(g) >= d (odd), and a depth-0 tree
  finishing at an even slot would wait for the even alignment of its next
  doubling anyway, so deferring its bookkeeping by one slot changes no
  lane's schedule — only the leaf momentum (z.p, with M^-1 p stashed in
  ``sp_last``) must be kept to rebuild its one-leaf turn statistic;
- per-draw recording: each completed transition's position/statistics go to
  a small ring (``ring`` rows over the chain axis; a lane may run at most
  ``ring`` draws ahead of the slowest lane) via one-hot masked writes; once
  every lane has passed draw j, ring row j % ring is flushed into the
  (T, C, K) output with a scalar dynamic_update_slice — the only fast
  in-place path on TPU (per-lane scatter measured 78x slower). No-op
  flushes write to a sacrificial extra output row instead of branching.

Per-transition semantics are IDENTICAL to tree_batched.sample_tree_batched
(multinomial Gumbel-argmax proposals, biased doubling, 3-way generalized
U-turn, -inf poisoning, InvalidTree-style termination positions): the
injectable-noise gate in tests/test_equivalence_epoch.py pins positions and
per-draw statistics draw-for-draw against a lax.scan of the synchronized
driver. The RNG stream differs (draws are indexed by the global slot
counter), the same documented caveat the batch-native and wavefront drivers
carry. Cf. /root/reference/src/trees.jl:283-319 for the recursive semantics
being reproduced.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .hamiltonian import EvaluatedPoint
from .logdensity import LogDensity
from .metric import Metric
from .nuts import NUTS, AcceptanceStatistic, TreeStatistics, acceptance_rate
from .tree import normalize_termination
from .tree_batched import (
    _Edge,
    _leapfrog_b,
    _where_edge,
    make_tau_ops,
    psharp_b,
    rand_p_b,
)

EPOCH = 8
# trailing-ones of g at each sub-slot residue (mod 8); None = dynamic (>= 3)
_TO_TABLE = (0, 1, 0, 2, 0, 1, 0, None)
_RESTART_SLOTS = (0, 4)
_DEBUG = False  # per-sub-slot jax.debug.print of lane 0 (development only)

# Profiling-only ablation switches (scripts/profile_epoch_slot.py): members of
# {"record", "restart_draw", "merge", "process", "best"} disable pieces of the
# slot body AT TRACE TIME to attribute per-slot cost. Never set in production
# paths; results are statistically wrong with any ablation active.
_ablate: frozenset = frozenset()


class EpochNoise(NamedTuple):
    """Injectable randomness for the exact-equivalence gate (tests only;
    ``None`` keeps the production RNG stream and adds zero ops). Indexed by
    each lane's OWN counters — transition t, doubling d, leaf n — matching
    tree.TreeNoise / tree_wavefront.WavefrontNoise so one draw tensor can
    drive this driver and a scan of the synchronized driver identically."""

    p: jnp.ndarray  # (T, C, K) restart momenta
    dirs: jnp.ndarray  # (T, C) uint32 direction words
    gumbel: jnp.ndarray  # (T, max_depth, 2**(max_depth-1), C)
    expo: jnp.ndarray  # (T, max_depth, C)


def _trailing_ones_scalar(g):
    x = jnp.asarray(g, jnp.uint32)
    flipped = ~x & (x + 1)
    return jnp.asarray(
        jnp.round(jnp.log2(flipped.astype(jnp.float32))), jnp.int32
    )


# carry keys whose chain axis is SECOND (leading axis = stack level / ring
# row / draw index); everything else shards its leading (C) axis, except the
# per-device scalar counters below
_AXIS1_KEYS = (
    "deep",
    "ring_q", "ring_ld", "ring_pi", "ring_acc", "ring_depth", "ring_steps",
    "ring_tl", "ring_tr", "ring_work", "ring_dirs",
    "out_q", "out_ld", "out_pi", "out_acc", "out_depth", "out_steps",
    "out_tl", "out_tr", "out_work", "out_dirs",
)
# scalars in the single-chip carry; carried as (n_devices,) arrays under a
# mesh (one element per shard — devices advance independently)
_DEVICE_SCALAR_KEYS = ("g", "flushed")
_LANE_KEYS = (
    "t", "rec", "need_restart", "waiting", "building", "pending_done",
    "pending_inv", "Q", "dirs", "pi0", "d", "is_fwd", "z_minus", "z_plus",
    "i_minus", "i_plus", "prop_q", "prop_ld", "prop_grad", "prop_pi",
    "omega", "tau", "log_sum", "steps_tr", "g_restart", "tree_g0", "i_edge",
    "i_cur", "z", "sp_last", "omega_adj", "best_score", "best_q", "best_ld",
    "best_grad", "best_pi", "lsum_adj", "steps_adj", "inv_left", "inv_right",
    "L0", "L1", "L2",
)


def epoch_carry_specs(P, chain_axis):
    """``shard_map`` partition-spec prefix tree for the epoch sampling carry.

    Each device runs its OWN epoch loop over its local lanes (per-device
    slot/flush counters, independent while-loop trip counts, zero
    cross-device communication — sampling never adapts, so unlike the
    pooled-eps warmup there is nothing to pool). tests pin these key sets
    against epoch_sampling_init's actual carry."""
    specs = {k: P(chain_axis) for k in _LANE_KEYS + _DEVICE_SCALAR_KEYS}
    for k in _AXIS1_KEYS:
        specs[k] = P(None, chain_axis)
    return specs


def epoch_sampling_init(
    Q: EvaluatedPoint, metric: Metric, n_samples: int, max_depth: int,
    ring: int = 8,
):
    """Fresh sampling carry: every lane flagged for restart, empty outputs.

    Output buffers carry ONE extra trailing row (index n_samples): flush
    slots that have nothing to flush redirect their write there instead of
    branching on the 840 MB output buffer."""
    C, K = Q.q.shape
    dtype = Q.q.dtype
    tau_len = make_tau_ops(metric).tau_len
    S = max_depth
    T = n_samples
    zeros = jnp.zeros((C,), dtype)
    zeros_i = jnp.zeros((C,), jnp.int32)
    false = jnp.zeros((C,), bool)
    zK = jnp.zeros((C, K), dtype)
    edge = _Edge(q=Q.q, p=zK, grad=Q.grad, ld=Q.logdensity)
    level = tuple(zK for _ in range(tau_len))
    carry = {
        "g": jnp.int32(0),
        "t": zeros_i,
        "rec": zeros_i,
        "flushed": jnp.int32(0),
        "need_restart": jnp.ones((C,), bool),
        "waiting": false,
        "building": false,
        "pending_done": false,
        "pending_inv": false,
        # transition state
        "Q": Q,
        "dirs": jnp.zeros((C,), jnp.uint32),
        "pi0": zeros,
        "d": zeros_i,
        "is_fwd": false,
        "z_minus": edge,
        "z_plus": edge,
        "i_minus": zeros_i,
        "i_plus": zeros_i,
        "prop_q": Q.q,
        "prop_ld": Q.logdensity,
        "prop_grad": Q.grad,
        "prop_pi": zeros,
        "omega": zeros,
        "tau": level,
        "log_sum": jnp.full((C,), -jnp.inf, dtype),
        "steps_tr": zeros_i,
        "g_restart": zeros_i,
        # adjacent-tree state
        "tree_g0": zeros_i,
        "i_edge": zeros_i,
        "i_cur": zeros_i,
        "z": edge,
        "sp_last": zK,
        "omega_adj": zeros,
        "best_score": zeros,
        "best_q": zK,
        "best_ld": zeros,
        "best_grad": zK,
        "best_pi": zeros,
        "lsum_adj": zeros,
        "steps_adj": zeros_i,
        "inv_left": zeros_i,
        "inv_right": zeros_i,
        # merge stack: named bottom levels + deep rows (levels 3..S-1)
        "L0": level,
        "L1": level,
        "L2": level,
        "deep": tuple(
            jnp.zeros((max(S - 3, 1), C, K), dtype) for _ in range(tau_len)
        ),
        # draw ring + outputs
        "ring_q": jnp.zeros((ring, C, K), dtype),
        "ring_ld": jnp.zeros((ring, C), dtype),
        "ring_pi": jnp.zeros((ring, C), dtype),
        "ring_acc": jnp.zeros((ring, C), dtype),
        "ring_depth": jnp.zeros((ring, C), jnp.int32),
        "ring_steps": jnp.zeros((ring, C), jnp.int32),
        "ring_tl": jnp.zeros((ring, C), jnp.int32),
        "ring_tr": jnp.zeros((ring, C), jnp.int32),
        "ring_work": jnp.zeros((ring, C), jnp.int32),
        "ring_dirs": jnp.zeros((ring, C), jnp.uint32),
        "out_q": jnp.zeros((T + 1, C, K), dtype),
        "out_ld": jnp.zeros((T + 1, C), dtype),
        "out_pi": jnp.zeros((T + 1, C), dtype),
        "out_acc": jnp.zeros((T + 1, C), dtype),
        "out_depth": jnp.zeros((T + 1, C), jnp.int32),
        "out_steps": jnp.zeros((T + 1, C), jnp.int32),
        "out_tl": jnp.zeros((T + 1, C), jnp.int32),
        "out_tr": jnp.zeros((T + 1, C), jnp.int32),
        "out_work": jnp.zeros((T + 1, C), jnp.int32),
        "out_dirs": jnp.zeros((T + 1, C), jnp.uint32),
    }
    return carry


def epoch_sampling_finish(carry, n_samples: int):
    """Assemble the (C, T, ...) inference arrays from a completed carry
    (jit this; one dispatch). Mirrors make_sampling_driver_batched's
    output contract: (Q_final, qs, lds, per-draw TreeStatistics)."""
    T = n_samples
    qs = jnp.swapaxes(carry["out_q"][:T], 0, 1)
    lds = jnp.swapaxes(carry["out_ld"][:T], 0, 1)
    tl, tr = normalize_termination(carry["out_tl"][:T], carry["out_tr"][:T])
    stats = TreeStatistics(
        logdensity=jnp.swapaxes(carry["out_pi"][:T], 0, 1),
        depth=jnp.swapaxes(carry["out_depth"][:T], 0, 1),
        term_left=jnp.swapaxes(tl, 0, 1),
        term_right=jnp.swapaxes(tr, 0, 1),
        acceptance_rate=jnp.swapaxes(carry["out_acc"][:T], 0, 1),
        steps=jnp.swapaxes(carry["out_steps"][:T], 0, 1),
        directions=jnp.swapaxes(carry["out_dirs"][:T], 0, 1),
        work=jnp.swapaxes(carry["out_work"][:T], 0, 1),
    )
    return carry["Q"], qs, lds, stats


def make_epoch_sampling_driver(
    ld: LogDensity,
    algorithm: NUTS,
    n_samples: int,
    ring: int = 8,
    noise: Optional[EpochNoise] = None,
):
    """Resumable epoch-wavefront sampling program.

    (key, metric, eps, carry, g_stop) -> (carry', all_done)

    Runs 8-slot epochs until every lane's draws are flushed or the global
    counter reaches ``g_stop`` (the host's watchdog-safe dispatch budget,
    rounded up to an epoch). Slot keys derive from fold_in(key, g), so
    chunked dispatches are bitwise reproducible. ``eps`` is the fixed
    per-chain (C,) or scalar stepsize — sampling never adapts it."""
    if algorithm.turn_statistic_configuration != "generalized":
        raise NotImplementedError(
            "the epoch wavefront driver supports only the generalized "
            "turn statistic"
        )
    max_depth = algorithm.max_depth
    S = max_depth
    T = n_samples
    if ring < 2:
        raise ValueError("ring must be >= 2")

    def stage(key, metric: Metric, eps, carry, g_stop):
        ops = make_tau_ops(metric)
        tau_len = ops.tau_len
        carry_psharp = tau_len == 5
        combine_dir = ops.combine_dir
        pi_and_psharp = ops.pi_and_psharp
        leaf_tau = ops.leaf_tau

        C, K = carry["Q"].q.shape
        dtype = carry["Q"].q.dtype
        neg_inf = jnp.asarray(-jnp.inf, dtype)
        min_delta = jnp.asarray(algorithm.min_delta, dtype)
        eps_b = jnp.broadcast_to(jnp.asarray(eps, dtype), (C,))
        lane = jnp.arange(C) if noise is not None else None

        def restart_and_record(c, g, k_norm, k_dir):
            """Sub-slot prologue at r in {0, 4}: record parked draws into the
            ring, flush complete ring rows to the output, then restart every
            lane whose ring row is free."""
            if "record" in _ablate:
                rec, flushed = c["t"], jnp.min(c["t"])
                outs = {}
                ring_q, ring_ld = c["ring_q"], c["ring_ld"]
            else:
                # --- record: lanes holding an unrecorded completed draw -----
                can_rec = c["t"] > c["rec"]
                row_of = c["rec"] % ring  # (C,) the draw's ring row
                rows = jnp.arange(ring, dtype=jnp.int32)[:, None]  # (ring, 1)
                m = can_rec[None, :] & (row_of[None, :] == rows)  # (ring, C)
                ring_q = jnp.where(m[..., None], c["Q"].q[None], c["ring_q"])
                ring_ld = jnp.where(m, c["Q"].logdensity[None], c["ring_ld"])
                rec = jnp.where(can_rec, c["rec"] + 1, c["rec"])

                # --- flush: ONE row whose draw every lane has passed --------
                min_rec = jnp.min(rec)
                flushed = c["flushed"]
                outs = {
                    "out_q": c["out_q"], "out_ld": c["out_ld"],
                    "out_pi": c["out_pi"], "out_acc": c["out_acc"],
                    "out_depth": c["out_depth"], "out_steps": c["out_steps"],
                    "out_tl": c["out_tl"], "out_tr": c["out_tr"],
                    "out_work": c["out_work"], "out_dirs": c["out_dirs"],
                }
                rings = {
                    "out_q": ring_q, "out_ld": ring_ld,
                    "out_pi": c["ring_pi"], "out_acc": c["ring_acc"],
                    "out_depth": c["ring_depth"], "out_steps": c["ring_steps"],
                    "out_tl": c["ring_tl"], "out_tr": c["ring_tr"],
                    "out_work": c["ring_work"], "out_dirs": c["ring_dirs"],
                }
                # ONE flush per record slot keeps pace: a lane records at
                # most one draw per record slot, so min_rec - flushed never
                # grows (the trailing drain runs record slots with no
                # building lanes until the ring empties)
                do = flushed < min_rec  # scalar
                # no-op flushes land on the sacrificial row T
                idx = jnp.where(do, flushed, jnp.int32(T))
                src = flushed % ring
                for name in outs:
                    row = jax.lax.dynamic_index_in_dim(
                        rings[name], src, 0, keepdims=False
                    )
                    outs[name] = jax.lax.dynamic_update_index_in_dim(
                        outs[name], row, idx, 0
                    )
                flushed = jnp.where(do, flushed + 1, flushed)

            # --- restart -----------------------------------------------------
            restart = c["need_restart"] & (c["t"] < T) & (
                c["t"] - flushed < ring
            )
            if "restart_draw" in _ablate:
                p0 = c["z"].p  # recycle a stale momentum: skips the draw
                dirs_new = c["dirs"]
            elif noise is None:
                p0 = rand_p_b(k_norm, metric, (C, K), dtype)
                dirs_new = jax.random.bits(k_dir, (C,), jnp.uint32)
            else:
                ti = jnp.minimum(c["t"], noise.p.shape[0] - 1)
                p0 = jax.vmap(lambda t, i: noise.p[t, i])(ti, lane).astype(
                    dtype
                )
                dirs_new = jax.vmap(lambda t, i: noise.dirs[t, i])(ti, lane)
            pi0_new, sp0 = pi_and_psharp(c["Q"].logdensity, p0)
            r = restart
            rc = r[:, None]
            z0 = _Edge(
                q=c["Q"].q, p=p0, grad=c["Q"].grad, ld=c["Q"].logdensity
            )
            sp0 = p0 if sp0 is None else sp0
            tau0 = leaf_tau(p0, sp0)
            upd = {
                "rec": rec,
                "flushed": flushed,
                "ring_q": ring_q,
                "ring_ld": ring_ld,
                "need_restart": c["need_restart"] & ~restart,
                "waiting": c["waiting"] | restart,
                "pi0": jnp.where(r, pi0_new, c["pi0"]),
                "dirs": jnp.where(r, dirs_new, c["dirs"]),
                "d": jnp.where(r, 0, c["d"]),
                "z_minus": _where_edge(r, z0, c["z_minus"]),
                "z_plus": _where_edge(r, z0, c["z_plus"]),
                "i_minus": jnp.where(r, 0, c["i_minus"]),
                "i_plus": jnp.where(r, 0, c["i_plus"]),
                "prop_q": jnp.where(rc, c["Q"].q, c["prop_q"]),
                "prop_ld": jnp.where(r, c["Q"].logdensity, c["prop_ld"]),
                "prop_grad": jnp.where(rc, c["Q"].grad, c["prop_grad"]),
                "prop_pi": jnp.where(r, pi0_new, c["prop_pi"]),
                "omega": jnp.where(r, 0.0, c["omega"]),
                "tau": tuple(
                    jnp.where(rc, new, old)
                    for old, new in zip(c["tau"], tau0)
                ),
                "log_sum": jnp.where(r, neg_inf, c["log_sum"]),
                "steps_tr": jnp.where(r, 0, c["steps_tr"]),
                "g_restart": jnp.where(r, g, c["g_restart"]),
            }
            out = dict(c)
            out.update(outs)
            out.update(upd)
            return out

        def tree_starts(c, g):
            """Aligned adjacent-tree starts (every sub-slot)."""
            aligned = (g & ((jnp.int32(1) << c["d"]) - 1)) == 0
            start = c["waiting"] & aligned
            sc = start[:, None]
            d_u = c["d"].astype(jnp.uint32)
            is_fwd_new = ((c["dirs"] >> d_u) & jnp.uint32(1)) == 1
            is_fwd = jnp.where(start, is_fwd_new, c["is_fwd"])
            edge = _where_edge(is_fwd, c["z_plus"], c["z_minus"])
            i_e = jnp.where(is_fwd, c["i_plus"], c["i_minus"])
            out = dict(c)
            out.update(
                {
                    "is_fwd": is_fwd,
                    "z": _where_edge(start, edge, c["z"]),
                    "i_edge": jnp.where(start, i_e, c["i_edge"]),
                    "tree_g0": jnp.where(start, g, c["tree_g0"]),
                    "omega_adj": jnp.where(start, neg_inf, c["omega_adj"]),
                    "best_score": jnp.where(start, neg_inf, c["best_score"]),
                    "lsum_adj": jnp.where(start, neg_inf, c["lsum_adj"]),
                    "steps_adj": jnp.where(start, 0, c["steps_adj"]),
                    "building": c["building"] | start,
                    "waiting": c["waiting"] & ~start,
                }
            )
            return out

        def leaf(c, g, k_gum, stash_sp: bool):
            """One leapfrog leaf + proposal/visited bookkeeping for all
            building lanes; returns (carry', locals for merge/completion).
            ``stash_sp`` (even sub-slots only): keep M^-1 p of the leaf so a
            depth-0 completion deferred to the next odd slot can rebuild its
            turn statistic."""
            building = c["building"]
            is_fwd = c["is_fwd"]
            eps_signed = jnp.where(is_fwd, eps_b, -eps_b)
            if ld.fused_leaf_batched_fn is not None:
                qn, pn, gn, ldn, pi = ld.fused_leaf_batched_fn(
                    metric, c["z"].q, c["z"].p, c["z"].grad, eps_signed
                )
                z_new = _Edge(q=qn, p=pn, grad=gn, ld=ldn)
                sp = psharp_b(metric, z_new.p) if carry_psharp else None
            else:
                z_new = _leapfrog_b(ld, metric, c["z"], eps_signed)
                pi, sp = pi_and_psharp(z_new.ld, z_new.p)
            n = g - c["tree_g0"]  # (C,) per-lane leaf counter
            step = jnp.where(is_fwd, jnp.int32(1), jnp.int32(-1))
            i_new = c["i_edge"] + step * (n + 1)
            delta = pi - c["pi0"]
            divergent = building & (delta < min_delta)

            v_log = jnp.where(building, jnp.minimum(delta, 0.0), neg_inf)
            lsum_adj = jnp.logaddexp(c["lsum_adj"], v_log)
            steps_adj = c["steps_adj"] + building.astype(jnp.int32)

            if "best" in _ablate:
                out = dict(c)
                out.update(
                    {
                        "z": _where_edge(building, z_new, c["z"]),
                        "i_cur": jnp.where(building, i_new, c["i_cur"]),
                        "lsum_adj": lsum_adj,
                        "steps_adj": steps_adj,
                    }
                )
                sp_leaf = z_new.p if sp is None else sp
                return out, {
                    "z_new": z_new, "sp": sp_leaf, "n": n, "i_new": i_new,
                    "step": step, "divergent": divergent,
                }
            if noise is None:
                gum = jax.random.gumbel(k_gum, (C,), dtype)
            else:
                # clamp the per-lane counters: idle lanes carry stale values
                # (their gathered draws are masked out, but keep indices safe)
                ti = jnp.minimum(c["t"], noise.gumbel.shape[0] - 1)
                di = jnp.minimum(c["d"], noise.gumbel.shape[1] - 1)
                ni = jnp.clip(n, 0, noise.gumbel.shape[2] - 1)
                gum = jax.vmap(
                    lambda t, dd, nn, i: noise.gumbel[t, dd, nn, i]
                )(ti, di, ni, lane).astype(dtype)
            score = jnp.where(divergent | ~building, neg_inf, delta + gum)
            take = score > c["best_score"]
            tk = take[:, None]
            out = dict(c)
            out.update(
                {
                    "z": _where_edge(building, z_new, c["z"]),
                    "i_cur": jnp.where(building, i_new, c["i_cur"]),
                    "lsum_adj": lsum_adj,
                    "steps_adj": steps_adj,
                    "best_score": jnp.where(take, score, c["best_score"]),
                    "best_q": jnp.where(tk, z_new.q, c["best_q"]),
                    "best_ld": jnp.where(take, z_new.ld, c["best_ld"]),
                    "best_grad": jnp.where(tk, z_new.grad, c["best_grad"]),
                    "best_pi": jnp.where(take, pi, c["best_pi"]),
                    "omega_adj": jnp.logaddexp(
                        c["omega_adj"],
                        jnp.where(divergent | ~building, neg_inf, delta),
                    ),
                }
            )
            if carry_psharp and stash_sp:
                out["sp_last"] = jnp.where(
                    building[:, None], sp, c["sp_last"]
                )
            sp_leaf = z_new.p if sp is None else sp
            return out, {
                "z_new": z_new,
                "sp": sp_leaf,
                "n": n,
                "i_new": i_new,
                "step": step,
                "divergent": divergent,
            }

        def _get_level(c, level: int):
            if level < 3:
                return c[f"L{level}"]
            return tuple(
                jax.lax.dynamic_index_in_dim(s, level - 3, 0, keepdims=False)
                for s in c["deep"]
            )

        def _set_level_masked(c, level: int, node, mask):
            """Store ``node`` into stack level (static index) on mask lanes."""
            mc = mask[:, None]
            if level < 3:
                key_ = f"L{level}"
                c[key_] = tuple(
                    jnp.where(mc, nd, old) for nd, old in zip(node, c[key_])
                )
            else:
                rows = tuple(
                    jax.lax.dynamic_index_in_dim(
                        s, level - 3, 0, keepdims=False
                    )
                    for s in c["deep"]
                )
                c["deep"] = tuple(
                    jax.lax.dynamic_update_index_in_dim(
                        s, jnp.where(mc, nd, row), level - 3, 0
                    )
                    for s, nd, row in zip(c["deep"], node, rows)
                )
            return c

        def _merge_level(c, level: int, node, turned, turn_left, lf):
            """One statically-indexed merge level: merge ``node`` with the
            parked subtree for lanes whose merge run passes this level
            (d > level), with freeze-on-turn and InvalidTree left-edge
            bookkeeping (tree_batched._merge_pending semantics)."""
            building = c["building"]
            rows = _get_level(c, level)
            merged, turning = combine_dir(rows, node, c["is_fwd"])
            do_merge = building & (c["d"] > level)
            first_turn = do_merge & turning & ~turned
            a = lf["n"] - (jnp.int32(1) << (level + 1)) + jnp.int32(1)
            turn_left = jnp.where(
                first_turn, c["i_edge"] + lf["step"] * (a + jnp.int32(1)),
                turn_left,
            )
            turned = turned | first_turn
            node = tuple(
                jnp.where(
                    ((do_merge & ~turned) | first_turn)[:, None], mg, nd
                )
                for nd, mg in zip(node, merged)
            )
            return node, turned, turn_left

        def merges(c, g, to_static, lf):
            """The merge/push run for this sub-slot's static trailing-ones
            count (to_static; None at r=7 where TO(g) >= 3 is dynamic)."""
            node = leaf_tau(lf["z_new"].p, lf["sp"])
            turned = jnp.zeros((C,), bool)
            turn_left = jnp.zeros((C,), jnp.int32)
            building = c["building"]
            if "merge" in _ablate:
                to_g = (
                    _trailing_ones_scalar(g) if to_static is None
                    else jnp.int32(to_static)
                )
                return c, node, turned, turn_left, jnp.minimum(to_g, c["d"])
            if to_static is not None:
                for level in range(to_static):
                    node, turned, turn_left = _merge_level(
                        c, level, node, turned, turn_left, lf
                    )
                # park at level to_static for lanes still mid-tree
                do_push = building & (c["d"] > to_static)
                c = _set_level_masked(c, to_static, node, do_push)
                k_l = jnp.minimum(jnp.int32(to_static), c["d"])
            else:
                to_g = _trailing_ones_scalar(g)  # >= 3 at r=7
                for level in range(3):
                    node, turned, turn_left = _merge_level(
                        c, level, node, turned, turn_left, lf
                    )
                k_l = jnp.minimum(to_g, c["d"])

                # Levels >= 3: dynamic MERGE-ONLY continuation. Pushes never
                # happen inside it — at any slot the push level is the
                # SCALAR to_g (k_l == level < d forces to_g == level), so
                # the deep stack is read-only here (captured as a loop
                # constant, NOT carried: carrying the (S-3, C, K) x tau_len
                # stack made the loop entry the dominant slot cost) and ONE
                # masked dynamic update at row to_g-3 after the loop parks
                # every still-building lane's node.
                deep = c["deep"]

                def mcond(m):
                    return m[1] < jnp.minimum(k_l_max, jnp.int32(S))

                def mbody(m):
                    node, level, turned, tl = m
                    rows = tuple(
                        jax.lax.dynamic_index_in_dim(
                            s, level - 3, 0, keepdims=False
                        )
                        for s in deep
                    )
                    merged, turning = combine_dir(rows, node, c["is_fwd"])
                    do_merge = building & (level < k_l)
                    first_turn = do_merge & turning & ~turned
                    a = lf["n"] - (jnp.int32(1) << (level + 1)) + jnp.int32(1)
                    tl = jnp.where(
                        first_turn,
                        c["i_edge"] + lf["step"] * (a + jnp.int32(1)),
                        tl,
                    )
                    turned = turned | first_turn
                    node = tuple(
                        jnp.where(
                            ((do_merge & ~turned) | first_turn)[:, None],
                            mg, nd,
                        )
                        for nd, mg in zip(node, merged)
                    )
                    return (node, level + 1, turned, tl)

                # merge levels run to max over lanes of k_l (cheap (C,)
                # reduction; 0 iterations when no lane is deeper than the
                # statically-unrolled levels)
                k_l_max = jnp.max(jnp.where(building, k_l, 0))
                node, _lvl, turned, turn_left = jax.lax.while_loop(
                    mcond, mbody, (node, jnp.int32(3), turned, turn_left)
                )
                do_push = building & (c["d"] > to_g)
                row_idx = jnp.clip(to_g - 3, 0, max(S - 4, 0))
                c = dict(c)
                c["deep"] = tuple(
                    jax.lax.dynamic_update_index_in_dim(
                        s,
                        jnp.where(
                            do_push[:, None],
                            nd,
                            jax.lax.dynamic_index_in_dim(
                                s, row_idx, 0, keepdims=False
                            ),
                        ),
                        row_idx,
                        0,
                    )
                    for s, nd in zip(c["deep"], node)
                )
                # pushes at levels < 3 for lanes with k_l < 3 < to_g:
                # k_l == level < d requires to_g == level (impossible,
                # to_g >= 3) or d == level then level < d fails — none.
            return c, node, turned, turn_left, k_l

        def detect_completions(c, k_l, node, turned, turn_left, lf):
            """Flag invalid / completed adjacent trees; fold their visited
            statistics into the transition; stash what deferred processing
            needs. Runs every sub-slot (cheap (C,) ops only). Returns
            (carry', tree_done) so odd-slot processing can distinguish
            same-slot completions (whose merged ``node`` is valid) from
            even-slot deferrals (rebuilt from the stashed leaf)."""
            building = c["building"]
            divergent = lf["divergent"]
            invalid = building & (divergent | turned)
            tree_done = building & (k_l == c["d"]) & ~(divergent | turned)
            finished = invalid | tree_done

            left = jnp.where(divergent, lf["i_new"], turn_left)
            out = dict(c)
            out.update(
                {
                    "building": building & ~finished,
                    "pending_done": c["pending_done"] | tree_done,
                    "pending_inv": c["pending_inv"] | invalid,
                    "log_sum": jnp.where(
                        finished,
                        jnp.logaddexp(c["log_sum"], c["lsum_adj"]),
                        c["log_sum"],
                    ),
                    "steps_tr": jnp.where(
                        finished, c["steps_tr"] + c["steps_adj"], c["steps_tr"]
                    ),
                    "lsum_adj": jnp.where(finished, neg_inf, c["lsum_adj"]),
                    "steps_adj": jnp.where(finished, 0, c["steps_adj"]),
                    "inv_left": jnp.where(invalid, left, c["inv_left"]),
                    "inv_right": jnp.where(invalid, lf["i_new"], c["inv_right"]),
                }
            )
            return out, tree_done

        def process(c, g, k_exp, node, now_done):
            """Odd-sub-slot completion processing: doubling accept + tau
            combine + transition bookkeeping + per-draw ring writes. ``node``
            is this slot's merged statistic (valid for lanes completing NOW);
            lanes pending from the previous even slot completed a depth-0
            tree whose statistic is rebuilt from the stashed leaf momentum."""
            proc_done = c["pending_done"]
            proc_inv = c["pending_inv"]
            is_fwd = c["is_fwd"]

            # node for deferred depth-0 completions: (p, p, p[, sp, sp])
            was_pending = proc_done & ~now_done
            wp = was_pending[:, None]
            zp = c["z"].p
            if tau_len == 5:
                pend_node = (zp, zp, zp, c["sp_last"], c["sp_last"])
            else:
                pend_node = (zp, zp, zp)
            node_eff = tuple(
                jnp.where(wp, pn, nd) for pn, nd in zip(pend_node, node)
            )

            # edge updates for valid completed trees
            fwd_done = proc_done & is_fwd
            bwd_done = proc_done & ~is_fwd
            z_plus = _where_edge(fwd_done, c["z"], c["z_plus"])
            z_minus = _where_edge(bwd_done, c["z"], c["z_minus"])
            i_plus = jnp.where(fwd_done, c["i_cur"], c["i_plus"])
            i_minus = jnp.where(bwd_done, c["i_cur"], c["i_minus"])

            # biased doubling accept
            lp2 = c["omega_adj"] - c["omega"]
            if noise is None:
                e_dbl = jax.random.exponential(k_exp, (C,), dtype)
            else:
                ti = jnp.minimum(c["t"], noise.expo.shape[0] - 1)
                di = jnp.minimum(c["d"], noise.expo.shape[1] - 1)
                e_dbl = jax.vmap(lambda t, dd, i: noise.expo[t, dd, i])(
                    ti, di, lane
                ).astype(dtype)
            accept = (lp2 >= 0) | (e_dbl > -lp2)
            take = (proc_done & accept)[:, None]
            prop_q = jnp.where(take, c["best_q"], c["prop_q"])
            prop_ld = jnp.where(proc_done & accept, c["best_ld"], c["prop_ld"])
            prop_grad = jnp.where(take, c["best_grad"], c["prop_grad"])
            prop_pi = jnp.where(proc_done & accept, c["best_pi"], c["prop_pi"])
            omega = jnp.where(
                proc_done, jnp.logaddexp(c["omega"], c["omega_adj"]), c["omega"]
            )

            tau_c, turning_tr = combine_dir(c["tau"], node_eff, is_fwd)
            turning_tr = proc_done & turning_tr
            keep = (proc_done & ~turning_tr)[:, None]
            tau = tuple(
                jnp.where(keep, new, old) for old, new in zip(c["tau"], tau_c)
            )
            d = jnp.where(proc_done, c["d"] + 1, c["d"])
            hit_max = proc_done & ~turning_tr & (d >= S)

            tr_done = proc_inv | turning_tr | hit_max
            waiting = c["waiting"] | (proc_done & ~turning_tr & ~hit_max)

            # per-draw statistics at transition completion
            acc = acceptance_rate(
                AcceptanceStatistic(c["log_sum"], c["steps_tr"])
            )
            term_l = jnp.where(
                proc_inv, c["inv_left"], jnp.where(turning_tr, i_minus, 1)
            )
            term_r = jnp.where(
                proc_inv, c["inv_right"], jnp.where(turning_tr, i_plus, 0)
            )
            work = g - c["g_restart"] + 1

            rows = jnp.arange(ring, dtype=jnp.int32)[:, None]
            m = tr_done[None, :] & ((c["t"] % ring)[None, :] == rows)

            Q = EvaluatedPoint(
                q=jnp.where(tr_done[:, None], prop_q, c["Q"].q),
                logdensity=jnp.where(tr_done, prop_ld, c["Q"].logdensity),
                grad=jnp.where(tr_done[:, None], prop_grad, c["Q"].grad),
            )
            out = dict(c)
            out.update(
                {
                    "pending_done": jnp.zeros((C,), bool),
                    "pending_inv": jnp.zeros((C,), bool),
                    "z_minus": z_minus,
                    "z_plus": z_plus,
                    "i_minus": i_minus,
                    "i_plus": i_plus,
                    "prop_q": prop_q,
                    "prop_ld": prop_ld,
                    "prop_grad": prop_grad,
                    "prop_pi": prop_pi,
                    "omega": omega,
                    "tau": tau,
                    "d": d,
                    "waiting": waiting & ~tr_done,
                    "need_restart": c["need_restart"] | tr_done,
                    "t": c["t"] + tr_done.astype(jnp.int32),
                    "Q": Q,
                    "ring_pi": jnp.where(m, prop_pi[None], c["ring_pi"]),
                    "ring_acc": jnp.where(m, acc[None], c["ring_acc"]),
                    "ring_depth": jnp.where(m, d[None], c["ring_depth"]),
                    "ring_steps": jnp.where(
                        m, c["steps_tr"][None], c["ring_steps"]
                    ),
                    "ring_tl": jnp.where(m, term_l[None], c["ring_tl"]),
                    "ring_tr": jnp.where(m, term_r[None], c["ring_tr"]),
                    "ring_work": jnp.where(m, work[None], c["ring_work"]),
                    "ring_dirs": jnp.where(m, c["dirs"][None], c["ring_dirs"]),
                }
            )
            return out

        def sub_slot(c, r: int):
            g = c["g"] + r
            kit = jax.random.fold_in(key, g)
            k_gum, k_exp, k_norm, k_dir = jax.random.split(kit, 4)
            if r in _RESTART_SLOTS:
                c = restart_and_record(c, g, k_norm, k_dir)
            c = tree_starts(c, g)
            c, lf = leaf(c, g, k_gum, stash_sp=(r % 2 == 0))
            to_static = _TO_TABLE[r]
            c, node, turned, turn_left, k_l = merges(c, g, to_static, lf)
            c, now_done = detect_completions(c, k_l, node, turned, turn_left, lf)
            if _DEBUG:
                jax.debug.print(
                    "g={g} bld={b} wait={w} pend={pd} d={d} turned={t} "
                    "done={dn} z.q0={z} L0={l}",
                    g=g, b=c["building"][0], w=c["waiting"][0],
                    pd=c["pending_done"][0], d=c["d"][0], t=turned[0],
                    dn=now_done[0], z=c["z"].q[0, 0], l=c["L0"][0][0, 0],
                )
            if r % 2 == 1:
                c = process(c, g, k_exp, node, now_done)
            return c

        def cond(c):
            return (c["g"] < g_stop) & (c["flushed"] < T)

        def body(c):
            for r in range(EPOCH):
                c = sub_slot(c, r)
            c = dict(c)
            c["g"] = c["g"] + EPOCH
            return c

        out = jax.lax.while_loop(cond, body, carry)
        return out, out["flushed"] >= T

    return stage
