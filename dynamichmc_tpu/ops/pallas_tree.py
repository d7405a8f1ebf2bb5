"""Whole-transition Pallas NUTS kernel for quadratic targets.

The batch-native driver (tree_batched.py) is bandwidth-bound on INTERMEDIATE
HBM traffic: every leaf slot re-reads and re-writes the (C, K) trajectory
state (edges, proposal, turn statistics, merge stack) because each XLA op
round-trips HBM. This kernel runs the ENTIRE NUTS transition — every leapfrog
leaf, the Gumbel-argmax proposal, the trailing-ones merge stack, the
generalized U-turn checks, and the biased doubling combine — inside ONE
Pallas kernel per chain block, with all state resident in VMEM. HBM is
touched once per transition per array instead of once per leaf slot.

Design (TPU-first):

- **Grid over chain blocks**: the fleet is split into blocks of ``B`` chains;
  each grid step runs one block's transition to completion. Blocks terminate
  independently (a block whose trees all finish at depth 2 exits its loops
  early), so the lockstep straggler bound shrinks from fleet-wide to
  block-wide for free.
- **K-major (Kp, B) layout**: positions/momenta/gradients are stored
  transposed so per-chain scalars are (1, B) rows — sublane-broadcasting
  against (Kp, B) vectors costs nothing, scalar-mask updates are 2-cycle VPU
  ops (a (B, 1) layout would pad every per-chain scalar to 128 lanes), and
  the matmuls take the model's exact per-chain orientation
  (``prec @ d``, ``L^T @ d``, ``M^-1 @ p``: models/gaussian.py:54-58).
- **All loop state in VMEM scratch; loop carries are scalars only**: Mosaic
  cannot legalize ``scf.yield`` of dozens of vector registers (measured: the
  first build carried the merge node + per-chain masks through the while
  carries and failed to compile), and per-chain i1 masks are stored as int32
  rows for the same reason. Every while_loop here carries only i32 scalars
  (counters + an "any lane active" flag computed at the end of each body);
  edges, stacks, proposals, and per-chain statistics are mutated in place.
- **Exact RNG stream parity**: all randomness (momentum, direction bits,
  per-leaf Gumbel, per-doubling Exponential) is precomputed OUTSIDE the
  kernel with the same key folds as ``sample_tree_batched``
  (tree_batched.py:460-650), so the kernel is pinned transition-for-
  transition against the XLA driver (tests/test_pallas_tree.py).

Semantics are sample_tree_batched's (multinomial progressive sampling via
running Gumbel-argmax, biased doubling, 3-check generalized U-turn with
carried psharp, -inf poisoning, InvalidTree termination encodings), which in
turn mirror /root/reference/src/trees.jl + NUTS.jl:132-139. Reference parity
is therefore inherited through the equivalence gate, not re-argued here.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hamiltonian import EvaluatedPoint
from ..metric import DiagonalMetric, Metric
from ..nuts import NUTS, AcceptanceStatistic, TreeStatistics, acceptance_rate
from ..tree import normalize_termination

# VMEM budget for persistent kernel state (of the ~16 MB/core): leave room
# for the pipelined input blocks, the noise block, and the metric matrices.
_VMEM_STATE_BUDGET = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(S: int, Kp: int, L_pad: int, max_block: int,
                model_bytes: int = 0) -> int:
    """Largest block size B (multiple of 128 lanes; min 128) whose persistent
    state fits the VMEM budget: 23 (Kp, B) vector arrays + 5 stack arrays of
    (S, Kp, B) + the (L_pad, B) noise block + the model's resident arrays
    (per-chain rows are negligible)."""
    b = max_block
    while b >= 128:
        state = (23 + 5 * S) * Kp * b * 4 + L_pad * b * 4 + model_bytes
        if state <= _VMEM_STATE_BUDGET:
            return b
        b //= 2
    return 0


def _gaussian_leaf(q_new, model_refs):
    """models/gaussian.py:54-58, exact orientation: d, L^T d, prec d."""
    prec, lchol, mu = model_refs
    d = q_new - mu[:]
    w = jnp.dot(lchol[:], d, preferred_element_type=jnp.float32)
    pd = jnp.dot(prec[:], d, preferred_element_type=jnp.float32)
    return -0.5 * jnp.sum(w * w, axis=0, keepdims=True), -pd


def _build_kernel(S: int, Kp: int, B: int, md: int, min_delta: float,
                  diag: bool, leaf_builder, n_model: int):
    """The transition kernel body for a (Kp, B) chain block.

    Ref order: 1 scalar-prefetch + 10 generic inputs + minv + ``n_model``
    model inputs, 10 outputs, then scratch: 23 (Kp, B) vectors,
    5 (S, Kp, B) stacks, and 27 (1, B) per-chain rows.
    ``diag`` selects the diagonal-metric psharp (elementwise row broadcast)
    vs dense (MXU matmul); both carry psharp in the turn statistic
    (tau_len 5) — for diagonal metrics the two extra stack arrays are
    VMEM-cheap here, unlike the HBM cost that makes tree_batched use the
    compact 3-statistic. ``leaf_builder(q_new, model_refs) -> (ld, grad)``
    is the model's value+gradient in K-major layout; -inf poisoning is
    applied generically around it.
    """
    i32 = jnp.int32
    # plain Python floats: jnp scalars built here would be captured consts,
    # which pallas_call rejects
    NEG = float("-inf")
    mind = float(min_delta)

    def kernel(dcap_ref,  # scalar prefetch: (1,) SMEM
               q0, p0, g0, ld0, eps, validm, dirs, gum, expo,
               minv, *rest):
        model_refs = rest[:n_model]
        (qn, gn, ldn, pin, depth_o, tl_o, tr_o, ls_o, st_o, wk_o
         ) = rest[n_model:n_model + 10]
        (
            # vector scratch (Kp, B)
            zmq, zmp, zmg, zpq, zpp, zpg, wq, wp, wg,
            t_pm, t_pp, t_rho, t_spm, t_spp,
            n_pm, n_pp, n_rho, n_spm, n_spp,
            bq, bg, pq, pg,
            # merge stacks (S, Kp, B)
            s_pm, s_pp, s_rho, s_spm, s_spp,
            # per-chain rows (1, B): int32 masks/counters
            r_building, r_terminated, r_turned, r_engaged,
            r_asteps, r_invl, r_invr, r_tl, r_iminus, r_iplus,
            r_steps, r_depth, r_tleft, r_tright, r_iedge, r_step,
            # per-chain rows (1, B): float32
            r_alogsum, r_aomega, r_bscore, r_bld, r_bpi,
            r_logsum, r_omega, r_propld, r_proppi, r_pi0, r_epss,
        ) = rest[n_model + 10:]

        def psharp(p):
            if diag:
                return p * minv[:]  # minv (Kp, 1) broadcasts over chains
            return jnp.dot(minv[:], p, preferred_element_type=jnp.float32)

        def colsum(x):
            return jnp.sum(x, axis=0, keepdims=True)  # (1, B)

        def pi_sp(ld_vals, p):
            sp = psharp(p)
            k = 0.5 * colsum(p * sp)
            k = jnp.where(jnp.isfinite(k), k, jnp.inf)
            return jnp.where(jnp.isfinite(ld_vals), ld_vals - k, NEG), sp

        def leaf_eval(q_new):
            ldv, g_new = leaf_builder(q_new, model_refs)
            # -inf poisoning, identical to tree_batched._evaluate_b
            ok = jnp.isfinite(ldv) & jnp.all(
                jnp.isfinite(g_new), axis=0, keepdims=True
            )
            ldv = jnp.where(ok | (ldv == NEG), ldv, NEG)
            return ldv, g_new

        def combine_dir(first, second, is_fwd):
            # tree_batched.make_tau_ops combine_dir, psharp-carrying
            x = tuple(jnp.where(is_fwd, a, b) for a, b in zip(first, second))
            y = tuple(jnp.where(is_fwd, b, a) for a, b in zip(first, second))
            pm_x, pp_x, rho_x, spm_x, spp_x = x
            pm_y, pp_y, rho_y, spm_y, spp_y = y
            r1 = rho_x + pm_y
            r2 = pp_x + rho_y
            rho = rho_x + rho_y
            t1 = (colsum(spm_x * r1) < 0) | (colsum(spm_y * r1) < 0)
            t2 = (colsum(spp_x * r2) < 0) | (colsum(spp_y * r2) < 0)
            t3 = (colsum(spm_x * rho) < 0) | (colsum(spp_y * rho) < 0)
            return (pm_x, pp_y, rho, spm_x, spp_y), (t1 | t2 | t3)

        def node_read():
            return (n_pm[:], n_pp[:], n_rho[:], n_spm[:], n_spp[:])

        def node_write(node):
            n_pm[:], n_pp[:], n_rho[:] = node[0], node[1], node[2]
            n_spm[:], n_spp[:] = node[3], node[4]

        def stack_read(level):
            return (s_pm[level], s_pp[level], s_rho[level],
                    s_spm[level], s_spp[level])

        def stack_write(level, node):
            s_pm[level], s_pp[level], s_rho[level] = node[0], node[1], node[2]
            s_spm[level], s_spp[level] = node[3], node[4]

        def i2b(x):  # int32 row -> bool mask (i1 rows don't survive Mosaic)
            return x > 0

        def b2i(x):
            return x.astype(i32)

        def any_i32(mask):
            return jnp.sum(mask.astype(i32))

        # --- init -------------------------------------------------------
        q0v, p0v, g0v = q0[:], p0[:], g0[:]
        ld0v = ld0[:]          # (1, B)
        r_epss[:] = eps[:]
        dirsv = dirs[:]        # (1, B) uint32
        pi0, sp0 = pi_sp(ld0v, p0v)
        r_pi0[:] = pi0
        zmq[:], zmp[:], zmg[:] = q0v, p0v, g0v
        zpq[:], zpp[:], zpg[:] = q0v, p0v, g0v
        pq[:], pg[:] = q0v, g0v
        t_pm[:], t_pp[:], t_rho[:] = p0v, p0v, p0v
        t_spm[:], t_spp[:] = sp0, sp0
        d_cap = dcap_ref[0]
        alive0 = validm[:] > 0  # padding lanes start terminated
        r_terminated[:] = b2i(~alive0)
        r_iminus[:] = jnp.zeros((1, B), i32)
        r_iplus[:] = jnp.zeros((1, B), i32)
        r_propld[:] = ld0v
        r_proppi[:] = pi0
        r_omega[:] = jnp.zeros((1, B), jnp.float32)
        r_logsum[:] = jnp.full((1, B), -jnp.inf, jnp.float32)
        r_steps[:] = jnp.zeros((1, B), i32)
        r_depth[:] = jnp.zeros((1, B), i32)
        r_tleft[:] = jnp.ones((1, B), i32)
        r_tright[:] = jnp.zeros((1, B), i32)

        def merge_pending(n, is_fwd, i_edge, step):
            """Trailing-ones merge of the node refs against the stack refs
            (tree_batched._merge_pending). r_turned / r_tl are outputs."""
            r_turned[:] = jnp.zeros((1, B), i32)
            r_tl[:] = jnp.zeros((1, B), i32)

            def mcond(level):
                return ((n >> level) & i32(1)) == i32(1)

            def mbody(level):
                turned = i2b(r_turned[:])
                merged, turning = combine_dir(
                    stack_read(level), node_read(), is_fwd
                )
                first_new = turning & ~turned
                a = n - (i32(1) << (level + i32(1))) + i32(1)
                r_tl[:] = jnp.where(
                    first_new, i_edge + step * (a + i32(1)), r_tl[:]
                )
                node = tuple(
                    jnp.where(turned, old, new)
                    for old, new in zip(node_read(), merged)
                )
                node_write(node)
                r_turned[:] = b2i(turned | turning)
                return level + i32(1)

            level = jax.lax.while_loop(mcond, mbody, i32(0))
            stack_write(level, node_read())

        def adjacent(d, i_edge, is_fwd, step, eps_signed, kcol0):
            """Build the depth-d adjacent trees; walking edge in wq/wp/wg,
            best proposal in bq/bg, per-chain accumulators in r_a* refs.
            Mirrors tree_batched.adjacent. Returns the executed iteration
            count n (the lockstep work instrumentation)."""
            n_leaves = i32(1) << d
            r_building[:] = jnp.ones((1, B), i32)
            r_alogsum[:] = jnp.full((1, B), -jnp.inf, jnp.float32)
            r_asteps[:] = jnp.zeros((1, B), i32)
            r_aomega[:] = jnp.full((1, B), -jnp.inf, jnp.float32)
            r_bscore[:] = jnp.full((1, B), -jnp.inf, jnp.float32)
            r_invl[:] = jnp.zeros((1, B), i32)
            r_invr[:] = jnp.zeros((1, B), i32)
            engaged = i2b(r_engaged[:])

            def cond(c):
                n, active = c
                return (n < n_leaves) & (active > 0)

            def body(c):
                n, _ = c
                half = 0.5 * eps_signed
                p_mid = wp[:] + half * wg[:]
                q_new = wq[:] + eps_signed * psharp(p_mid)
                ld_new, g_new = leaf_eval(q_new)
                p_new = p_mid + half * g_new
                pi, sp = pi_sp(ld_new, p_new)
                wq[:], wp[:], wg[:] = q_new, p_new, g_new
                i_new = i_edge + step * (n + i32(1))
                delta = pi - r_pi0[:]
                divergent = delta < mind
                live = i2b(r_building[:]) & engaged

                v_log = jnp.where(live, jnp.minimum(delta, 0.0), NEG)
                r_alogsum[:] = jnp.logaddexp(r_alogsum[:], v_log)
                r_asteps[:] = r_asteps[:] + live.astype(i32)

                g_noise = gum[kcol0 + n].reshape(1, B)
                score = jnp.where(divergent | ~live, NEG, delta + g_noise)
                take = score > r_bscore[:]
                r_bscore[:] = jnp.where(take, score, r_bscore[:])
                bq[:] = jnp.where(take, q_new, bq[:])
                bg[:] = jnp.where(take, g_new, bg[:])
                r_bld[:] = jnp.where(take, ld_new, r_bld[:])
                r_bpi[:] = jnp.where(take, pi, r_bpi[:])
                r_aomega[:] = jnp.logaddexp(
                    r_aomega[:], jnp.where(divergent | ~live, NEG, delta)
                )

                node_write((p_new, p_new, p_new, sp, sp))
                merge_pending(n, is_fwd, i_edge, step)
                turned = i2b(r_turned[:])

                invalid = live & (divergent | turned)
                left = jnp.where(divergent, i_new, r_tl[:])
                r_invl[:] = jnp.where(invalid, left, r_invl[:])
                r_invr[:] = jnp.where(invalid, i_new, r_invr[:])
                building = i2b(r_building[:]) & ~(divergent | turned)
                r_building[:] = b2i(building)
                return (n + i32(1), any_i32(building & engaged))

            n_final, _ = jax.lax.while_loop(
                cond, body, (i32(0), any_i32(engaged))
            )
            slot = jnp.minimum(d, i32(S - 1))
            node_write(stack_read(slot))  # tau_tree for the caller
            return n_final

        # --- doubling loop (tree_batched.sample_tree_batched body) -------
        def ocond(c):
            d, _work, active = c
            return (d < d_cap) & (active > 0)

        def obody(c):
            d, work, _ = c
            is_fwd = (
                (dirsv >> d.astype(jnp.uint32)) & jnp.uint32(1)
            ) == jnp.uint32(1)
            engaged = ~i2b(r_terminated[:])
            r_engaged[:] = b2i(engaged)
            wq[:] = jnp.where(is_fwd, zpq[:], zmq[:])
            wp[:] = jnp.where(is_fwd, zpp[:], zmp[:])
            wg[:] = jnp.where(is_fwd, zpg[:], zmg[:])
            i_edge = jnp.where(is_fwd, r_iplus[:], r_iminus[:])
            r_iedge[:] = i_edge
            step = jnp.where(is_fwd, i32(1), i32(-1))
            r_step[:] = step
            eps_signed = jnp.where(is_fwd, r_epss[:], -r_epss[:])
            kcol0 = (i32(1) << d) - i32(1)

            n_exec = adjacent(d, i_edge, is_fwd, step, eps_signed, kcol0)

            # _doubling_bookkeeping; the adjacent tree's tau sits in the
            # node refs, its per-chain accumulators in the r_a* rows
            tree_done = i2b(r_building[:])
            valid = engaged & tree_done
            invalid = engaged & ~tree_done
            r_logsum[:] = jnp.logaddexp(r_logsum[:], r_alogsum[:])
            r_steps[:] = r_steps[:] + r_asteps[:]
            i_end = i_edge + step * n_exec
            fwd_valid = valid & is_fwd
            bwd_valid = valid & ~is_fwd
            zpq[:] = jnp.where(fwd_valid, wq[:], zpq[:])
            zpp[:] = jnp.where(fwd_valid, wp[:], zpp[:])
            zpg[:] = jnp.where(fwd_valid, wg[:], zpg[:])
            i_plus = jnp.where(fwd_valid, i_end, r_iplus[:])
            r_iplus[:] = i_plus
            zmq[:] = jnp.where(bwd_valid, wq[:], zmq[:])
            zmp[:] = jnp.where(bwd_valid, wp[:], zmp[:])
            zmg[:] = jnp.where(bwd_valid, wg[:], zmg[:])
            i_minus = jnp.where(bwd_valid, i_end, r_iminus[:])
            r_iminus[:] = i_minus
            omega_old = r_omega[:]
            aomega = r_aomega[:]
            r_omega[:] = jnp.where(
                valid, jnp.logaddexp(omega_old, aomega), omega_old
            )
            tau_now = (t_pm[:], t_pp[:], t_rho[:], t_spm[:], t_spp[:])
            tau_c, turning = combine_dir(tau_now, node_read(), is_fwd)
            turning = valid & turning
            keep = valid & ~turning
            t_pm[:] = jnp.where(keep, tau_c[0], t_pm[:])
            t_pp[:] = jnp.where(keep, tau_c[1], t_pp[:])
            t_rho[:] = jnp.where(keep, tau_c[2], t_rho[:])
            t_spm[:] = jnp.where(keep, tau_c[3], t_spm[:])
            t_spp[:] = jnp.where(keep, tau_c[4], t_spp[:])
            r_depth[:] = r_depth[:] + valid.astype(i32)
            newly_term = invalid | turning
            r_tleft[:] = jnp.where(
                invalid, r_invl[:],
                jnp.where(turning, i_minus, r_tleft[:]),
            )
            r_tright[:] = jnp.where(
                invalid, r_invr[:],
                jnp.where(turning, i_plus, r_tright[:]),
            )

            # biased doubling combine
            lp2 = aomega - omega_old
            e_dbl = expo[d].reshape(1, B)
            accept = (lp2 >= 0) | (e_dbl > -lp2)
            take = valid & accept
            pq[:] = jnp.where(take, bq[:], pq[:])
            pg[:] = jnp.where(take, bg[:], pg[:])
            r_propld[:] = jnp.where(take, r_bld[:], r_propld[:])
            r_proppi[:] = jnp.where(take, r_bpi[:], r_proppi[:])

            terminated = i2b(r_terminated[:]) | newly_term
            r_terminated[:] = b2i(terminated)
            return (d + i32(1), work + n_exec, any_i32(~terminated))

        _d_fin, work_fin, _ = jax.lax.while_loop(
            ocond, obody,
            (i32(0), i32(0), any_i32(alive0)),
        )

        qn[:] = pq[:]
        gn[:] = pg[:]
        ldn[:] = r_propld[:]
        pin[:] = r_proppi[:]
        depth_o[:] = r_depth[:]
        tl_o[:] = r_tleft[:]
        tr_o[:] = r_tright[:]
        ls_o[:] = r_logsum[:]
        st_o[:] = r_steps[:]
        # the block's executed slot count (lockstep bound is per-BLOCK here)
        wk_o[:] = jnp.zeros((1, B), i32) + work_fin

    return kernel


@functools.lru_cache(maxsize=None)
def _tree_call(S: int, Kp: int, B: int, L: int, md: int,
               min_delta: float, diag: bool, interpret: bool,
               leaf_builder, model_spec: tuple):
    """Cached pallas_call closure for one (shape, config, model) signature.

    ``model_spec`` is a tuple of 2-D shapes for the model's extra kernel
    inputs (each loaded whole into VMEM, shared by every grid step). The
    ``leaf_builder`` function object is part of the cache key — build one
    per model instance and reuse it."""
    kernel = _build_kernel(S, Kp, B, md, min_delta, diag, leaf_builder,
                           len(model_spec))
    D = md
    Lp = _round_up(max(L, 1), 8)
    # index maps receive (*grid_indices, *scalar_prefetch_refs)
    blk = lambda i, *_: (0, i)  # noqa: E731
    fix = lambda i, *_: (0, 0)  # noqa: E731
    vec = pl.BlockSpec((Kp, B), blk, memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, B), blk, memory_space=pltpu.VMEM)
    gum_spec = pl.BlockSpec((Lp, B), blk, memory_space=pltpu.VMEM)
    expo_spec = pl.BlockSpec((_round_up(D, 8), B), blk,
                             memory_space=pltpu.VMEM)
    mat = pl.BlockSpec(
        ((Kp, 1) if diag else (Kp, Kp)), fix, memory_space=pltpu.VMEM,
    )
    model_specs = [
        pl.BlockSpec(tuple(shape), fix, memory_space=pltpu.VMEM)
        for shape in model_spec
    ]

    def call(cp, dcap, q0, p0, g0, ld0, eps, validm, dirs, gum, expo,
             minv, *model_arrays):
        f32, i32v = jnp.float32, jnp.int32
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cp // B,),
            in_specs=[vec, vec, vec, row, row, row, row, gum_spec,
                      expo_spec, mat] + model_specs,
            out_specs=[vec, vec, row, row, row, row, row, row, row, row],
            scratch_shapes=(
                [pltpu.VMEM((Kp, B), f32) for _ in range(23)]
                + [pltpu.VMEM((S, Kp, B), f32) for _ in range(5)]
                + [pltpu.VMEM((1, B), i32v) for _ in range(16)]
                + [pltpu.VMEM((1, B), f32) for _ in range(11)]
            ),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((Kp, cp), f32),   # qn
                jax.ShapeDtypeStruct((Kp, cp), f32),   # gn
                jax.ShapeDtypeStruct((1, cp), f32),    # ldn
                jax.ShapeDtypeStruct((1, cp), f32),    # pin
                jax.ShapeDtypeStruct((1, cp), i32v),   # depth
                jax.ShapeDtypeStruct((1, cp), i32v),   # term_left
                jax.ShapeDtypeStruct((1, cp), i32v),   # term_right
                jax.ShapeDtypeStruct((1, cp), f32),    # log_sum
                jax.ShapeDtypeStruct((1, cp), i32v),   # steps
                jax.ShapeDtypeStruct((1, cp), i32v),   # work
            ],
            interpret=interpret,
        )(dcap, q0, p0, g0, ld0, eps, validm, dirs, gum, expo,
          minv, *model_arrays)

    return call


def _leaf_noise(k_tree, md: int, C: int):
    """The per-leaf Gumbel rows and per-doubling Exponential rows with the
    EXACT key folds of tree_batched.sample_tree_batched: kadj/kdbl =
    fold_in(k_tree, 2d / 2d+1); per-leaf kleaf = fold_in(kadj, n). Row
    (1 << d) - 1 + n is doubling d's leaf n."""
    gum_rows = []
    for d in range(md):
        kadj = jax.random.fold_in(k_tree, 2 * d)
        keys = jax.vmap(lambda n, k=kadj: jax.random.fold_in(k, n))(
            jnp.arange(1 << d, dtype=jnp.uint32)
        )
        gum_rows.append(
            jax.vmap(lambda kk: jax.random.gumbel(kk, (C,), jnp.float32))(
                keys
            )
        )
    gum = jnp.concatenate(gum_rows, axis=0)  # (2^md - 1, C)
    kdbl = jax.vmap(
        lambda d: jax.random.fold_in(k_tree, 2 * d + 1)
    )(jnp.arange(md, dtype=jnp.uint32))
    expo = jax.vmap(
        lambda kk: jax.random.exponential(kk, (C,), jnp.float32)
    )(kdbl)  # (md, C)
    return gum, expo


def make_tree_transition(
    leaf_builder,
    model_arrays: tuple,
    dim: int,
    block_c: int = 256,
    interpret: Optional[bool] = None,
):
    """Generic hook factory for ``LogDensity.tree_transition_fn``:

    ``(key, algorithm, metric, Q, eps, depth_limit) -> (Q', stats) | None``

    ``leaf_builder(q_new, model_refs) -> (ld (1, B), grad (Kp, B))`` emits
    the model's value+gradient in K-major layout inside the kernel (bake
    static scalars into the closure; pass arrays via ``model_arrays`` with
    their 2-D shapes in ``model_spec`` — each is loaded whole into VMEM and
    shared by every chain block).

    Returns ``None`` (dispatcher falls back to the XLA driver) when the
    configuration is outside the kernel's regime: non-f32 chains, per-chain
    metric arrays, or a block size that cannot fit VMEM.

    ``work`` (the straggler instrumentation) is the executed slot count of
    the chain's OWN block — the kernel's lockstep bound is per-block, not
    fleet-wide, so ``diagnostics.straggler_waste`` reports the (smaller)
    per-block waste; a kernel slot wasted on terminated lanes also costs
    only VMEM ops, not HBM passes.
    """
    k = dim
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Kp = _round_up(k, 128)
    model_spec = tuple(tuple(a.shape) for a in model_arrays)
    model_bytes = sum(int(a.size) * 4 for a in model_arrays)

    def transition(key, algorithm: NUTS, metric: Metric, Q: EvaluatedPoint,
                   eps, depth_limit=None):
        if Q.q.dtype != jnp.float32:
            return None
        if algorithm.turn_statistic_configuration != "generalized":
            return None
        diag = isinstance(metric, DiagonalMetric)
        m_inv = metric.m_inv
        if diag:
            if m_inv.ndim != 1:
                return None  # per-chain diagonal: XLA driver handles it
            minv_in = jnp.pad(
                m_inv.astype(jnp.float32)[:, None], ((0, Kp - k), (0, 0))
            )
        else:
            if m_inv.ndim != 2:
                return None  # per-chain dense
            minv_in = jnp.pad(
                m_inv.astype(jnp.float32), ((0, Kp - k), (0, Kp - k))
            )
        C = Q.q.shape[0]
        md = algorithm.max_depth
        S = md
        L = (1 << md) - 1
        Lp = _round_up(max(L, 1), 8)
        B = _pick_block(S, Kp, Lp, block_c, model_bytes)
        if B == 0:
            return None
        cp = _round_up(C, B)

        from ..tree_batched import rand_p_b

        k_p, k_dir, k_tree = jax.random.split(key, 3)
        p0 = rand_p_b(k_p, metric, (C, k), jnp.float32)
        dirs = jax.random.bits(k_dir, (C,), jnp.uint32)
        gum, expo = _leaf_noise(k_tree, md, C)
        return _run(algorithm, Q, p0, dirs, gum, expo, eps, depth_limit,
                    minv_in, C, cp, B, S, Kp, L, md, diag)

    def _run(algorithm, Q, p0, dirs, gum, expo, eps, depth_limit,
             minv_in, C, cp, B, S, Kp, L, md, diag):
        f32, i32v = jnp.float32, jnp.int32
        if depth_limit is None:
            dcap = jnp.int32(md)
        else:
            dl = jnp.asarray(depth_limit, i32v)
            dcap = jnp.where(dl <= 0, i32v(md), jnp.minimum(dl, md))

        def pad_vec(x):  # (C, K) -> (Kp, cp)
            return jnp.pad(x.T, ((0, Kp - x.shape[1]), (0, cp - C)))

        def pad_row(x, fill=0):  # (C,) -> (1, cp)
            return jnp.pad(
                x[None, :], ((0, 0), (0, cp - C)), constant_values=fill
            )

        Lp = _round_up(max(L, 1), 8)
        Dp = _round_up(md, 8)
        eps_b = jnp.broadcast_to(jnp.asarray(eps, f32), (C,))
        gum_p = jnp.pad(gum, ((0, Lp - gum.shape[0]), (0, cp - C)))
        expo_p = jnp.pad(expo, ((0, Dp - md), (0, cp - C)))
        validm = pad_row(jnp.ones((C,), i32v))

        call = _tree_call(S, Kp, B, L, md, float(algorithm.min_delta),
                          diag, interpret, leaf_builder, model_spec)
        out = call(
            cp, dcap[None], pad_vec(Q.q), pad_vec(p0),
            pad_vec(Q.grad), pad_row(Q.logdensity.astype(f32)),
            pad_row(eps_b), validm,
            pad_row(dirs), gum_p, expo_p,
            minv_in, *model_arrays,
        )
        (qn, gn, ldn, pin, depth, tl, tr, ls, st, wk) = out
        qn = qn[:Q.q.shape[1], :C].T
        gn = gn[:Q.q.shape[1], :C].T
        lo, hi = normalize_termination(tl[0, :C], tr[0, :C])
        stats = TreeStatistics(
            logdensity=pin[0, :C],
            depth=depth[0, :C],
            term_left=lo,
            term_right=hi,
            acceptance_rate=acceptance_rate(
                AcceptanceStatistic(ls[0, :C], st[0, :C])
            ),
            steps=st[0, :C],
            directions=dirs,
            work=wk[0, :C],
        )
        Q_new = EvaluatedPoint(q=qn, logdensity=ldn[0, :C], grad=gn)
        return Q_new, stats

    return transition


def make_gaussian_tree_transition(
    prec: jnp.ndarray,
    mu: Optional[jnp.ndarray] = None,
    prec_chol_t: Optional[jnp.ndarray] = None,
    block_c: int = 256,
    interpret: Optional[bool] = None,
):
    """Whole-transition kernel for Gaussian targets (models/gaussian.py).
    Shares the model's f64-constructed ``prec_chol_t`` (gaussian.py:39-43);
    the leaf math matches the model's per-chain orientation op-for-op, so
    the kernel is bitwise-pinned to the XLA driver in practice."""
    import numpy as _np

    prec_full = jnp.asarray(prec)
    k = prec_full.shape[0]
    mu_full = (
        jnp.zeros((k,), prec_full.dtype) if mu is None else jnp.asarray(mu)
    )
    if prec_chol_t is None:
        prec_chol_t = jnp.asarray(
            _np.linalg.cholesky(
                _np.asarray(prec_full, _np.float64)
            ).T.astype(_np.asarray(prec_full).dtype)
        )
    Kp = _round_up(k, 128)
    prec_p = jnp.pad(
        prec_full.astype(jnp.float32), ((0, Kp - k), (0, Kp - k))
    )
    lchol_p = jnp.pad(
        jnp.asarray(prec_chol_t).astype(jnp.float32),
        ((0, Kp - k), (0, Kp - k)),
    )
    mu_p = jnp.pad(
        mu_full.astype(jnp.float32)[:, None], ((0, Kp - k), (0, 0))
    )
    return make_tree_transition(
        _gaussian_leaf, (prec_p, lchol_p, mu_p),
        k, block_c=block_c, interpret=interpret,
    )


def make_funnel_tree_transition(
    dim: int,
    sigma_v: float = 3.0,
    block_c: int = 256,
    interpret: Optional[bool] = None,
):
    """Whole-transition kernel for Neal's funnel (models/funnel.py:22-28):
    v = q[0], x = q[1:]; lp = -0.5 (v/sigma_v)^2 - 0.5 (dim-1) v
    - 0.5 e^{-v} sum x^2. The gradient is analytic (the model uses AD), so
    the kernel agrees with the XLA driver to float32 tolerance, not
    bitwise; the funnel gates are statistical (test_pallas_tree.py).

    Purely elementwise — no MXU work — so the kernel's win here is entirely
    the VMEM residency + per-block tree loops (the funnel's depth
    heterogeneity is what makes fleet-lockstep so wasteful: BENCH_NOTES
    round-4 funnel analysis)."""
    sv2 = float(sigma_v) ** 2
    half_km1 = 0.5 * (dim - 1)

    def funnel_leaf(q_new, model_refs):
        del model_refs
        v = q_new[0:1, :]  # (1, B)
        total = jnp.sum(q_new * q_new, axis=0, keepdims=True)
        x2 = total - v * v
        emv = jnp.exp(-v)
        ld = -0.5 * (v * v) / sv2 - half_km1 * v - 0.5 * emv * x2
        gv = -v / sv2 - half_km1 + 0.5 * emv * x2
        row = jax.lax.broadcasted_iota(jnp.int32, q_new.shape, 0)
        grad = jnp.where(row == 0, gv, -emv * q_new)
        return ld, grad

    return make_tree_transition(
        funnel_leaf, (), dim, block_c=block_c, interpret=interpret,
    )


def make_logreg_tree_transition(
    x,
    y,
    prior_scale: float = 10.0,
    block_c: int = 256,
    interpret: Optional[bool] = None,
):
    """Whole-transition kernel for Bayesian logistic regression
    (models/logreg.py:59-66): the design matrix X AND its transpose stay
    VMEM-resident across the entire transition — on top of the tree state,
    this removes the per-leaf HBM re-reads of X that the fused-leaf kernel
    (ops/pallas_logreg.py) already measured as the AD path's dominant cost
    at n_obs=4000 (1.76x). Per-leaf: logits = X q (MXU), stable
    log-sigmoid reduction over observations, grad = X^T (y - sigmoid)
    - q / prior_scale^2 (MXU).

    Padded observation rows are masked out (an unmasked zero logit would
    shift the log density by -log 2 per pad row); padded parameter rows
    hold zeros through both matmuls. The gradient is analytic vs the
    model's AD, so agreement is float32-tolerance (statistical gates).
    """
    import numpy as _np

    x_np = _np.asarray(x, _np.float32)
    y_np = _np.asarray(y, _np.float32)
    n_obs, k = x_np.shape
    Kp = _round_up(k, 128)
    np_p = _round_up(n_obs, 8)
    x_p = jnp.asarray(_np.pad(x_np, ((0, np_p - n_obs), (0, Kp - k))))
    xt_p = jnp.asarray(x_p.T)
    y_col = jnp.asarray(
        _np.pad(y_np, (0, np_p - n_obs))[:, None]
    )
    obs_mask = jnp.asarray(
        _np.pad(_np.ones((n_obs,), _np.float32), (0, np_p - n_obs))[:, None]
    )
    inv_s2 = 1.0 / float(prior_scale) ** 2

    def logreg_leaf(q_new, model_refs):
        X, Xt, yc, mask = model_refs
        logits = jnp.dot(X[:], q_new, preferred_element_type=jnp.float32)
        # sum_i y_i l_i - logaddexp(0, l_i), pad rows masked
        ll = jnp.sum(
            mask[:] * (yc[:] * logits - jnp.logaddexp(0.0, logits)),
            axis=0, keepdims=True,
        )
        prior = -0.5 * inv_s2 * jnp.sum(
            q_new * q_new, axis=0, keepdims=True
        )
        resid = mask[:] * (yc[:] - jax.nn.sigmoid(logits))
        grad = jnp.dot(
            Xt[:], resid, preferred_element_type=jnp.float32
        ) - inv_s2 * q_new
        return ll + prior, grad

    return make_tree_transition(
        logreg_leaf, (x_p, xt_p, y_col, obs_mask),
        k, block_c=block_c, interpret=interpret,
    )
