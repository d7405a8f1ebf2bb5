"""Attribute the ~0.8-1.1 ms FIXED per-transition cost of the batch-native
driver (tree_batched.sample_tree_batched) to its structural pieces.

profile_fixed_cost showed the fixed term does not scale with the merge-stack
size; profile_flat's eps sweep puts it at ~0.78 ms on top of ~57 us/doubling
+ ~56 us/leaf. This script times 64-step scans of partial programs on the
headline shape (4096 x 100 dense metric):

  noop      scan boundary only (key fold + tiny carry touch)
  draw      transition PROLOGUE only: key split, momentum draw, direction
            bits, pi0/psharp0, leaf tau  (no loops)
  md1       full transition, max_depth=1  (prologue + outer entry + inner
            entry + 1 leaf + 1 doubling + epilogue)
  md1_injp  md1 with the momentum injected from a pre-drawn buffer
            (md1 - md1_injp ~ in-context cost of the momentum draw)
  md3       full transition at eps 0.7 (depth-3 trees, 9 leaf slots) —
            the profile_flat reference point

Timing is MIN over PROF_REPS dispatches of the same compiled scan —
single-dispatch timings through the tunnel vary by up to 45% (measured:
profile_fixed_cost md=4 vs md=6 at identical work).

Run on the TPU (one process at a time): python scripts/profile_prologue.py
Knobs: PROF_CHAINS, PROF_DIM, PROF_STEPS, PROF_REPS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROF_CPU"):  # smoke-test mode (the image presets
    jax.config.update("jax_platforms", "cpu")  # jax_platforms=axon,cpu)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    C = int(os.environ.get("PROF_CHAINS", 4096))
    K = int(os.environ.get("PROF_DIM", 100))
    n_steps = int(os.environ.get("PROF_STEPS", 64))
    reps = int(os.environ.get("PROF_REPS", 5))

    import dynamichmc_tpu.tree_batched as tb
    from dynamichmc_tpu.hamiltonian import EvaluatedPoint, evaluate
    from dynamichmc_tpu.metric import dense_metric
    from dynamichmc_tpu.models import correlated_gaussian
    from dynamichmc_tpu.nuts import NUTS

    ld = correlated_gaussian(K, dtype=jnp.float32)
    cov = np.asarray(ld.cov_fn(), np.float64)
    metric = dense_metric(jnp.asarray(cov, jnp.float32))

    key = jax.random.PRNGKey(0)
    q0 = jnp.asarray(
        np.random.default_rng(0).multivariate_normal(
            np.zeros(K), cov, size=C
        ),
        jnp.float32,
    )
    Q0 = jax.vmap(lambda q: evaluate(ld, q))(q0)
    dtype = Q0.q.dtype

    def timed(label, fn, *args):
        out = fn(*args)  # compile + warm
        jax.block_until_ready(out)
        best = float("inf")
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            vals.append(dt)
            best = min(best, dt)
        ms = 1e3 * best / n_steps
        med = 1e3 * sorted(vals)[len(vals) // 2] / n_steps
        print(f"{label:>10s}: {ms:7.3f} ms/step (min of {reps};"
              f" median {med:7.3f})")
        return ms

    ops = tb.make_tau_ops(metric)

    # -- noop: scan boundary only ------------------------------------------------
    def noop_step(carry, i):
        Q = carry
        sub = jax.random.fold_in(key, i)
        bump = jax.random.uniform(sub, (), dtype) * jnp.asarray(1e-30, dtype)
        return EvaluatedPoint(q=Q.q + bump, logdensity=Q.logdensity,
                              grad=Q.grad), ()

    noop_fn = jax.jit(
        lambda Q: jax.lax.scan(noop_step, Q, jnp.arange(n_steps))
    )
    t_noop = timed("noop", noop_fn, Q0)

    # -- draw: transition prologue only ------------------------------------------
    def draw_step(carry, i):
        Q = carry
        sub = jax.random.fold_in(key, i)
        k_p, k_dir, _ = jax.random.split(sub, 3)
        p0 = tb.rand_p_b(k_p, metric, (C, K), dtype)
        dirs = jax.random.bits(k_dir, (C,), jnp.uint32)
        pi0, sp0 = ops.pi_and_psharp(Q.logdensity, p0)
        tau = ops.leaf_tau(p0, sp0)
        # keep every prologue output live with a dependency too small to
        # change Q numerically but impossible for XLA to fold away
        eps_live = jnp.asarray(1e-30, dtype)
        touch = (p0 + sum(jnp.asarray(t, dtype) for t in tau)) * eps_live
        ld_touch = (pi0 + dirs.astype(dtype)) * eps_live
        return EvaluatedPoint(q=Q.q + touch,
                              logdensity=Q.logdensity + ld_touch,
                              grad=Q.grad), ()

    draw_fn = jax.jit(
        lambda Q: jax.lax.scan(draw_step, Q, jnp.arange(n_steps))
    )
    t_draw = timed("draw", draw_fn, Q0)

    # -- full transitions ---------------------------------------------------------
    def make_full(md, eps_val, inject_p):
        algo = NUTS(max_depth=md)

        def step(carry, xs):
            Q, scratch = carry
            if inject_p:
                i, p = xs
            else:
                i, p = xs, None
            sub = jax.random.fold_in(key, i)
            Qn, st, scratch = tb.sample_tree_batched(
                sub, algo, ld, metric, Q, jnp.asarray(eps_val, dtype),
                scratch=scratch, p=p,
            )
            return (Qn, scratch), st.work

        scr = tb.make_tree_scratch(algo, metric, C, K, dtype)
        if inject_p:
            pbuf = tb.rand_p_b(jax.random.PRNGKey(7), metric,
                               (n_steps, C, K), dtype)
            return jax.jit(
                lambda Q: jax.lax.scan(step, (Q, scr),
                                       (jnp.arange(n_steps), pbuf))
            )
        return jax.jit(
            lambda Q: jax.lax.scan(step, (Q, scr), jnp.arange(n_steps))
        )

    t_md1 = timed("md1", make_full(1, 0.7, False), Q0)
    t_md1i = timed("md1_injp", make_full(1, 0.7, True), Q0)
    t_md3 = timed("md3", make_full(10, 0.7, False), Q0)

    print()
    print(f"scan boundary      : {t_noop:7.3f} ms")
    print(f"prologue (draw)    : {t_draw - t_noop:7.3f} ms")
    print(f"momentum in-context: {t_md1 - t_md1i:7.3f} ms (md1 - md1_injp)")
    print(f"loop structure+leaf: {t_md1 - t_draw:7.3f} ms "
          f"(md1 - prologue; includes 1 leaf + 1 doubling ~ 0.11 ms)")
    print(f"md3 total          : {t_md3:7.3f} ms (9 slots, depth 3)")
    print(f"md3 - md1          : {t_md3 - t_md1:7.3f} ms "
          f"(8 extra slots + 2 doublings)")


if __name__ == "__main__":
    main()
