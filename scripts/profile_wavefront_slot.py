"""Measure the aligned-wavefront driver's per-SLOT cost in a sampling-like
configuration (fixed eps, no Welford fold) against the synchronized driver's
per-leaf cost on the same workload. Decides whether a wavefront SAMPLING
driver can beat lockstep (round-2 measured ~255 us/slot vs 54 us/leaf; this
re-measures on today's code/runtime before building wavefront v2)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    C = int(os.environ.get("PROF_CHAINS", 4096))
    K = int(os.environ.get("PROF_DIM", 100))

    import dynamichmc_tpu.tree_batched as tb
    from dynamichmc_tpu.hamiltonian import evaluate
    from dynamichmc_tpu.metric import dense_metric
    from dynamichmc_tpu.models import correlated_gaussian
    from dynamichmc_tpu.nuts import NUTS
    from dynamichmc_tpu.stepsize import FixedStepsize
    from dynamichmc_tpu.tree_wavefront import (
        make_wavefront_stage_driver,
        wavefront_init,
    )
    from dynamichmc_tpu.utils.welford import WelfordState

    ld = correlated_gaussian(K, dtype=jnp.float32)
    cov = np.asarray(ld.cov_fn(), np.float64)
    metric = dense_metric(jnp.asarray(cov, jnp.float32))
    algo = NUTS(max_depth=10)

    key = jax.random.PRNGKey(0)
    q0 = jnp.asarray(
        np.random.default_rng(0).multivariate_normal(np.zeros(K), cov, size=C),
        jnp.float32,
    )
    Q0 = jax.vmap(lambda q: evaluate(ld, q))(q0)
    eps = jnp.full((C,), 0.7, jnp.float32)

    adaptation = FixedStepsize()
    da0 = adaptation.init(eps)
    wf0 = WelfordState(
        count=jnp.zeros((C,), jnp.float32),
        mean=jnp.zeros((C, K), jnp.float32),
        m2=jnp.zeros((C, K), jnp.float32),
    )

    stage = make_wavefront_stage_driver(
        ld, algo, adaptation, use_welford=False
    )
    stage_j = jax.jit(stage, static_argnames=())

    n_slots = int(os.environ.get("PROF_SLOTS", 2048))
    carry0 = wavefront_init(Q0, metric, da0, wf0, algo.max_depth)
    big = jnp.int32(10**9)

    out, done = stage_j(key, metric, carry0, big, jnp.int32(64))
    jax.block_until_ready(done)
    t0 = time.perf_counter()
    out, done = stage_j(key, metric, carry0, big, jnp.int32(64))
    jax.block_until_ready(done)
    t64 = time.perf_counter() - t0

    out, done = stage_j(key, metric, carry0, big, jnp.int32(64 + n_slots))
    jax.block_until_ready(done)
    t0 = time.perf_counter()
    out, done = stage_j(key, metric, carry0, big, jnp.int32(64 + n_slots))
    jax.block_until_ready(done)
    t_all = time.perf_counter() - t0

    per_slot = (t_all - t64) / n_slots
    steps_done = int(np.asarray(out["t"]).sum())
    leaves = int(np.asarray(out["steps_total"]).sum())
    util = leaves / ((64 + n_slots) * C)
    print(
        f"wavefront: {per_slot * 1e6:.1f} us/slot, utilization "
        f"{util:.1%} ({steps_done} transitions, {leaves} leaves over "
        f"{64 + n_slots} slots x {C} lanes)"
    )

    # sync comparison at the same eps: per-transition scan
    def step(carry, i):
        Q, scratch = carry
        sub = jax.random.fold_in(key, i)
        Qn, st, scratch = tb.sample_tree_batched(
            sub, algo, ld, metric, Q, eps, scratch=scratch
        )
        return (Qn, scratch), (st.work[0], st.steps.sum(), st.depth)

    scr = tb.make_tree_scratch(algo, metric, C, K, Q0.q.dtype)
    for n_steps in (16, 64):
        fn = jax.jit(
            lambda Q, n=n_steps: jax.lax.scan(
                step, (Q, scr), jnp.arange(n, dtype=jnp.int32)
            )
        )
        out2 = fn(Q0)
        jax.block_until_ready(out2)
        t0 = time.perf_counter()
        out2 = fn(Q0)
        jax.block_until_ready(out2)
        t = time.perf_counter() - t0
        (_, _), (work, useful, depth) = out2
        work = int(np.asarray(work, np.int64).sum())
        useful = int(np.asarray(useful, np.int64).sum())
        d = np.asarray(depth)
        print(
            f"sync scan {n_steps} steps: {t / n_steps * 1e3:.2f} ms/step, "
            f"{t / work * 1e6:.1f} us/slot, useful {useful / (work * C):.1%}, "
            f"slots/step {work / n_steps:.1f}, depth mean {d.mean():.2f} "
            f"max {d.max()}"
        )


if __name__ == "__main__":
    main()
