"""Tree-driver cost sweep: eps (-> tree depth) vs ms/transition, us/leaf-slot.

Profiles the production batch-native driver (sample_tree_batched) on the
headline-like config; this sweep is the source of the fixed/per-doubling/
per-leaf cost model in BENCH_NOTES.md. If a build also exposes an
alternative driver named in PROF_ALT (e.g. the flat single-while-loop
variant, removed at 5945f5c after measuring 0.65-0.77x — RNG-stream
identical, so any delta is pure loop structure), it is A/B'd side by side.

Run on the TPU (one process at a time): python scripts/profile_flat.py
Knobs: PROF_CHAINS, PROF_DIM, PROF_STEPS, PROF_METRIC (dense|diagonal),
PROF_ALT (attribute name of an alternative driver in tree_batched).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from dynamichmc_tpu.utils.cache import host_keyed_cache_dir

jax.config.update("jax_compilation_cache_dir", host_keyed_cache_dir("/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    C = int(os.environ.get("PROF_CHAINS", 4096))
    K = int(os.environ.get("PROF_DIM", 100))
    n_steps = int(os.environ.get("PROF_STEPS", 64))
    metric_kind = os.environ.get("PROF_METRIC", "dense")

    import dynamichmc_tpu.tree_batched as tb
    from dynamichmc_tpu.hamiltonian import evaluate
    from dynamichmc_tpu.metric import dense_metric, diagonal_metric
    from dynamichmc_tpu.models import correlated_gaussian
    from dynamichmc_tpu.nuts import NUTS

    ld = correlated_gaussian(K, dtype=jnp.float32)
    cov = np.asarray(ld.cov_fn(), np.float64)
    if metric_kind == "dense":
        metric = dense_metric(jnp.asarray(cov, jnp.float32))
    else:
        metric = diagonal_metric(jnp.asarray(np.diag(cov), jnp.float32))
    algo = NUTS()

    key = jax.random.PRNGKey(0)
    q0 = jnp.asarray(
        np.random.default_rng(0).multivariate_normal(np.zeros(K), cov, size=C),
        jnp.float32,
    )
    Q0 = jax.vmap(lambda q: evaluate(ld, q))(q0)

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best, out

    def transition_loop(driver, eps):
        def step(Q, i):
            sub = jax.random.fold_in(key, i)
            Qn, st = driver(sub, algo, ld, metric, Q, jnp.float32(eps))
            return Qn, (st.work[0], st.steps, st.depth)

        return jax.jit(lambda Q: jax.lax.scan(step, Q, jnp.arange(n_steps)))

    drivers = [("nested", tb.sample_tree_batched)]
    alt_name = os.environ.get("PROF_ALT", "")
    if alt_name:
        drivers.append((alt_name, getattr(tb, alt_name)))

    rows = {}
    for eps in (1.4, 0.7, 0.35, 0.18):
        for label, driver in drivers:
            secs, (_, (work, steps, depth)) = timed(
                transition_loop(driver, eps), Q0
            )
            slots = int(np.asarray(work, np.int64).sum())
            d_mean = float(np.asarray(depth, np.float64).mean())
            ms_tr = 1e3 * secs / n_steps
            us_slot = 1e6 * secs / max(slots, 1)
            rows[(eps, label)] = (ms_tr, us_slot, slots, d_mean)
            print(
                f"eps={eps:5.2f} {label:>7}: {ms_tr:7.3f} ms/transition  "
                f"{us_slot:6.1f} us/slot  (slots/tr {slots / n_steps:6.1f}, "
                f"mean depth {d_mean:.2f})"
            )
        if len(drivers) > 1:
            a = rows[(eps, drivers[0][0])][0]
            b = rows[(eps, drivers[1][0])][0]
            print(f"          {drivers[1][0]} speedup: {a / b:5.2f}x")


if __name__ == "__main__":
    main()
