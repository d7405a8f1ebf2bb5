"""Locate the ~1.35 ms fixed per-transition cost of the batch-native driver:
sweep max_depth (which sets the merge-stack size S) at fixed eps. If the
fixed cost scales with S, the stack alloc/copy is the culprit; if flat, the
cost is loop/prologue structure. TPU timing aid."""

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
    n_steps = int(os.environ.get("PROF_STEPS", 64))

    import dynamichmc_tpu.tree_batched as tb
    from dynamichmc_tpu.hamiltonian import evaluate
    from dynamichmc_tpu.metric import dense_metric
    from dynamichmc_tpu.models import correlated_gaussian
    from dynamichmc_tpu.nuts import NUTS

    ld = correlated_gaussian(K, dtype=jnp.float32)
    cov = np.asarray(ld.cov_fn(), np.float64)
    metric = dense_metric(jnp.asarray(cov, jnp.float32))

    key = jax.random.PRNGKey(0)
    q0 = jnp.asarray(
        np.random.default_rng(0).multivariate_normal(np.zeros(K), cov, size=C),
        jnp.float32,
    )
    Q0 = jax.vmap(lambda q: evaluate(ld, q))(q0)
    eps = jnp.float32(0.7)

    for md in [1, 2, 3, 4, 6, 8, 10]:
        algo = NUTS(max_depth=md)

        def step(carry, i):
            Q, scratch = carry
            sub = jax.random.fold_in(key, i)
            Qn, st, scratch = tb.sample_tree_batched(
                sub, algo, ld, metric, Q, eps, scratch=scratch
            )
            return (Qn, scratch), (st.work[0], st.depth.max())

        scr = tb.make_tree_scratch(algo, metric, C, K, Q0.q.dtype)
        fn = jax.jit(lambda Q: jax.lax.scan(step, (Q, scr), jnp.arange(n_steps)))
        out = fn(Q0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        _, (work, maxd) = fn(Q0)
        jax.block_until_ready(work)
        secs = time.perf_counter() - t0
        leaves = float(np.asarray(work, np.float64).mean())
        ms = 1e3 * secs / n_steps
        print(f"max_depth={md:2d}: {ms:7.3f} ms/transition  "
              f"leaf-iters~{leaves:6.1f}  maxdepth~{float(np.asarray(maxd, np.float64).mean()):.1f}")


if __name__ == "__main__":
    main()
