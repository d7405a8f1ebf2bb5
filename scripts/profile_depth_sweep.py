"""Separate per-transition / per-doubling / per-leaf costs of the batch-native
driver by sweeping eps (tree depth) and regressing wall time per transition
on (1, doublings, leaf iters). TPU-only timing aid."""

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
    algo = NUTS()

    key = jax.random.PRNGKey(0)
    q0 = jnp.asarray(
        np.random.default_rng(0).multivariate_normal(np.zeros(K), cov, size=C),
        jnp.float32,
    )
    Q0 = jax.vmap(lambda q: evaluate(ld, q))(q0)

    def loop(eps):
        def step(carry, i):
            Q, scratch = carry
            sub = jax.random.fold_in(key, i)
            Qn, st, scratch = tb.sample_tree_batched(
                sub, algo, ld, metric, Q, eps, scratch=scratch
            )
            return (Qn, scratch), (st.work[0], st.depth.max())

        scr = tb.make_tree_scratch(algo, metric, C, K, Q0.q.dtype)
        return jax.jit(
            lambda Q: jax.lax.scan(step, (Q, scr), jnp.arange(n_steps))
        )

    rows = []
    for eps in [1.4, 0.9, 0.7, 0.45, 0.3, 0.18, 0.1]:
        fn = loop(jnp.float32(eps))
        out = fn(Q0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        _, (work, maxdepth) = fn(Q0)
        jax.block_until_ready(work)
        secs = time.perf_counter() - t0
        leaves = float(np.asarray(work, np.float64).mean())
        # doublings per transition == max depth over lanes + 1-ish; use the
        # max-depth stat (all lanes aligned when eps is uniform)
        dbl = float(np.asarray(maxdepth, np.float64).mean()) + 1
        ms = 1e3 * secs / n_steps
        rows.append((eps, ms, dbl, leaves))
        print(f"eps={eps:5.2f}: {ms:7.3f} ms/transition  "
              f"doublings~{dbl:4.1f}  leaf-iters~{leaves:6.1f}")

    A = np.array([[1.0, r[2], r[3]] for r in rows])
    y = np.array([r[1] for r in rows])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    print(
        f"\nfit: ms/transition = {coef[0]:.3f} "
        f"+ {coef[1]:.3f}*doublings + {coef[2]:.4f}*leaves"
        f"  (per-leaf {1e3 * coef[2]:.1f} us, per-doubling {1e3 * coef[1]:.0f} us, "
        f"per-transition {1e3 * coef[0]:.0f} us)"
    )


if __name__ == "__main__":
    main()
