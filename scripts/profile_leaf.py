"""Ablation profile of the batch-native leaf loop (tree_batched.py).

Attributes the per-leaf-iteration cost of sample_tree_batched on the headline
configuration (C chains x K-d correlated Gaussian, dense metric) by disabling
pieces of the leaf body at trace time (tree_batched._ablate) and re-timing:

  full            complete transition
  -merge          merge-stack while_loop removed
  -best           Gumbel proposal / best-leaf updates removed
  -merge-best     both removed (residual: leapfrog + wheres + loop overhead)
  leapfrog        bare batched leapfrog while_loop (the physics floor)

All ablated variants are statistically WRONG — this script is timing only.
Run on the TPU (one process at a time): python scripts/profile_leaf.py
Knobs: PROF_CHAINS, PROF_DIM, PROF_STEPS.

ATTRIBUTION CAVEAT (measured, round 5): the "-merge" ablation disables
turn DETECTION, so trees run to max depth — e.g. 65472 leaf iters vs the
full driver's 576 on the same workload. The per-iter deltas between
variants with different iteration counts therefore mix fixed/per-doubling
amortization into the "attribution" and can be wildly wrong (merge showed
150 us/iter where the true marginal is near zero). Trust the per-iter
numbers only WITHIN a fixed tree shape (the -merge* family), and use the
eps/max_depth sweep regression (scripts/profile_flat.py) for real
marginal-cost attribution.
"""

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
    eps = jnp.float32(0.7)  # near-optimal for a well-preconditioned target

    key = jax.random.PRNGKey(0)
    q0 = jnp.asarray(
        np.random.default_rng(0).multivariate_normal(
            np.zeros(K), cov, size=C
        ),
        jnp.float32,
    )
    Q0 = jax.vmap(lambda q: evaluate(ld, q))(q0)

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        return time.perf_counter() - t0, out

    def transition_loop(ablate):
        tb._ablate = frozenset(ablate)

        def step(carry, i):
            Q = carry
            sub = jax.random.fold_in(key, i)
            Qn, st = tb.sample_tree_batched(sub, algo, ld, metric, Q, eps)
            return Qn, (st.work[0], st.steps)

        def run(Q):
            return jax.lax.scan(step, Q, jnp.arange(n_steps))

        return jax.jit(run)

    results = {}
    for label, ablate in [
        ("full", ()),
        ("-merge", ("merge",)),
        ("-best", ("best",)),
        ("-merge-best", ("merge", "best")),
        ("-merge-best-stats", ("merge", "best", "stats")),
    ]:
        secs, (_, (work, steps)) = timed(transition_loop(ablate), Q0)
        iters = int(np.asarray(work, np.int64).sum())
        useful = int(np.asarray(steps, np.int64).sum())
        print(
            f"{label:>18}: {secs:7.3f}s  {iters:7d} leaf iters  "
            f"{1e6 * secs / max(iters, 1):8.1f} us/iter  "
            f"(useful slots {useful})"
        )
        results[label] = 1e6 * secs / max(iters, 1)
    tb._ablate = frozenset()

    # bare leapfrog floor: same physics, no tree machinery
    from dynamichmc_tpu.tree_batched import _Edge, _leapfrog_b

    n_lf = 512

    def lf_loop(Q):
        edge = _Edge(q=Q.q, p=jnp.zeros_like(Q.q), grad=Q.grad, ld=Q.logdensity)
        eps_s = jnp.full((C,), eps)

        def body(i, e):
            return _leapfrog_b(ld, metric, e, eps_s)

        return jax.lax.fori_loop(0, n_lf, body, edge)

    secs, _ = timed(jax.jit(lf_loop), Q0)
    print(f"{'leapfrog':>18}: {secs:7.3f}s  {n_lf:7d} leaf iters  "
          f"{1e6 * secs / n_lf:8.1f} us/iter")

    print(
        f"\nattribution (us/iter): merge={results['full'] - results['-merge']:.1f} "
        f"best={results['full'] - results['-best']:.1f} "
        f"stats={results['-merge-best'] - results['-merge-best-stats']:.1f} "
        f"residual-minus-physics="
        f"{results['-merge-best-stats'] - 1e6 * secs / n_lf:.1f}"
    )


if __name__ == "__main__":
    main()
