"""A/B the whole-transition Pallas tree kernel (ops/pallas_tree.py) against
the XLA batch-native driver on the headline workload.

Scans PROF_DRAWS fixed-eps transitions (sampling-phase shape: no adaptation)
through both paths and reports wall, us/slot, and the ratio. Knobs:
PROF_CHAINS, PROF_DIM, PROF_DRAWS, PROF_MAX_DEPTH, PROF_EPS, PROF_METRIC
(dense|diagonal), PROF_JSON=1 for a machine-readable line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from dynamichmc_tpu.utils.cache import host_keyed_cache_dir

jax.config.update(
    "jax_compilation_cache_dir", host_keyed_cache_dir("/tmp/jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def _time(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    C = int(os.environ.get("PROF_CHAINS", 4096))
    K = int(os.environ.get("PROF_DIM", 100))
    T = int(os.environ.get("PROF_DRAWS", 128))
    md = int(os.environ.get("PROF_MAX_DEPTH", 4))
    eps = float(os.environ.get("PROF_EPS", 0.7))
    metric_kind = os.environ.get("PROF_METRIC", "dense")

    import dynamichmc_tpu.tree_batched as tb
    from dynamichmc_tpu.metric import dense_metric, diagonal_metric
    from dynamichmc_tpu.models import correlated_gaussian
    from dynamichmc_tpu.nuts import NUTS

    ld_plain = correlated_gaussian(K, dtype=jnp.float32)
    ld_kern = correlated_gaussian(K, dtype=jnp.float32, tree_kernel=True)
    cov = np.asarray(ld_plain.cov_fn(), np.float64)
    if metric_kind == "dense":
        metric = dense_metric(jnp.asarray(cov, jnp.float32))
    else:
        metric = diagonal_metric(jnp.asarray(np.diag(cov), jnp.float32))
    algo = NUTS(max_depth=md)
    key = jax.random.PRNGKey(0)
    q0 = jnp.asarray(
        np.random.default_rng(0).multivariate_normal(
            np.zeros(K), cov, size=C
        ),
        jnp.float32,
    )
    vals, grads = tb._evaluate_b(ld_plain, q0)
    from dynamichmc_tpu.hamiltonian import EvaluatedPoint

    Q0 = EvaluatedPoint(q=q0, logdensity=vals, grad=grads)

    def make_scan(ld, use_scratch):
        def step(carry, j):
            Q, scratch = carry
            sub = jax.random.fold_in(key, j)
            if use_scratch:
                Qn, st, scratch = tb.sample_tree_batched(
                    sub, algo, ld, metric, Q, eps, scratch=scratch
                )
            else:
                Qn, st = tb.sample_tree_batched(sub, algo, ld, metric, Q, eps)
            return (Qn, scratch), (st.steps, st.work)

        scr = (
            tb.make_tree_scratch(algo, metric, C, K, jnp.float32)
            if use_scratch else None
        )
        return jax.jit(
            lambda Q: jax.lax.scan(
                step, (Q, scr), jnp.arange(T, dtype=jnp.int32)
            )
        )

    rows = {}
    for name, ld, use_scratch in (
        ("xla", ld_plain, True),
        ("kernel", ld_kern, False),
    ):
        fn = make_scan(ld, use_scratch)
        wall, out = _time(fn, Q0)
        (_, _), (steps, work) = out
        steps_t = int(np.asarray(steps, np.int64).sum())
        # xla work is fleet-lockstep scalar per transition; kernel work is
        # per-block — sum of per-transition MAX over chains bounds both
        work_t = int(np.asarray(work, np.int64).max(axis=1).sum())
        rows[name] = dict(
            wall=wall,
            draws_per_s=T / wall,
            us_per_slot=wall / work_t * 1e6,
            leaves_per_draw=steps_t / (T * C),
            slots=work_t,
        )
        print(
            f"{name:>7}: {T} draws in {wall:.3f}s = {T / wall:.1f} draws/s"
            f" | {wall / work_t * 1e6:.1f} us/slot ({work_t} slots,"
            f" {steps_t / (T * C):.2f} leaves/draw)",
            file=sys.stderr,
        )

    ratio = rows["xla"]["wall"] / rows["kernel"]["wall"]
    print(f"kernel speedup: {ratio:.2f}x", file=sys.stderr)
    if int(os.environ.get("PROF_JSON", "0")):
        print(json.dumps({
            "metric": "tree_kernel_vs_xla_driver_wall",
            "config": {"chains": C, "dim": K, "draws": T, "max_depth": md,
                       "eps": eps, "metric": metric_kind,
                       "backend": jax.default_backend()},
            "xla_wall_s": round(rows["xla"]["wall"], 4),
            "kernel_wall_s": round(rows["kernel"]["wall"], 4),
            "kernel_over_xla": round(ratio, 3),
            "xla_us_per_slot": round(rows["xla"]["us_per_slot"], 1),
            "kernel_us_per_slot": round(rows["kernel"]["us_per_slot"], 1),
        }))


if __name__ == "__main__":
    main()
