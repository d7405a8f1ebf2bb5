"""Performance tracing and kernel micro-benchmarks.

The reference has no built-in profiling and points users at language-standard
tools (/root/reference/README.md:19); the TPU-native equivalents are
``jax.profiler`` traces (viewable in TensorBoard/XProf) and wall-clock kernel
benchmarking with compile-time separation. The numerical trajectory tracers
live in diagnostics.py (explore_log_acceptance_ratios, leapfrog_trajectory).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dynamichmc_tpu_trace"):
    """Capture a device trace for everything inside the context.

    View with TensorBoard's profile plugin / xprof:
        with profiling.trace("/tmp/tr"):
            run_chains(...)
    """
    with jax.profiler.trace(log_dir):
        yield log_dir


def benchmark(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 2,
    name: Optional[str] = None,
    **kwargs,
):
    """Wall-clock a jitted callable with compile separated from steady state.

    Returns a dict with compile seconds, per-iteration seconds, and the last
    output. Blocks on all output leaves each iteration.
    """
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    first_call_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    per_iter = (time.perf_counter() - t0) / iters
    result = {
        "name": name or getattr(fn, "__name__", "fn"),
        # the first call = trace + compile + ONE execution; subtracting a
        # steady-state iteration isolates the compile cost (a ~12 s dispatch
        # over a ~4 s compile would otherwise overstate compile 4x)
        "compile_seconds": max(first_call_s - per_iter, 0.0),
        "first_call_seconds": first_call_s,
        "seconds_per_iteration": per_iter,
        "output": out,
    }
    return result


def transition_throughput(
    ld,
    n_chains: int = 1024,
    eps: float = 0.2,
    iters: int = 5,
    dtype=None,
    key=None,
):
    """Measure NUTS transition throughput (leapfrog gradient evals/sec) for a
    model at a given chain batch — the per-kernel benchmark for the hot path."""
    import jax.numpy as jnp
    import numpy as np

    from .hamiltonian import evaluate
    from .metric import identity_metric
    from .nuts import NUTS, sample_tree

    dtype = dtype or jnp.float32
    key = jax.random.PRNGKey(0) if key is None else key
    metric = identity_metric(ld.dim, dtype=dtype)
    q = jax.random.normal(key, (n_chains, ld.dim), dtype) * 0.1
    Q = jax.jit(jax.vmap(lambda qq: evaluate(ld, qq)))(q)
    keys = jax.random.split(key, n_chains)
    f = jax.jit(
        jax.vmap(lambda k, Q1: sample_tree(k, NUTS(), ld, metric, Q1, eps))
    )
    res = benchmark(f, keys, Q, iters=iters, name="nuts_transition")
    steps = int(np.asarray(res["output"][1].steps, np.int64).sum())
    res["grad_evals_per_second"] = steps / res["seconds_per_iteration"]
    del res["output"]
    return res
