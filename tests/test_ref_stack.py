"""Ref-mode merge stack (jax.Ref, in-place) vs carry-threaded scratch.

The ref mode must be a pure storage change: the same slots are written
before they are read, so every transition's draws and statistics are
BITWISE identical to the carry-threaded driver — pinned here at the
transition level (dense + diagonal, multi-transition scan with the depth
clamp exercised) and end-to-end through run_chains' monolithic warmup.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dynamichmc_tpu.tree_batched as tb
from dynamichmc_tpu.hamiltonian import evaluate
from dynamichmc_tpu.metric import dense_metric, diagonal_metric
from dynamichmc_tpu.models import correlated_gaussian
from dynamichmc_tpu.nuts import NUTS

C, K, N = 48, 10, 30


def _setup(metric_kind):
    ld = correlated_gaussian(K, dtype=jnp.float32)
    cov = np.asarray(ld.cov_fn(), np.float64)
    if metric_kind == "dense":
        metric = dense_metric(jnp.asarray(cov, jnp.float32))
    else:
        metric = diagonal_metric(jnp.asarray(np.diag(cov), jnp.float32))
    q0 = jnp.asarray(
        np.random.default_rng(0).multivariate_normal(np.zeros(K), cov, size=C),
        jnp.float32,
    )
    Q0 = jax.vmap(lambda q: evaluate(ld, q))(q0)
    return ld, metric, Q0


def _run(ld, metric, Q0, ref_mode, depth_limit=None):
    algo = NUTS(max_depth=6)
    key = jax.random.PRNGKey(7)

    def prog(Q):
        if ref_mode:
            refs = tb.make_tree_stack_refs(algo, metric, C, K, jnp.float32)

            def step(Q, i):
                Qn, st = tb.sample_tree_batched(
                    jax.random.fold_in(key, i), algo, ld, metric, Q,
                    jnp.float32(0.3), stack_ref=refs, depth_limit=depth_limit,
                )
                return Qn, (Qn.q, st.depth, st.steps, st.acceptance_rate,
                            st.term_left, st.term_right)

            _, ys = jax.lax.scan(step, Q, jnp.arange(N))
            return ys

        scr = tb.make_tree_scratch(algo, metric, C, K, jnp.float32)

        def step(c, i):
            Q, scr = c
            Qn, st, scr = tb.sample_tree_batched(
                jax.random.fold_in(key, i), algo, ld, metric, Q,
                jnp.float32(0.3), scratch=scr, depth_limit=depth_limit,
            )
            return (Qn, scr), (Qn.q, st.depth, st.steps, st.acceptance_rate,
                               st.term_left, st.term_right)

        (_, _), ys = jax.lax.scan(step, (Q, scr), jnp.arange(N))
        return ys

    return jax.jit(prog)(Q0)


@pytest.mark.parametrize("metric_kind", ["dense", "diagonal"])
def test_bitwise_equal_transitions(metric_kind):
    ld, metric, Q0 = _setup(metric_kind)
    a = _run(ld, metric, Q0, ref_mode=False)
    b = _run(ld, metric, Q0, ref_mode=True)
    for name, xa, xb in zip(
        ["q", "depth", "steps", "acc", "term_left", "term_right"], a, b
    ):
        assert np.array_equal(np.asarray(xa), np.asarray(xb)), (
            metric_kind, name)


def test_bitwise_equal_with_depth_clamp():
    ld, metric, Q0 = _setup("dense")
    a = _run(ld, metric, Q0, ref_mode=False, depth_limit=jnp.int32(2))
    b = _run(ld, metric, Q0, ref_mode=True, depth_limit=jnp.int32(2))
    for xa, xb in zip(a, b):
        assert np.array_equal(np.asarray(xa), np.asarray(xb))


def test_exclusive_args():
    ld, metric, Q0 = _setup("diagonal")
    algo = NUTS(max_depth=4)
    scr = tb.make_tree_scratch(algo, metric, C, K, jnp.float32)
    with pytest.raises(ValueError, match="not both"):
        tb.sample_tree_batched(
            jax.random.PRNGKey(0), algo, ld, metric, Q0, 0.3,
            scratch=scr, stack_ref=scr,
        )


def test_run_chains_end_to_end_bitwise(monkeypatch):
    """run_chains (monolithic warmup + chunked sampling) produces bitwise
    identical draws with the ref stack enabled."""
    from dynamichmc_tpu.parallel import run_chains
    from dynamichmc_tpu.warmup import default_warmup_stages

    ld = correlated_gaussian(6, dtype=jnp.float32)
    stages = default_warmup_stages(
        metric_kind="diagonal", init_steps=20, middle_steps=20,
        doubling_stages=2, terminating_steps=20, pooled=True,
    )

    def go():
        return run_chains(
            jax.random.PRNGKey(11), ld, n_chains=16, n_samples=40,
            warmup_stages=stages, warmup_depth_clamp=3,
        )

    monkeypatch.setattr(tb, "_USE_REF_STACK", False)
    res_a = go()
    monkeypatch.setattr(tb, "_USE_REF_STACK", True)
    res_b = go()
    assert np.array_equal(np.asarray(res_a.positions),
                          np.asarray(res_b.positions))
    assert np.array_equal(np.asarray(res_a.eps), np.asarray(res_b.eps))
