"""Proof-grade exact-equivalence gate for the aligned wavefront driver.

With injected randomness indexed by each lane's OWN counters (transition,
doubling, leaf — :class:`dynamichmc_tpu.tree_wavefront.WavefrontNoise`), a
wavefront run is fully deterministic and consumes exactly the same draws per
transition as the synchronized batch-native driver fed the matching
:class:`~dynamichmc_tpu.tree.TreeNoise` stacks. Both drivers share the same
batched float kernels (``_leapfrog_b``, ``make_tau_ops``), so a C=1 wavefront
run must reproduce the batch-native chain exactly — positions equal up to
last-bit XLA reassociation drift, per-transition step counts summing to the
same totals, identical divergence / max-depth counts. The batch-native driver is pinned to the per-chain fast
driver (tests/test_equivalence_batched.py), which is pinned to the generic
oracle carrying the detailed-balance proof (tests/test_trees.py) — closing
the trust chain for the wavefront's aligned-start merge logic too.

A lane-isolation gate (C=3 vs three C=1 runs) checks that the wavefront's
per-lane alignment waits and completion masking never leak across lanes.
"""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu.hamiltonian import evaluate
from dynamichmc_tpu.nuts import NUTS
from dynamichmc_tpu.stepsize import FixedStepsize
from dynamichmc_tpu.tree import TreeNoise
from dynamichmc_tpu.tree_batched import sample_tree_batched
from dynamichmc_tpu.tree_wavefront import (
    WavefrontNoise,
    make_wavefront_stage_driver,
    wavefront_init,
)

from test_equivalence_batched import build_case

KEY = jax.random.PRNGKey(0)  # never consumed: all randomness is injected


def draw_wavefront_noise(seed, T, max_depth, K, metric, C):
    rng = np.random.RandomState(seed)
    L = 1 << (max_depth - 1)
    z = jnp.asarray(rng.randn(T, C, K))
    from dynamichmc_tpu.metric import DiagonalMetric

    if isinstance(metric, DiagonalMetric):
        p = z * metric.w_diag
    else:
        p = jnp.einsum("tck,jk->tcj", z, metric.w)
    dirs = jnp.asarray(
        rng.randint(0, 2**32, size=(T, C), dtype=np.uint64).astype(np.uint32)
    )
    gumbel = jnp.asarray(rng.gumbel(size=(T, max_depth, L, C)))
    expo = jnp.asarray(rng.exponential(size=(T, max_depth, C)))
    return WavefrontNoise(p=p, dirs=dirs, gumbel=gumbel, expo=expo)


def run_wavefront(model, metric, q0, eps, T, max_depth, nz: WavefrontNoise,
                  depth_limit=None, tail_steps=None):
    """T transitions per lane through the wavefront driver; returns the final
    carry (aggregates + final positions)."""
    C = q0.shape[0]
    algo = NUTS(max_depth=max_depth)
    adaptation = FixedStepsize()
    stage = make_wavefront_stage_driver(
        model, algo, adaptation, use_welford=False, noise=nz
    )
    Q0 = jax.vmap(lambda q: evaluate(model, q))(q0)
    da0 = adaptation.init(jnp.full((C,), eps, Q0.q.dtype))
    carry = wavefront_init(Q0, metric, da0, jnp.zeros(()), max_depth)
    dl = None if depth_limit is None else jnp.int32(depth_limit)
    ts = None if tail_steps is None else jnp.int32(tail_steps)
    out, all_done = jax.jit(
        lambda c: stage(KEY, metric, c, jnp.int32(T), jnp.int32(10**9), dl,
                        ts)
    )(carry)
    assert bool(all_done)
    return out


def run_batched_reference(model, metric, q0, eps, T, max_depth, nz,
                          depth_limit=None, depth_limit_seq=None):
    """The same T transitions through the batch-native driver (chained).

    ``depth_limit_seq``: optional (T,) int32 per-transition depth limits
    (0 = unclamped) — the reference for the wavefront TAIL clamp, whose
    per-lane limit flips at the lane's step counter."""
    algo = NUTS(max_depth=max_depth)
    C = q0.shape[0]
    Q0 = jax.vmap(lambda q: evaluate(model, q))(q0)
    if depth_limit_seq is not None:
        dl_seq = jnp.asarray(depth_limit_seq, jnp.int32)
    else:
        dl_scalar = (
            jnp.int32(0) if depth_limit is None else jnp.int32(depth_limit)
        )
        dl_seq = jnp.full((T,), dl_scalar, jnp.int32)

    def step(Q, inp):
        p_t, d_t, g_t, e_t, dl_t = inp
        Qn, stats = sample_tree_batched(
            KEY, algo, model, metric, Q,
            jnp.full((C,), eps, Q.q.dtype),
            directions=d_t, p=p_t, noise=TreeNoise(g_t, e_t),
            depth_limit=dl_t,
        )
        return Qn, stats

    Qf, stats = jax.lax.scan(
        step, Q0, (nz.p, nz.dirs, nz.gumbel, nz.expo, dl_seq)
    )
    return Qf, stats


CASES_FAST = [
    ("std4", "diag", 1.5),  # turning-rich
    ("corr5", "dense", 2.2),  # divergence-rich
]
CASES_SLOW = [
    ("std4", "identity", 0.6),
    ("corr5", "dense", 0.5),
]


@pytest.mark.parametrize(
    "model_key,metric_key,eps",
    [pytest.param(*c) for c in CASES_FAST]
    + [pytest.param(*c, marks=pytest.mark.slow) for c in CASES_SLOW],
)
def test_wavefront_equals_batched_c1(model_key, metric_key, eps):
    T, max_depth = 64, 6
    model, metric, K = build_case(model_key, metric_key)
    nz = draw_wavefront_noise(
        zlib.crc32(f"wf/{model_key}/{metric_key}/{eps}".encode()),
        T, max_depth, K, metric, C=1,
    )
    q0 = jnp.asarray(np.random.RandomState(5).randn(1, K))

    wf = run_wavefront(model, metric, q0, eps, T, max_depth, nz)
    Qf, stats = run_batched_reference(model, metric, q0, eps, T, max_depth, nz)

    label = f"{model_key}/{metric_key}/eps={eps}"
    # shared float kernels: positions agree to last-bit reassociation drift
    # (XLA fuses the two programs differently; 64 chained transitions amplify
    # ~1e-16 to ~1e-15 at most — integer observables below remain EXACT)
    np.testing.assert_allclose(
        np.asarray(wf["Q"].q), np.asarray(Qf.q), rtol=1e-12, atol=1e-12,
        err_msg=f"{label}: final q",
    )
    np.testing.assert_array_equal(
        np.asarray(wf["steps_total"]),
        np.asarray(stats.steps).sum(0),
        err_msg=f"{label}: total leapfrog steps",
    )
    np.testing.assert_array_equal(
        np.asarray(wf["div"]),
        np.asarray(stats.is_divergent).sum(0),
        err_msg=f"{label}: divergence count",
    )
    np.testing.assert_array_equal(
        np.asarray(wf["maxd"]),
        np.asarray(stats.reached_max_depth).sum(0),
        err_msg=f"{label}: max-depth count",
    )
    np.testing.assert_allclose(
        np.asarray(wf["acc_sum"]),
        np.asarray(stats.acceptance_rate).sum(0),
        rtol=1e-12, err_msg=f"{label}: summed acceptance",
    )


@pytest.mark.parametrize(
    "depth_limit,eps",
    [(2, 0.6), (4, 0.15)],  # eps small enough that the clamp binds
)
def test_wavefront_clamped_equals_batched_c1(depth_limit, eps):
    """The wavefront depth clamp (stage ``depth_limit`` operand) must match
    the batch-native driver run with the same ``depth_limit`` draw-for-draw
    — the exact-equivalence treatment of the warmup depth clamp."""
    T, max_depth = 48, 6
    model, metric, K = build_case("std4", "identity")
    nz = draw_wavefront_noise(
        zlib.crc32(f"wf-clamp/{depth_limit}".encode()),
        T, max_depth, K, metric, C=1,
    )
    q0 = jnp.asarray(np.random.RandomState(7).randn(1, K))

    wf = run_wavefront(
        model, metric, q0, eps, T, max_depth, nz, depth_limit=depth_limit
    )
    Qf, stats = run_batched_reference(
        model, metric, q0, eps, T, max_depth, nz, depth_limit=depth_limit
    )
    np.testing.assert_allclose(
        np.asarray(wf["Q"].q), np.asarray(Qf.q), rtol=1e-12, atol=1e-12,
        err_msg="clamped final q",
    )
    np.testing.assert_array_equal(
        np.asarray(wf["steps_total"]), np.asarray(stats.steps).sum(0),
        err_msg="clamped total leapfrog steps",
    )
    np.testing.assert_array_equal(
        np.asarray(wf["maxd"]),
        np.asarray(stats.reached_max_depth).sum(0),
        err_msg="clamped max-depth (clamp-hit) count",
    )
    # the clamp must actually bind in this regime, and cap the step totals
    assert int(np.asarray(wf["maxd"])[0]) > 0
    assert int(np.asarray(stats.depth).max()) <= depth_limit


def test_wavefront_tail_clamp_equals_batched_c1():
    """Round 4: the per-lane TAIL clamp (stage ``tail_steps`` operand —
    clamp only each lane's first `tail` transitions) must match the
    batch-native driver run with the equivalent per-transition
    depth-limit sequence draw-for-draw."""
    T, max_depth, clamp, tail = 48, 6, 2, 20
    eps = 0.3  # small enough that the clamp binds while it is active
    model, metric, K = build_case("std4", "identity")
    nz = draw_wavefront_noise(
        zlib.crc32(b"wf-tail-clamp"), T, max_depth, K, metric, C=1,
    )
    q0 = jnp.asarray(np.random.RandomState(11).randn(1, K))

    wf = run_wavefront(
        model, metric, q0, eps, T, max_depth, nz,
        depth_limit=clamp, tail_steps=tail,
    )
    dl_seq = np.where(np.arange(T) < tail, clamp, 0).astype(np.int32)
    Qf, stats = run_batched_reference(
        model, metric, q0, eps, T, max_depth, nz, depth_limit_seq=dl_seq
    )
    np.testing.assert_allclose(
        np.asarray(wf["Q"].q), np.asarray(Qf.q), rtol=1e-12, atol=1e-12,
        err_msg="tail-clamped final q",
    )
    np.testing.assert_array_equal(
        np.asarray(wf["steps_total"]), np.asarray(stats.steps).sum(0),
        err_msg="tail-clamped total leapfrog steps",
    )
    np.testing.assert_array_equal(
        np.asarray(wf["maxd"]),
        np.asarray(stats.reached_max_depth).sum(0),
        err_msg="tail-clamped max-depth count",
    )
    d = np.asarray(stats.depth)
    # the clamp binds in the head and RELEASES in the tail
    assert int(d[:tail].max()) <= clamp
    assert int(d[tail:].max()) > clamp


def test_wavefront_lane_isolation():
    """C=3 with per-lane noise == three C=1 wavefront runs."""
    T, max_depth, C = 48, 6, 3
    model, metric, K = build_case("corr5", "dense")
    eps = 1.0
    nz = draw_wavefront_noise(23, T, max_depth, K, metric, C=C)
    q0 = jnp.asarray(np.random.RandomState(6).randn(C, K))

    full = run_wavefront(model, metric, q0, eps, T, max_depth, nz)
    for c in range(C):
        nz_c = WavefrontNoise(
            p=nz.p[:, c : c + 1], dirs=nz.dirs[:, c : c + 1],
            gumbel=nz.gumbel[..., c : c + 1], expo=nz.expo[..., c : c + 1],
        )
        one = run_wavefront(
            model, metric, q0[c : c + 1], eps, T, max_depth, nz_c
        )
        np.testing.assert_allclose(
            np.asarray(one["Q"].q)[0], np.asarray(full["Q"].q)[c],
            rtol=1e-12, atol=1e-12, err_msg=f"lane {c}: final q",
        )
        np.testing.assert_array_equal(
            np.asarray(one["steps_total"])[0],
            np.asarray(full["steps_total"])[c],
            err_msg=f"lane {c}: steps",
        )
        np.testing.assert_array_equal(
            np.asarray(one["div"])[0], np.asarray(full["div"])[c],
            err_msg=f"lane {c}: divergences",
        )
