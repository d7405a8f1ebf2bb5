"""Proof-grade exact-equivalence gate for the epoch-specialized wavefront
SAMPLING driver (tree_wavefront_epoch.py).

With injected randomness indexed by each lane's OWN counters (transition,
doubling, leaf), an epoch-wavefront run is fully deterministic and consumes
exactly the same draws per transition as the synchronized batch-native driver
fed matching TreeNoise stacks. Both share the batched float kernels
(``_leapfrog_b``, ``make_tau_ops``), so the per-DRAW outputs must agree:
positions and logdensities to last-bit reassociation drift, and the integer /
statistics fields (depth, steps, termination encoding, directions,
acceptance) exactly. The batch-native driver is pinned to the per-chain fast
driver (tests/test_equivalence_batched.py), which carries the
detailed-balance enumeration (tests/test_trees.py) — closing the trust chain
for the epoch driver's deferred-completion and ring-recording machinery.

A lane-isolation gate (C=3 vs three C=1 runs) checks that per-lane restart
waits, ring blocking, and completion masking never leak across lanes, and a
small-ring run pins the ring-full back-pressure path against the unlimited
case.
"""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu.hamiltonian import evaluate
from dynamichmc_tpu.nuts import NUTS
from dynamichmc_tpu.tree import TreeNoise
from dynamichmc_tpu.tree_batched import sample_tree_batched
from dynamichmc_tpu.tree_wavefront_epoch import (
    EpochNoise,
    epoch_sampling_finish,
    epoch_sampling_init,
    make_epoch_sampling_driver,
)

from test_equivalence_batched import build_case

KEY = jax.random.PRNGKey(0)  # never consumed: all randomness is injected


def draw_epoch_noise(seed, T, max_depth, K, metric, C):
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
    return EpochNoise(p=p, dirs=dirs, gumbel=gumbel, expo=expo)


def run_epoch(model, metric, q0, eps, T, max_depth, nz: EpochNoise, ring=8):
    C = q0.shape[0]
    algo = NUTS(max_depth=max_depth)
    Q0 = jax.vmap(lambda q: evaluate(model, q))(q0)
    eps_b = jnp.full((C,), eps, Q0.q.dtype)
    carry = epoch_sampling_init(Q0, metric, T, max_depth, ring=ring)
    stage = make_epoch_sampling_driver(model, algo, T, ring=ring, noise=nz)
    out, all_done = jax.jit(
        lambda c: stage(KEY, metric, eps_b, c, jnp.int32(10**9))
    )(carry)
    assert bool(all_done)
    return jax.jit(lambda c: epoch_sampling_finish(c, T))(out)


def run_batched_reference(model, metric, q0, eps, T, max_depth, nz):
    """The same T transitions through the batch-native driver (scanned),
    with per-draw outputs in the sampling layout (C, T, ...)."""
    algo = NUTS(max_depth=max_depth)
    C = q0.shape[0]
    Q0 = jax.vmap(lambda q: evaluate(model, q))(q0)

    def step(Q, inp):
        p_t, d_t, g_t, e_t = inp
        Qn, stats = sample_tree_batched(
            KEY, algo, model, metric, Q,
            jnp.full((C,), eps, Q.q.dtype),
            directions=d_t, p=p_t, noise=TreeNoise(g_t, e_t),
        )
        return Qn, (Qn.q, Qn.logdensity, stats)

    Qf, (qs, lds, stats) = jax.lax.scan(
        step, Q0, (nz.p, nz.dirs, nz.gumbel, nz.expo)
    )
    qs = jnp.swapaxes(qs, 0, 1)
    lds = jnp.swapaxes(lds, 0, 1)
    stats = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 0, 1), stats)
    return Qf, qs, lds, stats


def assert_per_draw_equal(epoch_out, ref_out, label):
    Qe, qs_e, lds_e, st_e = epoch_out
    Qr, qs_r, lds_r, st_r = ref_out
    np.testing.assert_allclose(
        np.asarray(qs_e), np.asarray(qs_r), rtol=1e-12, atol=1e-12,
        err_msg=f"{label}: per-draw positions",
    )
    np.testing.assert_allclose(
        np.asarray(lds_e), np.asarray(lds_r), rtol=1e-12, atol=1e-12,
        err_msg=f"{label}: per-draw logdensities",
    )
    np.testing.assert_allclose(
        np.asarray(Qe.q), np.asarray(Qr.q), rtol=1e-12, atol=1e-12,
        err_msg=f"{label}: final q",
    )
    for field in ("depth", "steps", "term_left", "term_right", "directions"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_e, field)),
            np.asarray(getattr(st_r, field)),
            err_msg=f"{label}: per-draw {field}",
        )
    np.testing.assert_allclose(
        np.asarray(st_e.acceptance_rate),
        np.asarray(st_r.acceptance_rate),
        rtol=1e-12, err_msg=f"{label}: per-draw acceptance",
    )
    np.testing.assert_allclose(
        np.asarray(st_e.logdensity), np.asarray(st_r.logdensity),
        rtol=1e-12, atol=1e-12, err_msg=f"{label}: per-draw joint density",
    )


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
def test_epoch_sampling_equals_batched_c1(model_key, metric_key, eps):
    T, max_depth = 64, 6
    model, metric, K = build_case(model_key, metric_key)
    nz = draw_epoch_noise(
        zlib.crc32(f"ep/{model_key}/{metric_key}/{eps}".encode()),
        T, max_depth, K, metric, C=1,
    )
    q0 = jnp.asarray(np.random.RandomState(5).randn(1, K))
    ep = run_epoch(model, metric, q0, eps, T, max_depth, nz)
    ref = run_batched_reference(model, metric, q0, eps, T, max_depth, nz)
    assert_per_draw_equal(ep, ref, f"{model_key}/{metric_key}/eps={eps}")


def test_epoch_sampling_lane_isolation():
    """C=3 with per-lane noise == three C=1 epoch runs, per draw."""
    T, max_depth, C = 48, 6, 3
    model, metric, K = build_case("corr5", "dense")
    eps = 1.0
    nz = draw_epoch_noise(23, T, max_depth, K, metric, C=C)
    q0 = jnp.asarray(np.random.RandomState(6).randn(C, K))

    _, qs_full, lds_full, st_full = run_epoch(
        model, metric, q0, eps, T, max_depth, nz
    )
    for c in range(C):
        nz_c = EpochNoise(
            p=nz.p[:, c : c + 1], dirs=nz.dirs[:, c : c + 1],
            gumbel=nz.gumbel[..., c : c + 1], expo=nz.expo[..., c : c + 1],
        )
        _, qs_c, lds_c, st_c = run_epoch(
            model, metric, q0[c : c + 1], eps, T, max_depth, nz_c
        )
        np.testing.assert_allclose(
            np.asarray(qs_c)[0], np.asarray(qs_full)[c],
            rtol=1e-12, atol=1e-12, err_msg=f"lane {c}: draws",
        )
        np.testing.assert_array_equal(
            np.asarray(st_c.steps)[0], np.asarray(st_full.steps)[c],
            err_msg=f"lane {c}: steps",
        )
        np.testing.assert_array_equal(
            np.asarray(st_c.depth)[0], np.asarray(st_full.depth)[c],
            err_msg=f"lane {c}: depth",
        )


def test_epoch_sampling_ring_pressure():
    """ring=2 (maximum back-pressure: every lane at most 2 draws ahead)
    must produce byte-identical draws to a wide ring — blocking is pure
    scheduling."""
    T, max_depth, C = 32, 5, 4
    model, metric, K = build_case("std4", "diag")
    eps = 1.1
    nz = draw_epoch_noise(91, T, max_depth, K, metric, C=C)
    q0 = jnp.asarray(np.random.RandomState(3).randn(C, K))

    _, qs_tight, _, st_tight = run_epoch(
        model, metric, q0, eps, T, max_depth, nz, ring=2
    )
    _, qs_wide, _, st_wide = run_epoch(
        model, metric, q0, eps, T, max_depth, nz, ring=32
    )
    np.testing.assert_array_equal(np.asarray(qs_tight), np.asarray(qs_wide))
    np.testing.assert_array_equal(
        np.asarray(st_tight.steps), np.asarray(st_wide.steps)
    )
    np.testing.assert_array_equal(
        np.asarray(st_tight.term_left), np.asarray(st_wide.term_left)
    )
