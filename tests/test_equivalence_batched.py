"""Proof-grade exact-equivalence gate for the batch-native driver.

With injected randomness (momenta, direction bits, per-leaf Gumbel draws,
per-doubling Exponential draws — :class:`dynamichmc_tpu.tree.TreeNoise`), a
NUTS transition is fully deterministic. This pins ``sample_tree_batched`` at
C=1 EXACTLY against the per-chain fast driver over long chained transition
sequences across eps/model/metric sweeps. The fast driver is itself pinned to
the generic progressive-merge oracle (tests/test_fast_driver.py), which
carries the exhaustive detailed-balance proof (tests/test_trees.py, porting
/root/reference/test/test_trees.jl:171-262) — so this closes the trust chain
from the production batched driver back to the detailed-balance enumeration.

A second gate checks lane ISOLATION: a C=3 batched run with per-lane noise
must equal three independent C=1 runs (termination masking of one lane must
never perturb another).

Any perturbation of the batched driver's Gumbel-argmax proposal logic, merge
stack, turn checks, or termination bookkeeping fails these gates on integer
quantities (depth/steps/termination positions) or on the exact proposal
positions.
"""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu.hamiltonian import evaluate
from dynamichmc_tpu.metric import dense_metric, diagonal_metric, identity_metric
from dynamichmc_tpu.models import mvnormal, std_normal
from dynamichmc_tpu.nuts import NUTS, sample_tree
from dynamichmc_tpu.tree import TreeNoise
from dynamichmc_tpu.tree_batched import sample_tree_batched

KEY = jax.random.PRNGKey(0)  # never consumed: all randomness is injected


def draw_all_noise(seed, T, max_depth, K, metric, C=1):
    """Pre-draw every random input for T transitions (numpy-side)."""
    rng = np.random.RandomState(seed)
    L = 1 << (max_depth - 1)
    z = jnp.asarray(rng.randn(T, C, K))
    # p ~ N(0, M): apply W to standard normals, identically for both drivers
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
    # segment: (T, ...) -> (T // SEG, SEG, ...)
    def seg_shape(x):
        return x.reshape((x.shape[0] // SEG, SEG) + x.shape[1:])

    q0s = jnp.asarray(2.0 * rng.randn(T // SEG, C, K))
    return q0s, seg_shape(p), seg_shape(dirs), seg_shape(gumbel), seg_shape(expo)


# The two drivers are not BITWISE identical (the dense-metric joint density is
# computed as dot(p, M^-1 @ p) per-chain vs sum(p * (p @ M^-1)) batched —
# equal values, different rounding), and Hamiltonian dynamics amplifies last-
# bit differences exponentially along a chained trajectory. The transitions
# therefore run in SEGMENTS of 8 chained steps from fresh start positions:
# within a segment the drift stays ~1e-13, so every discrete decision is
# robust and float tolerances stay proof-tight, while segment starts (drawn
# from the case's own noise stream) still cover the state space.
SEG = 8


def run_fast_chain(model, metric, q0s, eps, p, dirs, gumbel, expo, max_depth):
    """Segmented chained transitions through the per-chain fast driver.

    q0s: (Nseg, K); noise arrays carry a leading (Nseg, SEG) shape."""
    algo = NUTS(max_depth=max_depth)

    def seg(_, seg_inp):
        q0, p_s, d_s, g_s, e_s = seg_inp
        Q0 = evaluate(model, q0)

        def step(Q, inp):
            p_t, d_t, g_t, e_t = inp
            Qn, stats = sample_tree(
                KEY, algo, model, metric, Q, eps,
                p=p_t, directions=d_t, fast=True, noise=TreeNoise(g_t, e_t),
            )
            return Qn, (Qn.q, stats)

        _, out = jax.lax.scan(step, Q0, (p_s, d_s, g_s, e_s))
        return None, out

    inputs = (q0s, p[:, :, 0], dirs[:, :, 0], gumbel[..., 0], expo[..., 0])
    _, (qs, stats) = jax.lax.scan(seg, None, inputs)
    return qs, stats


def run_batched_chain(model, metric, q0s, eps, p, dirs, gumbel, expo, max_depth,
                      driver=sample_tree_batched):
    """Same segmented transitions through a batch-native driver (any C).

    q0s: (Nseg, C, K); noise arrays lead with (Nseg, SEG, ...)."""
    algo = NUTS(max_depth=max_depth)
    C = q0s.shape[1]

    def seg(_, seg_inp):
        q0, p_s, d_s, g_s, e_s = seg_inp
        Q0 = jax.vmap(lambda q: evaluate(model, q))(q0)

        def step(Q, inp):
            p_t, d_t, g_t, e_t = inp
            Qn, stats = driver(
                KEY, algo, model, metric, Q, jnp.broadcast_to(eps, (C,)),
                directions=d_t, p=p_t, noise=TreeNoise(g_t, e_t),
            )
            return Qn, (Qn.q, stats)

        _, out = jax.lax.scan(step, Q0, (p_s, d_s, g_s, e_s))
        return None, out

    _, (qs, stats) = jax.lax.scan(seg, None, (q0s, p, dirs, gumbel, expo))
    return qs, stats


# Fast-tier subset: one case per termination regime (max-depth-rich,
# turning-rich, divergence-rich on the dense path). The FULL sweep runs in
# the slow tier; the fast subset keeps the proof-grade gate on every change.
FAST_CASES = [
    ("std4", "identity", 0.02),  # deep trees: max-depth-rich
    ("std4", "diag", 1.2),  # turning-rich
    ("corr5", "dense", 2.5),  # divergence/turning-rich
]
SLOW_CASES = [
    ("std4", "identity", 0.5),
    ("std4", "identity", 1.9),
    ("corr5", "dense", 0.4),
    ("corr5", "diag", 0.25),
]
CASES = FAST_CASES + SLOW_CASES


def build_case(model_key, metric_key):
    if model_key == "std4":
        K = 4
        model = std_normal(K)
    else:
        K = 5
        rng = np.random.RandomState(3)
        a = rng.randn(K, K)
        cov = a @ a.T + 0.5 * np.eye(K)
        model = mvnormal(np.zeros(K), cov)
    if metric_key == "identity":
        metric = identity_metric(K, dtype=jnp.float64)
    elif metric_key == "diag":
        rng = np.random.RandomState(7)
        metric = diagonal_metric(jnp.asarray(0.3 + rng.rand(K)))
    else:
        rng = np.random.RandomState(11)
        b = rng.randn(K, K)
        m_inv = b @ b.T + K * np.eye(K)
        metric = dense_metric(jnp.asarray(m_inv / K))
    return model, metric, K


def assert_chains_equal(res_fast, res_batched, label, atol=1e-10, lane=0):
    """Compare per-chain results (Nseg, SEG, ...) against batched lane
    ``lane`` of (Nseg, SEG, C, ...)."""
    q_f, s_f = res_fast
    q_b, s_b = res_batched
    # integer traversal observables: EXACT
    for field in ("depth", "steps", "term_left", "term_right", "directions"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s_f, field)),
            np.asarray(getattr(s_b, field))[:, :, lane],
            err_msg=f"{label}: {field} mismatch",
        )
    # proposal positions and densities: same float path up to assoc. rounding
    np.testing.assert_allclose(
        np.asarray(q_f), np.asarray(q_b)[:, :, lane], rtol=0, atol=atol,
        err_msg=f"{label}: proposal positions",
    )
    np.testing.assert_allclose(
        np.asarray(s_f.logdensity), np.asarray(s_b.logdensity)[:, :, lane],
        rtol=1e-10, atol=1e-10, err_msg=f"{label}: proposal pi",
    )
    np.testing.assert_allclose(
        np.asarray(s_f.acceptance_rate),
        np.asarray(s_b.acceptance_rate)[:, :, lane],
        rtol=1e-10, atol=1e-13, err_msg=f"{label}: acceptance",
    )


_batched_cache = {}


def _run_case_batched(model_key, metric_key, eps, T=400, max_depth=6):
    """Batched-driver run per case, cached so the termination-coverage test
    reuses the equivalence tests' results instead of recomputing the sweep."""
    key = (model_key, metric_key, eps)
    if key not in _batched_cache:
        model, metric, K = build_case(model_key, metric_key)
        q0s, p, dirs, gumbel, expo = draw_all_noise(
            zlib.crc32(f"{model_key}/{metric_key}/{eps}".encode()),
            T, max_depth, K, metric, C=1,
        )
        _batched_cache[key] = run_batched_chain(
            model, metric, q0s, eps, p, dirs, gumbel, expo, max_depth
        )
    return _batched_cache[key]


@pytest.mark.parametrize(
    "model_key,metric_key,eps",
    [pytest.param(*c) for c in FAST_CASES]
    + [pytest.param(*c, marks=pytest.mark.slow) for c in SLOW_CASES],
)
def test_batched_equals_fast_c1(model_key, metric_key, eps):
    T, max_depth = 400, 6
    model, metric, K = build_case(model_key, metric_key)
    q0s, p, dirs, gumbel, expo = draw_all_noise(
        zlib.crc32(f"{model_key}/{metric_key}/{eps}".encode()),
        T, max_depth, K, metric, C=1,
    )
    label = f"{model_key}/{metric_key}/eps={eps}"

    res_f = run_fast_chain(
        model, metric, q0s[:, 0], eps, p, dirs, gumbel, expo, max_depth
    )
    res_b = _run_case_batched(model_key, metric_key, eps)
    assert_chains_equal(res_f, res_b, label)


@pytest.mark.slow
def test_sweep_covers_all_terminations():
    """The equivalence sweep is only proof-grade if it drives the drivers
    through every termination path: turning, divergence, and max-depth."""
    seen = set()
    for model_key, metric_key, eps in CASES:
        _, stats = _run_case_batched(model_key, metric_key, eps)
        if bool(np.asarray(stats.is_divergent).any()):
            seen.add("divergent")
        if bool(np.asarray(stats.is_turning).any()):
            seen.add("turning")
        if bool(np.asarray(stats.reached_max_depth).any()):
            seen.add("max_depth")
    assert seen == {"divergent", "turning", "max_depth"}, seen


def test_batched_lane_isolation():
    """C=3 with per-lane noise == three C=1 runs: one lane's termination or
    divergence must never leak into another lane's trajectory."""
    T, max_depth, C = 200, 6, 3
    model, metric, K = build_case("corr5", "dense")
    eps = 1.2  # mixed shallow/deep/divergent behavior across lanes
    q0s, p, dirs, gumbel, expo = draw_all_noise(17, T, max_depth, K, metric, C=C)

    q_all, s_all = run_batched_chain(
        model, metric, q0s, eps, p, dirs, gumbel, expo, max_depth
    )
    for c in range(C):
        q_c, s_c = run_batched_chain(
            model, metric, q0s[:, c : c + 1], eps,
            p[:, :, c : c + 1], dirs[:, :, c : c + 1],
            gumbel[..., c : c + 1], expo[..., c : c + 1], max_depth,
        )
        for field in ("depth", "steps", "term_left", "term_right"):
            np.testing.assert_array_equal(
                np.asarray(getattr(s_c, field))[:, :, 0],
                np.asarray(getattr(s_all, field))[:, :, c],
                err_msg=f"lane {c}: {field}",
            )
        np.testing.assert_allclose(
            np.asarray(q_c)[:, :, 0], np.asarray(q_all)[:, :, c],
            rtol=0, atol=1e-10, err_msg=f"lane {c}: positions",
        )


def test_depth_limit_clamp():
    """The runtime depth clamp caps doublings below the static max_depth:
    depth <= limit everywhere, termination reads max-depth for clamped
    trees, and limit == max_depth is exactly the unclamped driver."""
    model, metric, K = build_case("std4", "identity")
    C, T, max_depth = 32, 40, 6
    rng = np.random.RandomState(2)
    q0 = jnp.asarray(rng.randn(C, K))
    Q0 = jax.vmap(lambda q: evaluate(model, q))(q0)
    algo = NUTS(max_depth=max_depth)
    eps = jnp.full((C,), 0.12)

    def chain(limit):
        def step(Q, i):
            Qn, st = sample_tree_batched(
                jax.random.fold_in(KEY, i), algo, model, metric, Q, eps,
                depth_limit=limit,
            )
            return Qn, st
        return jax.jit(lambda: jax.lax.scan(step, Q0, jnp.arange(T)))()

    _, st2 = chain(jnp.int32(2))
    assert int(np.asarray(st2.depth).max()) <= 2
    # clamped shallow trees terminate as "reached max depth", not turning
    deep = np.asarray(st2.depth) == 2
    assert np.asarray(st2.reached_max_depth)[deep].any()

    _, st_full = chain(jnp.int32(max_depth))
    _, st_none = chain(None)
    for f in ("depth", "steps", "term_left", "term_right"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_full, f)), np.asarray(getattr(st_none, f))
        )
