"""Integration gates for the epoch-wavefront sampling path: chunked-dispatch
bitwise reproducibility (the engine's watchdog-safe budget loop), the
run_chains wiring (statistics shapes, draw_sink streaming), and the
validation surface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu.hamiltonian import evaluate
from dynamichmc_tpu.logdensity import from_logdensity_fn
from dynamichmc_tpu.metric import identity_metric
from dynamichmc_tpu.nuts import NUTS
from dynamichmc_tpu.tree_wavefront_epoch import (
    epoch_sampling_finish,
    epoch_sampling_init,
    make_epoch_sampling_driver,
)


def _setup(C=6, K=3, T=24):
    ld = from_logdensity_fn(K, lambda q: -0.5 * q @ q)
    metric = identity_metric(K)
    q0 = jnp.asarray(np.random.RandomState(0).randn(C, K))
    Q0 = jax.vmap(lambda q: evaluate(ld, q))(q0)
    eps = jnp.full((C,), 0.9)
    return ld, metric, Q0, eps


def test_epoch_chunked_dispatch_bitwise():
    """Slot keys fold the global counter: many small budgeted dispatches
    must be byte-identical to one big dispatch (engine.execute's retry /
    chunking contract)."""
    T, md = 24, 6
    ld, metric, Q0, eps = _setup(T=T)
    algo = NUTS(max_depth=md)
    stage = jax.jit(make_epoch_sampling_driver(ld, algo, T, ring=4))
    key = jax.random.PRNGKey(3)

    carry = epoch_sampling_init(Q0, metric, T, md, ring=4)
    one, done = stage(key, metric, eps, carry, jnp.int32(10**9))
    assert bool(done)

    carry = epoch_sampling_init(Q0, metric, T, md, ring=4)
    g_stop = 0
    for _ in range(10**6):
        g_stop += 24  # deliberately not a multiple of the epoch length
        carry, done = stage(key, metric, eps, carry, jnp.int32(g_stop))
        if bool(done):
            break
    _, qs_a, lds_a, st_a = jax.jit(
        lambda c: epoch_sampling_finish(c, T)
    )(one)
    _, qs_b, lds_b, st_b = jax.jit(
        lambda c: epoch_sampling_finish(c, T)
    )(carry)
    np.testing.assert_array_equal(np.asarray(qs_a), np.asarray(qs_b))
    np.testing.assert_array_equal(np.asarray(st_a.steps), np.asarray(st_b.steps))
    np.testing.assert_array_equal(
        np.asarray(st_a.term_left), np.asarray(st_b.term_left)
    )
    np.testing.assert_array_equal(
        np.asarray(st_a.acceptance_rate), np.asarray(st_b.acceptance_rate)
    )


def test_run_chains_epoch_statistics():
    from dynamichmc_tpu.parallel import run_chains

    ld = from_logdensity_fn(3, lambda q: -0.5 * q @ q)
    res = run_chains(
        jax.random.PRNGKey(0), ld, 32, 150, sampling_driver="epoch"
    )
    qs = np.asarray(res.positions)
    assert qs.shape == (32, 150, 3)
    assert np.isfinite(qs).all()
    assert abs(qs.mean()) < 0.1
    assert abs(qs.std() - 1.0) < 0.12
    st = res.tree_statistics
    for field in ("depth", "steps", "acceptance_rate", "logdensity",
                  "term_left", "term_right", "directions", "work"):
        assert np.asarray(getattr(st, field)).shape == (32, 150), field
    acc = float(np.asarray(st.acceptance_rate).mean())
    assert 0.5 < acc <= 1.0
    # work >= steps: the per-lane slot span includes waits
    assert (np.asarray(st.work) >= np.asarray(st.steps)).all()


def test_run_chains_epoch_draw_sink():
    from dynamichmc_tpu.parallel import run_chains

    ld = from_logdensity_fn(2, lambda q: -0.5 * q @ q)
    got = {}

    def sink(start, qs, lds, stats):
        got["start"] = start
        got["qs"] = np.asarray(qs)
        got["lds"] = np.asarray(lds)

    res = run_chains(
        jax.random.PRNGKey(1), ld, 8, 40, sampling_driver="epoch",
        draw_sink=sink,
    )
    assert got["start"] == 0
    assert got["qs"].shape == (8, 40, 2)
    assert np.isfinite(got["qs"]).all()
    # with a sink the positions stream out; the result keeps the stats
    assert np.asarray(res.tree_statistics.steps).shape == (8, 40)


def test_run_chains_epoch_validations():
    from dynamichmc_tpu.parallel import run_chains

    ld = from_logdensity_fn(2, lambda q: -0.5 * q @ q)
    with pytest.raises(ValueError, match="sampling_driver"):
        run_chains(jax.random.PRNGKey(0), ld, 4, 8, sampling_driver="nope")
    with pytest.raises(ValueError, match="stratify_sampling"):
        run_chains(
            jax.random.PRNGKey(0), ld, 4, 8, sampling_driver="epoch",
            stratify_sampling=2,
        )


def test_epoch_carry_specs_cover_carry():
    # the shard_map partition-spec key sets must stay in sync with the
    # carry epoch_sampling_init actually builds
    from jax.sharding import PartitionSpec as P

    from dynamichmc_tpu.tree_wavefront_epoch import (
        epoch_carry_specs,
        epoch_sampling_init,
    )

    from dynamichmc_tpu.hamiltonian import EvaluatedPoint

    Q = EvaluatedPoint(
        q=jnp.zeros((4, 2)), logdensity=jnp.zeros(4), grad=jnp.zeros((4, 2))
    )
    carry = epoch_sampling_init(Q, identity_metric(2), 8, max_depth=5)
    specs = epoch_carry_specs(P, "chains")
    assert set(specs) == set(carry)


def test_run_chains_epoch_mesh():
    # epoch sampling sharded over the virtual 8-device mesh: per-device
    # slot/flush counters, no cross-device communication; draws finite and
    # statistically sane
    from dynamichmc_tpu.parallel import chain_mesh, run_chains

    ld = from_logdensity_fn(2, lambda q: -0.5 * float(1.0) * q @ q)
    mesh = chain_mesh(8)
    res = run_chains(
        jax.random.PRNGKey(3), ld, 16, 64, sampling_driver="epoch",
        mesh=mesh,
    )
    qs = np.asarray(res.positions)
    assert qs.shape == (16, 64, 2)
    assert np.isfinite(qs).all()
    # pooled over 16 chains x 64 draws: loose moment check
    flat = qs.reshape(-1, 2)
    assert np.abs(flat.mean(0)).max() < 0.35
    assert np.abs(flat.std(0) - 1.0).max() < 0.35
    assert np.asarray(res.tree_statistics.steps).shape == (16, 64)
