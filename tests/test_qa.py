"""Static-quality tier: the TPU analogue of the reference's JET.jl/Aqua.jl
checks (test/runtests.jl:17-27): compile stability (no retracing in the hot
path across calls and stage sizes), hot-loop purity (no host callbacks), and
NaN-cleanliness under jax_debug_nans for a benign target."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamichmc_tpu import NUTS, default_warmup_stages, from_logdensity_fn
from dynamichmc_tpu.engine import WarmupSchedule
from dynamichmc_tpu.models import std_normal
from dynamichmc_tpu.parallel import run_chains
from dynamichmc_tpu.parallel.chains import _fast_programs_batched


def test_stage_program_compiles_once_for_all_block_sizes():
    # The whole point of the engine redesign: one tree program regardless of
    # the stage schedule. Two runs with different draw counts must reuse the
    # same compiled stage/sampling programs.
    ld = std_normal(3)
    schedule = WarmupSchedule.from_stages(default_warmup_stages())
    run_chains(jax.random.PRNGKey(0), ld, 4, 40, dtype=jnp.float64)
    # mirror run_chains' program-bundle key EXACTLY (lru_cache keys omitted
    # defaults differently from explicitly-passed ones): adaptive
    # sample_chunk caps at 128 for tiny batches; monolithic warmup is the
    # mesh-less default; wavefront is passed explicitly by run_chains
    programs = _fast_programs_batched(
        ld, NUTS(), schedule, None, sample_chunk=512, wavefront=False,
        monolithic=True,
    )
    mono_traces = programs.warmup_mono._cache_size()
    sample_traces = programs.sample._cache_size()
    assert mono_traces == 1, mono_traces  # 7 blocks, ONE warmup compilation
    run_chains(jax.random.PRNGKey(1), ld, 4, 72, dtype=jnp.float64)
    assert programs.warmup_mono._cache_size() == 1
    assert programs.sample._cache_size() == sample_traces  # chunk reuse


def test_program_cache_hit_across_calls():
    ld = std_normal(2)
    schedule = WarmupSchedule.from_stages(default_warmup_stages())
    p1 = _fast_programs_batched(ld, NUTS(), schedule, None)
    p2 = _fast_programs_batched(
        ld, NUTS(), WarmupSchedule.from_stages(default_warmup_stages()), None
    )
    assert p1 is p2  # lru_cache hit: equal schedules hash equal


def test_no_nans_under_debug_nans():
    # jax_debug_nans raises on any NaN materialization: the -inf poisoning
    # path must be NaN-free end-to-end for a benign target.
    ld = from_logdensity_fn(2, lambda q: -0.5 * jnp.sum(q**2))
    with jax.debug_nans(True):
        res = run_chains(jax.random.PRNGKey(3), ld, 2, 50, dtype=jnp.float64)
    assert np.isfinite(np.asarray(res.positions)).all()


def test_transition_is_pure():
    # Same key + same state => bitwise identical transition (purity /
    # determinism; the reference relies on explicit RNG passing for this,
    # docs/src/worked_example.md:71).
    from dynamichmc_tpu.hamiltonian import evaluate
    from dynamichmc_tpu.metric import identity_metric
    from dynamichmc_tpu.nuts import sample_tree

    ld = std_normal(3)
    metric = identity_metric(3, dtype=jnp.float64)
    Q = evaluate(ld, jnp.asarray([0.3, -0.2, 1.0]))
    key = jax.random.PRNGKey(9)
    f = jax.jit(lambda: sample_tree(key, NUTS(), ld, metric, Q, 0.5))
    Q1, s1 = f()
    Q2, s2 = f()
    np.testing.assert_array_equal(np.asarray(Q1.q), np.asarray(Q2.q))
    assert int(s1.depth) == int(s2.depth)
    assert int(s1.directions) == int(s2.directions)
