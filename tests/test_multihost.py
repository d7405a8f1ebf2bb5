"""Multi-host fan-out tests (parallel/multihost.py).

Single-process coverage: ``initialize()`` must be a safe no-op,
``global_chain_mesh()`` spans every addressable device, and
``run_chains_multihost`` drives the sharded pooled-Welford path end-to-end on
the virtual 8-CPU mesh. A genuine 2-process ``jax.distributed`` CPU job is
exercised via subprocess (slow tier) — the DCN analogue of the reference's
threaded chains (test/sample-correctness_utilities.jl:16-22).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamichmc_tpu.models import std_normal
from dynamichmc_tpu.parallel import CHAIN_AXIS
from dynamichmc_tpu.parallel.multihost import (
    global_chain_mesh,
    initialize,
    run_chains_multihost,
)


def test_initialize_single_process_is_noop():
    # no coordinator configured: must not raise, must leave devices usable
    initialize()
    assert len(jax.devices()) == 8


def test_global_chain_mesh_spans_all_devices():
    mesh = global_chain_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    assert mesh.axis_names == (CHAIN_AXIS,)


def test_run_chains_multihost_single_process():
    from dynamichmc_tpu.warmup import default_warmup_stages

    res = run_chains_multihost(
        jax.random.PRNGKey(0), std_normal(3), n_chains_per_device=2,
        n_samples=200, dtype=jnp.float64,
        warmup_stages=default_warmup_stages(pooled=True),
    )
    assert res.positions.shape == (16, 200, 3)
    # pooled adaptation over the mesh: one shared metric
    m_inv = np.asarray(res.metric.m_inv)
    assert m_inv.shape == (3,)
    np.testing.assert_allclose(m_inv, 1.0, rtol=0.5)
    qs = np.asarray(res.positions).reshape(-1, 3)
    assert np.abs(qs.mean(0)).max() < 0.15
    assert np.abs(qs.std(0) - 1).max() < 0.15


_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, sys.argv[3])
from dynamichmc_tpu.models import std_normal
from dynamichmc_tpu.parallel.multihost import (
    global_chain_mesh, initialize, run_chains_multihost)
from dynamichmc_tpu.warmup import TuningNUTS
from dynamichmc_tpu.stepsize import InitialStepsizeSearch

initialize(coordinator_address=sys.argv[2], num_processes=2, process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
mesh = global_chain_mesh()
assert mesh.devices.size == 4, mesh.devices.size
res = run_chains_multihost(
    jax.random.PRNGKey(0), std_normal(2), n_chains_per_device=1, n_samples=50,
    warmup_stages=(InitialStepsizeSearch(),
                   TuningNUTS(N=40, metric_kind="diagonal", pooled=True)),
    dtype="float64",
)
import numpy as np
# results are GLOBAL jax.Arrays spanning both processes: read the local
# shard (the multihost idiom; np.asarray on a non-addressable global array
# raises by design)
m_inv = np.asarray(res.metric.m_inv.addressable_shards[0].data)
assert m_inv.shape == (2,), m_inv.shape  # pooled metric: replicated
assert np.all(np.isfinite(m_inv))
local_q = res.positions.addressable_shards[0].data
assert local_q.shape == (1, 50, 2), local_q.shape  # 1 chain per device
assert np.all(np.isfinite(np.asarray(local_q)))
print(f"proc {proc_id} OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_cpu(tmp_path):
    """Real jax.distributed: 2 processes x 2 virtual CPU devices, pooled
    Welford reduction riding the distributed runtime."""
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    addr = "localhost:12731"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), addr, repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out
