"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Tests run on a virtual 8-device CPU mesh (the driver validates real multi-chip
sharding separately via __graft_entry__.dryrun_multichip). float64 matches the
reference's CPU tolerances; the library itself is dtype-agnostic and runs
float32 on TPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# This image pre-configures jax_platforms="axon,cpu" (TPU-first), which
# overrides the JAX_PLATFORMS env var — force the CPU backend explicitly so
# tests run with exact float64 and 8 virtual devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamichmc_tpu.utils.cache import host_keyed_cache_dir  # noqa: E402

# XLA compile time dominates the suite on this 1-core box; persist compiled
# programs across runs (keyed by HLO + config, so edits to traced code miss
# the cache naturally and recompile). The directory carries a host-CPU
# fingerprint: a cache shared across heterogeneous hosts loads CPU AOT
# binaries specialized for other machines' features (SIGILL risk).
jax.config.update(
    "jax_compilation_cache_dir",
    host_keyed_cache_dir("/tmp/jax_test_compile_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# ---------------------------------------------------------------------------
# Process isolation for the statistical correctness gates.
#
# In a long-lived full-suite process (several hundred XLA:CPU compiles in),
# compiling/serializing the heavy monolithic warmup programs crashes INSIDE
# jaxlib (observed as SIGSEGV or abort in `executable.serialize()` during the
# persistent-cache write, and — with the cache bypassed — in
# `backend_compile_and_load` itself; jax 0.9.0). The same tests pass
# standalone every time, so the executables are fine — the crash is
# process-state-dependent native corruption upstream of this repo, and its
# location wanders with the parent's cumulative compile count (first
# test_sample_correctness, then test_stratified once the former was
# isolated). Running every slow-marked gate in a fresh interpreter keeps the
# parent process at exactly the fast tier's compile load (proven green) and
# sidesteps the corruption deterministically; the persistent compile cache
# keeps the per-child cost to interpreter startup + cache loads.
# ---------------------------------------------------------------------------

_ISOLATED_FILES = ("test_sample_correctness.py",)
_CHILD_ENV = "DYNHMC_ISOLATED_CHILD"


def _isolated_runner(nodeid):
    import subprocess

    def run(**_fixtures):
        import pytest

        env = dict(os.environ, **{_CHILD_ENV: "1"})
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x", nodeid,
             "-p", "no:cacheprovider"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env,
            capture_output=True,
            text=True,
            timeout=2400,
        )
        if proc.returncode != 0:
            pytest.fail(
                f"isolated child run of {nodeid} failed "
                f"(exit {proc.returncode}):\n"
                f"{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}",
                pytrace=False,
            )

    return run


def pytest_collection_modifyitems(config, items):
    if os.environ.get(_CHILD_ENV) == "1":
        return
    for item in items:
        path = getattr(item, "path", None) or getattr(item, "fspath", "")
        isolate = (
            os.path.basename(str(path)) in _ISOLATED_FILES
            or item.get_closest_marker("slow") is not None
        )
        if isolate:
            item.obj = _isolated_runner(item.nodeid)
