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
