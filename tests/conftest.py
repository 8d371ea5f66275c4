"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; all sharding/halo/psum logic is
exercised on `--xla_force_host_platform_device_count=8` CPU devices (the
multi-device test style SURVEY.md §4 calls for). Must run before jax import.
"""

import os
import sys

# The axon sitecustomize registers a remote-TPU PJRT plugin (with a tokio
# tunnel client) in EVERY python process when PALLAS_AXON_POOL_IPS is set,
# even under JAX_PLATFORMS=cpu — and that client nondeterministically
# deadlocks CPU test runs. Re-exec once with the trigger env removed so the
# test process is pure-CPU jax with no tunnel threads.
if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get("EVO_TESTS_REEXEC"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["EVO_TESTS_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Persistent compilation cache — this host's XLA compile latency (~1s per
# trivial jit) would otherwise dominate the suite.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# Debug-mode NaN canary, mirroring the reference's
# -DEIGEN_INITIALIZE_MATRICES_BY_NAN debug poisoning (CMakeLists.txt:57-58).
if os.environ.get("EVO_DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
