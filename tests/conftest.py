"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
``--xla_force_host_platform_device_count=8`` (the reference offers no
distributed-test precedent; see SURVEY.md §4).  Real-TPU benchmarking
happens in bench.py, not here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Persistent compilation cache: repeat test runs skip recompiles (the test
# host has a single CPU core, where XLA compiles are expensive).  The path
# must be user-writable — a hardcoded /root/.cache breaks silently (jax
# downgrades the PermissionError to per-compile warnings) on CI runners.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.expanduser("~"), ".cache", "jax_comp_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Belt and braces: jax may already be imported by a pytest plugin before this
# conftest runs; the config update works as long as no backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
