"""Package-wide persistent XLA compilation cache.

The heavy programs (the 64-window model step compiles ~60 s with the
32 MB scoped-VMEM budget; preprocessing programs are shape-specialized
per map) are compiled once per configuration and can be served from
jax's on-disk cache across processes — but jax leaves the cache OFF
unless a directory is configured.  bench.py and tests/conftest.py set
one explicitly; without this module every CLI run (solver, predict,
train) paid full compiles in every process — measured as the dominant
cost of `getData`/`nnPred` on a warm machine (scripts/
bench_e2e_pipeline.py: 118 s cold vs ~5 s of actual compute).

``ensure_compilation_cache()`` is idempotent and respects an existing
setting: an explicit user configuration (env var or prior
``jax.config.update``) always wins.
"""

from __future__ import annotations

import os

# Same directory bench.py and tests/conftest.py configure explicitly:
# one shared on-disk cache means a benchmark run's ~60 s model-step
# compile is served to subsequent CLI runs (and vice versa).
_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "jax_comp_cache")


def ensure_compilation_cache() -> None:
    """Enable jax's persistent compilation cache if not already set."""
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return
        if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return  # jax reads the env var itself
        path = os.environ.get("MICA_JAX_CACHE_DIR", _DEFAULT_DIR)
        if not path:  # MICA_JAX_CACHE_DIR="" disables
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is an optimization, never fatal
        pass
