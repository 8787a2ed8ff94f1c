"""Resample fast-path + compilation-cache helper tests.

(The scipy-parity resample suite lives in tests/test_ops.py; this file
covers the identity shortcut and the package-wide jax cache helper.)
"""

import numpy as np


def test_resample_identity_fast_path():
    """Factor-1.0 maps skip the spline entirely (exact identity; scipy's
    zoom at factor 1.0 is identity up to ~1e-7 spline noise)."""
    from mica_tpu.ops.resample import resample_to_voxel_size

    rng = np.random.default_rng(5)
    vol = rng.random((9, 8, 7)).astype(np.float32)
    out = np.asarray(resample_to_voxel_size(vol, (1.0, 1.0, 1.0), 1.0))
    np.testing.assert_array_equal(out, vol)


def test_resample_non_identity_still_resamples():
    from mica_tpu.ops.resample import resample_to_voxel_size

    rng = np.random.default_rng(6)
    vol = rng.random((8, 8, 8)).astype(np.float32)
    out = np.asarray(resample_to_voxel_size(vol, (2.0, 2.0, 2.0), 1.0))
    assert out.shape == (16, 16, 16)


def test_compilation_cache_helper_respects_existing():
    import jax

    from mica_tpu.utils.jaxcache import ensure_compilation_cache

    before = jax.config.jax_compilation_cache_dir  # conftest sets one
    ensure_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == before


def test_compilation_cache_helper_sets_default(monkeypatch):
    import os

    import jax

    from mica_tpu.utils import jaxcache

    before = jax.config.jax_compilation_cache_dir
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.delenv("MICA_JAX_CACHE_DIR", raising=False)
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        jaxcache.ensure_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == jaxcache._DEFAULT_DIR
        assert os.path.isdir(jaxcache._DEFAULT_DIR)
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_compilation_cache_helper_env_disable(monkeypatch):
    import jax

    from mica_tpu.utils import jaxcache

    before = jax.config.jax_compilation_cache_dir
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.setenv("MICA_JAX_CACHE_DIR", "")
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        jaxcache.ensure_compilation_cache()
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
