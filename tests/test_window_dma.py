"""Parity tests for the Mosaic DMA window gather/scatter kernels.

The kernels (`ops/window_dma.py`) are exact data movement; on current
libtpu they cannot lower for the production geometry (HBM slice offsets
must be 128-lane aligned; window starts are multiples of 48 —
PERFORMANCE.md), so the engine does not use them yet.  These
interpret-mode tests pin their semantics so a future Mosaic that lifts
the restriction can be adopted by flipping the engine's builder, with
correctness already covered.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mica_tpu.ops.window_dma import gather_windows_dma, scatter_cores_dma


def test_gather_windows_dma_matches_slices(rng):
    P, w = 80, 32
    pm = jnp.asarray(rng.random((P, P, P)).astype(np.float32))
    pa = jnp.asarray((rng.random((P, P, P)) * 2**24).astype(np.uint32))
    starts_np = np.array(
        [[0, 0, 0], [24, 24, 24], [48, 0, 24], [13, 7, 41], [48, 48, 48]],
        np.int32,
    )
    wins, afs = gather_windows_dma(pm, pa, jnp.asarray(starts_np),
                                   window=w, interpret=True)
    ref_w = jnp.stack([jax.lax.dynamic_slice(pm, tuple(s), (w, w, w))
                       for s in starts_np])
    ref_a = jnp.stack([jax.lax.dynamic_slice(pa, tuple(s), (w, w, w))
                       for s in starts_np])
    np.testing.assert_array_equal(np.asarray(wins), np.asarray(ref_w))
    np.testing.assert_array_equal(np.asarray(afs), np.asarray(ref_a))


def test_gather_windows_dma_no_af(rng):
    P, w = 48, 16
    pm = jnp.asarray(rng.random((P, P, P)).astype(np.float32))
    starts_np = np.array([[0, 0, 0], [16, 16, 16]], np.int32)
    wins = gather_windows_dma(pm, None, jnp.asarray(starts_np),
                              window=w, interpret=True)
    ref = jnp.stack([jax.lax.dynamic_slice(pm, tuple(s), (w, w, w))
                     for s in starts_np])
    np.testing.assert_array_equal(np.asarray(wins), np.asarray(ref))


def test_scatter_cores_dma_skips_tail(rng):
    P, c, A, n = 80, 24, 4, 5
    starts_np = np.array(
        [[0, 0, 0], [24, 24, 24], [48, 0, 24], [48, 48, 48], [48, 48, 48]],
        np.int32,
    )  # last row is tail padding (duplicate) and must be skipped
    vols = (jnp.zeros((P, P, P), jnp.float32),
            jnp.zeros((P, P, P), jnp.float32),
            jnp.zeros((P, P, P, A), jnp.float32))
    cores = (jnp.asarray(rng.random((n, c, c, c)).astype(np.float32)),
             jnp.asarray(rng.random((n, c, c, c)).astype(np.float32)),
             jnp.asarray(rng.random((n, c, c, c, A)).astype(np.float32)))
    out = scatter_cores_dma(vols, cores, jnp.asarray(starts_np), 4,
                            core=c, interpret=True)
    ref_bb = np.zeros((P, P, P), np.float32)
    ref_ca = np.zeros((P, P, P), np.float32)
    ref_aa = np.zeros((P, P, P, A), np.float32)
    for i in range(4):
        x, y, z = starts_np[i]
        ref_bb[x:x + c, y:y + c, z:z + c] = np.asarray(cores[0])[i]
        ref_ca[x:x + c, y:y + c, z:z + c] = np.asarray(cores[1])[i]
        ref_aa[x:x + c, y:y + c, z:z + c] = np.asarray(cores[2])[i]
    np.testing.assert_array_equal(np.asarray(out[0]), ref_bb)
    np.testing.assert_array_equal(np.asarray(out[1]), ref_ca)
    np.testing.assert_array_equal(np.asarray(out[2]), ref_aa)
