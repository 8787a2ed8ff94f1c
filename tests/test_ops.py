import numpy as np
import pytest
from scipy.ndimage import zoom as scipy_zoom

from mica_tpu.ops import normalize, resample, window


@pytest.mark.parametrize(
    "shape,factors",
    [
        ((20, 24, 28), (1.05, 2.0, 0.6)),
        ((33, 17, 21), (1.333, 1.333, 1.333)),
        ((16, 16, 16), (0.5, 0.7, 1.9)),  # includes scipy's endpoint fp artifact
        ((9, 9, 9), (3.7, 0.5, 1.0)),
    ],
)
def test_zoom_cubic_scipy_parity(shape, factors, rng):
    x = rng.normal(size=shape).astype(np.float32)
    ref = scipy_zoom(x.astype(np.float64), factors, order=3)
    out_shape = resample.zoom_output_shape(shape, factors)
    assert ref.shape == out_shape
    mine = np.asarray(resample.zoom_cubic(x, out_shape))
    np.testing.assert_allclose(mine, ref, atol=2e-5, rtol=1e-4)


def test_resample_to_voxel_size(rng):
    x = rng.normal(size=(12, 14, 16)).astype(np.float32)
    out = resample.resample_to_voxel_size(x, (1.2, 0.8, 1.0))
    ref = scipy_zoom(x.astype(np.float64), (1.2, 0.8, 1.0), order=3)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_normalize_map_numpy_parity(rng):
    x = rng.normal(size=(30, 32, 28)).astype(np.float32) * 3.0
    x[0, 0, 0] = np.nan

    # reference algorithm (preprocessing.py:121-133)
    ref = np.nan_to_num(x.astype(np.float64))
    median = np.median(ref)
    ref = (ref > median) * (ref - median)
    pos = ref[ref > 0]
    pv = np.percentile(pos, 99.9)
    ref = np.where(ref < pv, ref, pv) / pv

    mine = np.asarray(normalize.normalize_map(x))
    np.testing.assert_allclose(mine, ref, atol=1e-5)
    assert mine.min() >= 0.0 and mine.max() <= 1.0 + 1e-6


@pytest.mark.parametrize("shape", [(48, 48, 48), (100, 70, 49), (48, 96, 52), (30, 20, 10)])
def test_window_roundtrip(shape, rng):
    vol = rng.normal(size=shape).astype(np.float32)
    wins = np.asarray(window.extract_windows(vol))
    nb = window.window_counts(shape)
    assert wins.shape == (np.prod(nb), 64, 64, 64)
    back = np.asarray(window.stitch_windows(wins, shape))
    np.testing.assert_array_equal(back, vol)


def test_window_contents_match_reference_layout(rng):
    """Window n must equal the reference's padded[i:i+64, j:j+64, k:k+64]."""
    shape = (70, 50, 49)
    vol = rng.normal(size=shape).astype(np.float32)
    grid_size, padding, ws = 48, 8, 64
    pad_end = [ws - (s % grid_size) for s in shape]
    padded = np.pad(vol, [(padding, pad_end[0]), (padding, pad_end[1]), (padding, pad_end[2])])
    wins = np.asarray(window.extract_windows(vol))
    starts = window.window_starts(shape)
    for n, (i, j, k) in enumerate(starts):
        ref = padded[i : i + ws, j : j + ws, k : k + ws]
        np.testing.assert_array_equal(wins[n], ref)


def test_stitch_with_channels(rng):
    shape = (50, 49, 48)
    nb = window.window_counts(shape)
    nw = int(np.prod(nb))
    wins = rng.normal(size=(nw, 20, 64, 64, 64)).astype(np.float32)
    out = np.asarray(window.stitch_windows(wins, shape))
    assert out.shape == (20,) + shape
    # check one voxel: window 0 core voxel (8,8,8) -> volume (0,0,0)
    np.testing.assert_array_equal(out[:, 0, 0, 0], wins[0, :, 8, 8, 8])


def test_stem_pallas_matches_xla(rng):
    """The fused Pallas stem kernel (interpret mode on CPU) must match the
    XLA patch-matmul formulation exactly."""
    import jax.numpy as jnp

    from mica_tpu.ops.conv_fast import embed_kernel, multiscale_stem_conv
    from mica_tpu.ops.stem_pallas import stem_conv_pallas

    B, D, H, W, C = 1, 8, 8, 8, 16
    ks = [3, 5, 7, 9]
    kernels = [
        jnp.asarray(rng.standard_normal((k, k, k, 1, C // 4)).astype(np.float32) * 0.1)
        for k in ks
    ]
    biases = [jnp.asarray(rng.standard_normal(C // 4).astype(np.float32))
              for _ in ks]
    x = jnp.asarray(rng.standard_normal((B, D, H, W, 1)).astype(np.float32))

    ref = multiscale_stem_conv(x, kernels, biases, allow_pallas=False)
    combined = jnp.concatenate(
        [embed_kernel(k, 9).reshape(9, 81, -1) for k in kernels], axis=-1
    )
    bias = jnp.concatenate(biases, axis=-1)
    out = stem_conv_pallas(x[..., 0], combined, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_packed_conv3_exact():
    """Lane-packed conv == direct SAME conv (f32 exact; the zero-padded
    extra taps contribute nothing)."""
    import jax.numpy as jnp

    from mica_tpu.models.mica import conv_same
    from mica_tpu.ops.conv_fast import packed_conv3

    rng = np.random.default_rng(3)
    for ci, co, P, w in [(16, 8, 4, 16), (24, 16, 2, 12), (8, 4, 4, 8)]:
        x = jnp.asarray(rng.standard_normal((2, 6, 5, w, ci)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)), jnp.float32)
        b = jnp.asarray(rng.standard_normal(co), jnp.float32)
        direct = np.asarray(conv_same(x, k, b))
        packed = np.asarray(packed_conv3(x, k, b, phases=P))
        # identical sums in a different association order (K taps split
        # differently): ~1e-5-scale f32 noise, nothing structural
        np.testing.assert_allclose(packed, direct, rtol=1e-4, atol=2e-4)
