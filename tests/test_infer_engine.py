import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mica_tpu.infer.engine import SlidingWindowPredictor, postprocess_logits
from mica_tpu.models.mica import MICA
from mica_tpu.ops import window
from mica_tpu.parallel.mesh import make_mesh

BASE = 16
CORE, HALO = 12, 2


@pytest.fixture(scope="module")
def params():
    model = MICA(base=BASE)
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 8, 8, 1))
    af = jnp.zeros((1, 8, 8, 8, 24))
    return model.init(k, x, af)["params"]


def _reference_prediction(params, vol, af):
    """Oracle: extract windows, direct forward, stitch."""
    wins = np.asarray(window.extract_windows(jnp.asarray(vol), CORE, HALO))
    af_wins = np.stack(
        [np.asarray(window.extract_windows(jnp.asarray(af[c]), CORE, HALO)) for c in range(24)],
        axis=1,
    )  # (nw, 24, w,w,w)
    model = MICA(base=BASE)
    bb, ca, aa = model.apply(
        {"params": params},
        jnp.asarray(wins)[..., None],
        jnp.moveaxis(jnp.asarray(af_wins), 1, -1),
    )
    bb_p, ca_p, aa_p = postprocess_logits(bb, ca, aa)
    shape = vol.shape
    bb_v = np.asarray(window.stitch_windows(bb_p[..., 0], shape, CORE, HALO))
    ca_v = np.asarray(window.stitch_windows(ca_p[..., 0], shape, CORE, HALO))
    aa_v = np.asarray(
        window.stitch_windows(jnp.moveaxis(aa_p, -1, 1), shape, CORE, HALO)
    )
    return bb_v, ca_v, aa_v


def test_engine_matches_direct_forward(params, rng):
    shape = (30, 24, 13)
    vol = rng.random(shape).astype(np.float32)
    af = (rng.random((24,) + shape) < 0.02).astype(np.float32)

    pred = SlidingWindowPredictor(
        params, batch_size=4, dtype=jnp.float32, base_filters=BASE,
        core=CORE, halo=HALO,
    )
    out = pred.predict_volume(vol, af)

    bb_v, ca_v, aa_v = _reference_prediction(params, vol, af)
    np.testing.assert_allclose(out["backbone_probability"], bb_v, atol=1e-4)
    np.testing.assert_allclose(out["carbon_alpha_probability"], ca_v, atol=1e-4)
    np.testing.assert_allclose(out["amino_acid_probability"], aa_v, atol=1e-4)
    # argmax can flip on near-ties under float reassociation; require
    # agreement except where the top two probabilities are within 1e-3
    pred_ref = np.argmax(aa_v, axis=0)
    differs = out["amino_acid_prediction"] != pred_ref
    if differs.any():
        sorted_p = np.sort(aa_v, axis=0)
        near_tie = (sorted_p[-1] - sorted_p[-2]) < 1e-3
        assert near_tie[differs].all()


def test_engine_no_af(params, rng):
    shape = (13, 13, 13)
    vol = rng.random(shape).astype(np.float32)
    pred = SlidingWindowPredictor(
        params, batch_size=2, dtype=jnp.float32, base_filters=BASE,
        core=CORE, halo=HALO,
    )
    out = pred.predict_volume(vol, None)
    assert out["backbone_probability"].shape == shape
    assert out["amino_acid_probability"].shape == (20,) + shape
    assert np.isfinite(out["backbone_probability"]).all()


def test_engine_sharded_matches_single(params, rng):
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    shape = (26, 26, 13)
    vol = rng.random(shape).astype(np.float32)
    af = (rng.random((24,) + shape) < 0.02).astype(np.float32)

    single = SlidingWindowPredictor(
        params, batch_size=8, dtype=jnp.float32, base_filters=BASE,
        core=CORE, halo=HALO,
    ).predict_volume(vol, af)
    sharded = SlidingWindowPredictor(
        params, batch_size=8, dtype=jnp.float32, base_filters=BASE,
        core=CORE, halo=HALO, mesh=make_mesh(),
    ).predict_volume(vol, af)

    for key in ("backbone_probability", "carbon_alpha_probability", "amino_acid_probability"):
        np.testing.assert_allclose(sharded[key], single[key], atol=1e-4, err_msg=key)


def test_engine_sharded_volumes_match(params, rng):
    """X-sharded accumulator volumes (memory-scalable mode) must produce
    the same outputs as the replicated path."""
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    shape = (30, 26, 13)
    vol = rng.random(shape).astype(np.float32)
    af = (rng.random((24,) + shape) < 0.02).astype(np.float32)

    single = SlidingWindowPredictor(
        params, batch_size=8, dtype=jnp.float32, base_filters=BASE,
        core=CORE, halo=HALO,
    ).predict_volume(vol, af)
    pred = SlidingWindowPredictor(
        params, batch_size=8, dtype=jnp.float32, base_filters=BASE,
        core=CORE, halo=HALO, mesh=make_mesh(), shard_volumes=True,
    )
    sharded = pred.predict_volume(vol, af)

    for key in ("backbone_probability", "carbon_alpha_probability",
                "amino_acid_probability"):
        assert sharded[key].shape == single[key].shape, key
        np.testing.assert_allclose(sharded[key], single[key], atol=1e-4,
                                   err_msg=key)


def test_engine_shard_volumes_requires_mesh(params):
    with pytest.raises(ValueError):
        SlidingWindowPredictor(
            params, base_filters=BASE, shard_volumes=True,
        )
    with pytest.raises(ValueError):
        SlidingWindowPredictor(
            params, base_filters=BASE, mesh=make_mesh(),
            blend="average", shard_volumes=True,
        )


def test_engine_empty_window_dedup(params, rng):
    """Volumes with empty regions: dedup path must match direct forward."""
    shape = (26, 26, 26)
    vol = np.zeros(shape, np.float32)
    vol[:10, :10, :10] = rng.random((10, 10, 10)).astype(np.float32)
    af = np.zeros((24,) + shape, np.float32)
    af[0, :10, :10, :10] = (rng.random((10, 10, 10)) < 0.05).astype(np.float32)

    pred = SlidingWindowPredictor(
        params, batch_size=2, dtype=jnp.float32, base_filters=BASE,
        core=CORE, halo=HALO,
    )
    out = pred.predict_volume(vol, af)
    assert pred.timing["n_empty"] > 0

    bb_v, ca_v, aa_v = _reference_prediction(params, vol, af)
    np.testing.assert_allclose(out["backbone_probability"], bb_v, atol=1e-4)
    np.testing.assert_allclose(out["carbon_alpha_probability"], ca_v, atol=1e-4)
    np.testing.assert_allclose(out["amino_acid_probability"], aa_v, atol=1e-4)


def test_engine_average_blend(params, rng):
    """Overlap-averaged stitching: smooth, finite, close to core mode."""
    shape = (26, 26, 13)
    vol = rng.random(shape).astype(np.float32)
    af = (rng.random((24,) + shape) < 0.02).astype(np.float32)

    core_out = SlidingWindowPredictor(
        params, batch_size=4, dtype=jnp.float32, base_filters=BASE,
        core=CORE, halo=HALO,
    ).predict_volume(vol, af)
    avg_out = SlidingWindowPredictor(
        params, batch_size=4, dtype=jnp.float32, base_filters=BASE,
        core=CORE, halo=HALO, blend="average",
    ).predict_volume(vol, af)

    for key in ("backbone_probability", "carbon_alpha_probability"):
        a, c = avg_out[key], core_out[key]
        assert a.shape == c.shape
        assert np.isfinite(a).all()
        # same field up to halo blending (random-init outputs have tiny
        # dynamic range, so compare by absolute gap, not correlation)
        # single-coverage region (interior of the window at start (12,12,0),
        # away from overlaps): average == core exactly
        np.testing.assert_allclose(
            a[14:22, 14:22, 2:10], c[14:22, 14:22, 2:10], atol=1e-5
        )
        # blended voxels stay bounded
        assert np.mean(np.abs(a - c)) < 0.2


def test_engine_average_blend_batch_independent(params, rng):
    """Average-mode output must not depend on batch size: batch-padding
    duplicates previously accumulated the last window multiple times,
    over-weighting it in seam overlaps."""
    shape = (26, 26, 13)
    vol = rng.random(shape).astype(np.float32)
    af = (rng.random((24,) + shape) < 0.02).astype(np.float32)

    outs = [
        SlidingWindowPredictor(
            params, batch_size=bs, dtype=jnp.float32, base_filters=BASE,
            core=CORE, halo=HALO, blend="average",
        ).predict_volume(vol, af)
        for bs in (2, 5)
    ]
    for key in ("backbone_probability", "carbon_alpha_probability",
                "amino_acid_probability"):
        np.testing.assert_allclose(outs[0][key], outs[1][key], atol=1e-5,
                                   err_msg=key)


def test_window_nonempty_matches_bruteforce(rng):
    """Vectorized occupancy scan == per-window blk.any() loop, including
    non-multiple-of-core shapes and 4D channels-last AF arrays."""
    from mica_tpu.infer.engine import _window_nonempty
    from mica_tpu.ops.window import window_counts, window_starts

    for shape in [(30, 25, 17), (36, 36, 36), (13, 49, 24)]:
        core, halo = CORE, HALO
        win = core + 2 * halo
        counts = window_counts(shape, core)
        nb = [int(n) for n in counts]
        padded_shape = tuple(n * core for n in nb)
        pads = [
            (halo, (padded_shape[a] - core) + win - halo - shape[a])
            for a in range(3)
        ]
        vol = (rng.random(shape) < 0.002).astype(np.float32) * rng.random(shape)
        padded = np.pad(vol, pads)
        got = _window_nonempty(padded, counts, core, halo)

        starts = window_starts(shape, core)
        want = np.zeros(len(starts), bool)
        for i, s in enumerate(starts):
            blk = padded[s[0]:s[0]+win, s[1]:s[1]+win, s[2]:s[2]+win]
            want[i] = bool(blk.any())
        np.testing.assert_array_equal(got, want)

        # 4D channels-last float variant
        af = np.zeros(shape + (3,), np.float32)
        af[tuple(np.asarray(shape) // 2)] = 1.0
        padded4 = np.pad(af, pads + [(0, 0)])
        got4 = _window_nonempty(padded4, counts, core, halo)
        want4 = np.zeros(len(starts), bool)
        for i, s in enumerate(starts):
            want4[i] = bool(
                padded4[s[0]:s[0]+win, s[1]:s[1]+win, s[2]:s[2]+win].any()
            )
        np.testing.assert_array_equal(got4, want4)
