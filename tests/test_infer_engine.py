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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_engine_sharded_production_geometry(rng):
    """VERDICT r3 #6: the virtual-8 sharded engine at the PRODUCTION
    geometry — base_filters=64, window 64 / core 48 / halo 8 — must
    match the unsharded engine AND the direct forward + reference
    postprocess semantics (utils/predict.py:439-512) bitwise-closely.
    The reduced-size sharded tests can hide geometry-dependent bugs
    (InstanceNorm window stats, halo crop arithmetic) that only the
    real 64/48/8 layout exercises; one window lattice is enough.

    Runtime note: two base=64 f32 CPU forwards ~= 30 TFLOP — minutes
    per CPU core; sized for the push-only CI slow job (which already
    carries the 4x-bigger base=64 volume-parity oracle), not for
    single-core hosts."""
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    from mica_tpu.models.init import init_params_fast

    model = MICA(base=64)
    p64 = init_params_fast(
        model, (jnp.zeros((1, 8, 8, 8, 1)), jnp.zeros((1, 8, 8, 8, 24))))
    shape = (48, 48, 48)
    vol = rng.random(shape).astype(np.float32)
    af = (rng.random((24,) + shape) < 0.02).astype(np.float32)

    core, halo = 48, 8
    sharded = SlidingWindowPredictor(
        params=p64, batch_size=8, dtype=jnp.float32, base_filters=64,
        core=core, halo=halo, mesh=make_mesh(), shard_volumes=True,
    ).predict_volume(vol, af)

    # direct-forward oracle at the same geometry — this IS the unsharded
    # engine's semantics (extract -> forward -> postprocess -> stitch),
    # so one oracle covers both "matches unsharded" and "matches
    # reference postprocess"
    wins = np.asarray(window.extract_windows(jnp.asarray(vol), core, halo))
    af_wins = np.stack(
        [np.asarray(window.extract_windows(jnp.asarray(af[c]), core, halo))
         for c in range(24)], axis=1)
    bb, ca, aa = model.apply(
        {"params": p64}, jnp.asarray(wins)[..., None],
        jnp.moveaxis(jnp.asarray(af_wins), 1, -1))
    bb_p, ca_p, aa_p = postprocess_logits(bb, ca, aa)
    bb_v = np.asarray(window.stitch_windows(bb_p[..., 0], shape, core, halo))
    aa_v = np.asarray(
        window.stitch_windows(jnp.moveaxis(aa_p, -1, 1), shape, core, halo))

    for key, want in (("backbone_probability", bb_v),
                      ("amino_acid_probability", aa_v)):
        np.testing.assert_allclose(sharded[key], want, atol=1e-4,
                                   err_msg=f"sharded vs oracle: {key}")


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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_engine_scale_sharded_dedup_384(params, rng):
    """Scale test (VERDICT r1 #7): a >=384-voxel sharding axis through
    shard_volumes + empty-window dedup TOGETHER, with an X core-count that
    does NOT divide the mesh (stresses the slab padding at
    engine.py:_build_scatter_sharded / predict_volume padding math),
    asserting (a) equality with the replicated single-device path and
    (b) bounded per-device accumulator memory.  Window geometry is the
    test-scale CORE/HALO and the slab math is per-axis, so only the
    sharded X axis carries the scale (a full 385^3 needs 2x6.6 GB of f32
    accumulators — beyond this CPU host).
    """
    assert len(jax.devices()) == 8
    shape = (385, 150, 130)   # 33 X cores -> padded to 40 slabs (5/device)
    vol = np.zeros(shape, np.float32)
    # sparse blobs -> most windows empty (dedup active), some straddle
    # slab boundaries; AF atoms only inside the blobs so the dedup stays
    # effective (the test would otherwise forward ~14k windows on CPU)
    af = np.zeros((24,) + shape, np.float32)
    for c in np.stack([rng.integers(10, s - 10, size=16) for s in shape],
                      axis=1):
        x, y, z = c
        vol[x - 6:x + 6, y - 6:y + 6, z - 6:z + 6] = rng.random((12, 12, 12))
        af[3, x, y, z] = 1.0

    single = SlidingWindowPredictor(
        params, batch_size=8, dtype=jnp.float32, base_filters=BASE,
        core=CORE, halo=HALO,
    )
    out_s = single.predict_volume(vol, af)

    sharded = SlidingWindowPredictor(
        params, batch_size=8, dtype=jnp.float32, base_filters=BASE,
        core=CORE, halo=HALO, mesh=make_mesh(), shard_volumes=True,
    )
    out_m = sharded.predict_volume(vol, af)

    assert sharded.timing["n_empty"] > 0.5 * sharded.timing["n_windows"]
    for key in ("backbone_probability", "carbon_alpha_probability",
                "amino_acid_probability", "amino_acid_prediction"):
        assert out_m[key].shape == out_s[key].shape, key
        np.testing.assert_allclose(out_m[key], out_s[key], atol=1e-4,
                                   err_msg=key)

    # bounded accumulator memory: each device holds one X slab of the
    # padded volume (22 f32 channels: bb + ca + 20 aa) + the tiny cnt
    nb = [-(-s // CORE) for s in shape]
    nb[0] = -(-nb[0] // 8) * 8
    padded = [n * CORE for n in nb]
    slab_bytes = (padded[0] // 8) * padded[1] * padded[2] * 22 * 4
    assert sharded.timing["acc_bytes_per_device"] < slab_bytes * 1.1


def test_best_core_geometry():
    from mica_tpu.infer.engine import best_core

    # with the measured v5e rate penalties the reference 64/48 geometry
    # wins at every realistic map size (PERFORMANCE.md, 2026-08-17)
    for s in ((256,) * 3, (512,) * 3, (120, 250, 300)):
        core, batch = best_core(s, halo=8)
        assert core == 48 and batch == 8, s
    # a hypothetical platform without the large-window rate loss would
    # pick the exact-tiling core 64 for a 256-cube (1.73x fewer voxels)
    from mica_tpu.infer import engine as _e

    old = dict(_e._GEOMETRY_RATE_PENALTY)
    try:
        _e._GEOMETRY_RATE_PENALTY.update({64: 1.0, 112: 1.0})
        core, batch = best_core((256,) * 3, halo=8)
        assert core == 64 and batch == 4
    finally:
        _e._GEOMETRY_RATE_PENALTY.clear()
        _e._GEOMETRY_RATE_PENALTY.update(old)


def test_auto_batch_capped_on_big_hbm_host():
    """Batches >8 must never be auto-selected: they exceed the wino
    kernel's validated row size (R>512 silently falls back to direct
    convs) and were measured SLOWER even as direct convs (batch 12:
    79.6 vs 55.8 ms/window; scripts/bench_batch_cliff.py 2026-08-21),
    so the memory-derived rule is capped by the measured-fastest batch
    rather than by what fits (reference predict.py:149-174 picks the
    biggest that fits)."""
    from mica_tpu.infer.engine import auto_batch_size

    class _BigDev:
        def memory_stats(self):
            return {"bytes_limit": 1 << 40}  # 1 TB: everything "fits"

    assert auto_batch_size(device=_BigDev()) == 8
    # tiny-HBM host still derives a smaller batch from memory
    class _SmallDev:
        def memory_stats(self):
            return {"bytes_limit": 8 << 30}

    assert auto_batch_size(device=_SmallDev()) <= 4


@pytest.mark.slow
def test_engine_alternate_geometry_matches_oracle(params, rng):
    """The engine is geometry-generic: a non-default core/halo must match
    the direct-forward oracle at that same geometry (outputs legitimately
    differ BETWEEN geometries through the per-window InstanceNorm stats —
    see best_core)."""
    core2, halo2 = 16, 2
    shape = (20, 34, 17)
    vol = rng.random(shape).astype(np.float32)
    af = (rng.random((24,) + shape) < 0.02).astype(np.float32)

    pred = SlidingWindowPredictor(
        params, batch_size=4, dtype=jnp.float32, base_filters=BASE,
        core=core2, halo=halo2,
    )
    out = pred.predict_volume(vol, af)

    wins = np.asarray(window.extract_windows(jnp.asarray(vol), core2, halo2))
    af_wins = np.stack(
        [np.asarray(window.extract_windows(jnp.asarray(af[c]), core2, halo2))
         for c in range(24)], axis=1)
    model = MICA(base=BASE)
    bb, ca, aa = model.apply(
        {"params": params}, jnp.asarray(wins)[..., None],
        jnp.moveaxis(jnp.asarray(af_wins), 1, -1))
    bb_p, ca_p, aa_p = postprocess_logits(bb, ca, aa)
    bb_v = np.asarray(window.stitch_windows(bb_p[..., 0], shape, core2, halo2))
    # 5e-4: the engine's fori_loop program and the flat oracle apply fuse
    # differently, and f32 reduction reassociation through the InstanceNorm
    # stats drifts a handful of probabilities by ~1.5e-4 at this geometry
    np.testing.assert_allclose(out["backbone_probability"], bb_v, atol=5e-4)


@pytest.mark.slow
def test_engine_partial_chunk_padding_blind_writes(params, rng):
    """n_valid not a multiple of batch: the tail chunk carries padding
    windows (gathered repeats of the last real start).  The core-blend
    scatter writes those blindly — exactness relies on duplicates being
    bitwise identical outputs, which this asserts end to end."""
    shape = (30, 24, 13)  # 3x2x2 = 12 windows, all nonzero
    vol = rng.random(shape).astype(np.float32) + 0.1
    af = (rng.random((24,) + shape) < 0.02).astype(np.float32)

    pred = SlidingWindowPredictor(
        params, batch_size=5, dtype=jnp.float32, base_filters=BASE,
        core=CORE, halo=HALO,
    )  # 12 valid windows -> 3 chunks of 5 with 3 padding repeats
    out = pred.predict_volume(vol, af)
    assert pred.timing["n_empty"] == 0

    bb_v, ca_v, aa_v = _reference_prediction(params, vol, af)
    np.testing.assert_allclose(out["backbone_probability"], bb_v, atol=1e-4)
    np.testing.assert_allclose(out["carbon_alpha_probability"], ca_v,
                               atol=1e-4)
    np.testing.assert_allclose(out["amino_acid_probability"], aa_v,
                               atol=1e-4)
