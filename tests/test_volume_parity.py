"""End-to-end VOLUME-level parity vs the reference code path.

Drives the reference's own preprocessing + sliding-window prediction +
reconstruction stack (utils/preprocessing.py:80-148, utils/predict.py
run_prediction: strategy selection, per-grid npz postprocess, halo-stripped
paste-back, predict.py:307-512) on a synthetic map with converted random
weights, and asserts full-volume agreement with mica_tpu's
``infer.pipeline.predict_map``.

This goes beyond window-level forward parity (test_model_parity.py): it
covers resampling, normalization, MRC axis-order/nstart handling, window
layout, postprocess ordering and reconstruction conventions.  When the
trained Zenodo checkpoint and the EMD-15635 map become available, the same
harness gives the north-star Dice check with real artifacts.
"""

import shutil
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = [
    pytest.mark.skipif(
        not (REF / "utils" / "predict.py").exists(),
        reason="reference snapshot not available",
    ),
    pytest.mark.slow,  # reference-oracle pipeline runs (minutes each)
]

torch = pytest.importorskip("torch")

import mrcfile_shim  # noqa: E402

sys.modules.setdefault("mrcfile", mrcfile_shim)
# BioPython is imported at module level by the reference preprocessing but
# unused on the resample/normalize path this test drives.  Install the shared
# shim unconditionally: its assignment semantics + inert-attribute fallback
# make module import-order (e.g. after test_trace_oracle) irrelevant.
import bio_shim  # noqa: E402

bio_shim.install()
sys.path.insert(0, str(REF))

from mica_tpu.io import mrc as mrc_io  # noqa: E402
from mica_tpu.models import convert  # noqa: E402
from mica_tpu.utils.parity import dice  # noqa: E402


BASE = 16  # the quick configuration; base=64 runs as its own (slower) test


def _small_torch_mica(base=BASE):
    """Reference MICA at the requested base_filters.

    For base != 64 the reference's hardcoded head input channels
    (192/196/200, model.py:291-293) are rebuilt at the scaled sizes
    (3*base, +4, +4), mirroring what the flax model does naturally; at
    base=64 the network is used UNMODIFIED — the production
    configuration.
    """
    from models.model import MICA as TorchMICA
    from models.model import TaskSpecificDecoderHead

    torch.manual_seed(3)
    m = TorchMICA(base_filters=base)
    if base != 64:
        fpn_ch = 3 * base
        m.backbone_head = TaskSpecificDecoderHead(fpn_ch, 4, 0)
        m.ca_head = TaskSpecificDecoderHead(fpn_ch + 4, 4, 0)
        m.aa_head = TaskSpecificDecoderHead(fpn_ch + 8, 21, 0)
    m.eval()
    return m


def _make_map(tmp: Path, shape_xyz=(28, 36, 32)) -> Path:
    """Synthetic density map with permuted axes, nonzero nstart and a
    non-1.0 voxel size — the header cases that silently corrupt
    coordinates when mishandled."""
    rng = np.random.default_rng(11)
    # canonical (x, y, z) content: a few gaussian blobs on noise
    g = np.indices(shape_xyz, dtype=np.float32)
    vol = rng.random(shape_xyz, dtype=np.float32) * 0.1
    for _ in range(6):
        c = (rng.uniform(0.2, 0.8, 3) * np.asarray(shape_xyz)).astype(
            np.float32)
        r2 = ((g[0] - c[0]) ** 2 + (g[1] - c[1]) ** 2 + (g[2] - c[2]) ** 2)
        vol += np.exp(-r2 / (2 * 3.0 ** 2)).astype(np.float32)

    # file layout: cols carry Y (mapc=2), rows carry X (mapr=1),
    # sections carry Z (maps=3) -> data[s, r, c] = vol[x=r, y=c, z=s]
    data = np.transpose(vol, (2, 0, 1))  # (z, x, y) = (sections, rows, cols)
    path = tmp / "synthetic.mrc"
    mrc_io.write_mrc(
        path, data, voxel_size=(1.25, 1.25, 1.25),
        origin=(3.0, -2.0, 5.0), nstart=(4, -3, 2), axis_order=(2, 1, 3),
    )
    return path


def _run_reference(tmp: Path, map_path: Path, torch_model,
                   core: int = 16, base: int = BASE) -> dict:
    from utils.create_grids import GridCreator
    from utils.preprocessing import DataPreprocessor

    work = tmp / "ref"
    work.mkdir()
    norm_path = work / "resampled_normalized_map.mrc"
    pre = DataPreprocessor(str(map_path), str(work / "AF3_results"),
                           normalized_map_path=str(norm_path), quiet=True)
    # (the reference method returns None even on success — check the artifact)
    pre.resample_and_normalize_map(target_voxel_size=1.0)
    assert norm_path.exists(), "reference resample/normalize failed"

    # the predictor globs <grids_path>/normalized_map_grids/*.npz
    # (predict.py:269, modeler.py:688)
    grids_dir = work / "grids"
    gc = GridCreator(quiet=True)
    # 32-cube windows (core 16 + 2*8 halo): the reference reconstruction
    # hardcodes padding=8 (predict.py:439), so only the core size shrinks
    gc.create_normalized_map_grids(str(norm_path),
                                   str(grids_dir / "normalized_map_grids"),
                                   grid_size=core, padding=8)

    ckpt = work / "model.pth"
    torch.save({"model_state_dict": torch_model.state_dict()}, ckpt)

    import utils.predict as ref_predict

    # the reference hardcodes full-size MICA() (predict.py:233); substitute
    # the small oracle configuration
    orig = ref_predict.MICA
    ref_predict.MICA = lambda: _small_torch_mica(base)
    try:
        predictor = ref_predict.CryoEMPredictor(
            str(ckpt), str(grids_dir), str(work / "out"),
            save_output=False, device="cpu", quiet=True,
        )
        ok, volumes = predictor.run_prediction()
    finally:
        ref_predict.MICA = orig
    assert ok, "reference prediction pipeline failed"
    return volumes


def _run_ours(map_path: Path, torch_model, core: int = 16,
              base: int = BASE, batch: int = 8) -> dict:
    import jax.numpy as jnp

    from mica_tpu.infer.pipeline import predict_map

    params = convert.torch_state_dict_to_params(torch_model.state_dict())
    return predict_map(
        str(map_path), params, batch_size=batch, dtype=jnp.float32,
        base_filters=base, core=core, halo=8,
    )


def _assert_parity(mine, ref):

    for key in ("backbone_probability", "carbon_alpha_probability"):
        a, b = np.asarray(mine[key]), ref[key]
        assert a.shape == b.shape, (key, a.shape, b.shape)
        # probability fields agree numerically.  The bound is loose
        # because RANDOM weights amplify the ~2e-5 cubic-resample
        # difference through ~20 InstanceNorms (measured ~6e-3 here); a
        # trained network is far less chaotic.  The Dice checks below are
        # the operative parity gate.
        max_diff = np.abs(a - b).max()
        assert max_diff < 2e-2, (key, max_diff)
        # and the thresholded masks are near-identical (the north-star
        # metric: Dice >= 0.999).  With RANDOM weights the probability
        # field is nearly flat, so voxels whose distance to the threshold
        # is below the numeric tolerance flip arbitrarily between the two
        # implementations — exclude that flip-eligible band from the Dice
        # (with the real trained checkpoint the field is bimodal and the
        # band is empty); keep a sanity floor on the raw Dice.
        thr = np.quantile(b, 0.7)
        decided = np.abs(b - thr) > max_diff
        d = dice((a > thr) & decided, (b > thr) & decided)
        assert d >= 0.999, (key, d)
        assert dice(a > thr, b > thr) >= 0.99, (key, dice(a > thr, b > thr))

    aa_mine = np.asarray(mine["amino_acid_probability"])
    aa_ref = ref["amino_acid_probability"]
    assert aa_mine.shape == aa_ref.shape
    assert np.abs(aa_mine - aa_ref).max() < 2e-2

    pred_mine = np.asarray(mine["amino_acid_prediction"])
    pred_ref = ref["amino_acid_prediction"]
    # same flip-band logic: argmax is only decided where the top-2 margin
    # exceeds the numeric tolerance between the implementations
    aa_tol = np.abs(aa_mine - aa_ref).max()
    top2 = np.partition(aa_ref, -2, axis=0)[-2:]
    margin = top2[1] - top2[0]
    decided = margin > 2 * aa_tol
    agree = float(np.mean(pred_mine[decided] == pred_ref[decided]))
    assert agree >= 0.999, f"amino-acid argmax agreement {agree}"
    # raw sanity floor (no margin exclusion): random weights leave a
    # tolerance-band of arbitrary flips that grows with network depth —
    # measured 0.9892 at base=64 (decided-region agreement 0.999+); a
    # trained checkpoint's bimodal field has no such band
    assert float(np.mean(pred_mine == pred_ref)) >= 0.98


def test_volume_parity(tmp_path):
    map_path = _make_map(tmp_path)
    model = _small_torch_mica()
    ref = _run_reference(tmp_path, map_path, model)
    mine = _run_ours(map_path, model)
    _assert_parity(mine, ref)


def test_volume_parity_base64_production(tmp_path):
    """VERDICT r2 #4: ONE recorded end-to-end oracle comparison of the
    PRODUCTION configuration — base_filters=64, window 64 / core 48 /
    halo 8 — through the full path: MRC read -> resample -> normalize ->
    window layout -> forward -> postprocess -> reconstruction, vs the
    reference's own pipeline (utils/predict.py:307-512) with the
    UNMODIFIED reference network.  The map (52x56x50 at 1.25 A ->
    65x70x62 resampled) yields a 2x2x2 window lattice, so stitching and
    edge cropping are exercised, not just a single window."""
    map_path = _make_map(tmp_path, shape_xyz=(52, 56, 50))
    model = _small_torch_mica(64)
    ref = _run_reference(tmp_path, map_path, model, core=48, base=64)
    mine = _run_ours(map_path, model, core=48, base=64, batch=4)
    _assert_parity(mine, ref)


def test_per_window_dump(tmp_path):
    """The per-window npz artifact mode (debug/parity triage)."""
    import jax.numpy as jnp

    from mica_tpu.infer.pipeline import predict_map
    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    map_path = _make_map(tmp_path)
    model = MICA(base=16, dtype=jnp.float32)
    params = init_params_fast(
        model, (jnp.zeros((1, 8, 8, 8, 1)), jnp.zeros((1, 8, 8, 8, 24)))
    )
    dump_dir = tmp_path / "windows"
    out = predict_map(str(map_path), params, batch_size=4, dtype=jnp.float32,
                      base_filters=16, core=16, halo=8,
                      dump_windows_dir=str(dump_dir))
    files = sorted(dump_dir.glob("win_*.npz"))
    assert files, "no window artifacts written"
    win = np.load(files[0])
    core = 16
    assert win["backbone"].shape == (core, core, core)
    assert win["amino_acid"].shape == (core, core, core, 20)
    # the dumped core must match the reconstructed volume at its start
    s = win["start"]
    bb = np.asarray(out["backbone_probability"])
    shape = bb.shape
    sl = tuple(slice(int(s[a]), min(int(s[a]) + core, shape[a]))
               for a in range(3))
    blk = win["backbone"][: sl[0].stop - sl[0].start,
                          : sl[1].stop - sl[1].start,
                          : sl[2].stop - sl[2].start]
    np.testing.assert_allclose(bb[sl], blk, rtol=0, atol=1e-6)
