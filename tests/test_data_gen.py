import numpy as np

from mica_tpu.io import mrc as mrc_io
from mica_tpu.io import pdb as pdb_io
from mica_tpu.train import data as data_mod
from mica_tpu.utils.metrics import MetricsLogger

from synthetic import make_chain



import pytest

pytestmark = pytest.mark.slow  # see pyproject: -m 'not slow' fast subset

def _make_inputs(tmp_path, n_res=20, shape=(60, 56, 52)):
    ca = make_chain(n_res, shape, seed=1)
    seq = "MKTAYIAKQRQISFVKSHFS"[:n_res]
    density = np.zeros(shape, np.float32)
    idx = np.rint(ca).astype(int)
    density[idx[:, 0], idx[:, 1], idx[:, 2]] = 5.0
    # (sections=z, rows=y, cols=x) on disk
    mrc_io.write_mrc(tmp_path / "map.mrc", np.transpose(density, (2, 1, 0)),
                     voxel_size=1.0)
    pdb_io.write_ca_pdb(tmp_path / "model.pdb", [ca],
                        res_names_by_chain=[list(seq)])
    return ca, seq


def test_build_training_grids(tmp_path):
    ca, seq = _make_inputs(tmp_path)
    ds = data_mod.build_training_grids(
        str(tmp_path / "map.mrc"), str(tmp_path / "model.pdb")
    )
    assert len(ds) >= 1
    density, af3, bb, cam, aam = ds[0]
    assert density.shape == (64, 64, 64)
    assert af3.shape == (24, 64, 64, 64)
    assert bb.shape == cam.shape == aam.shape == (64, 64, 64)
    # labels are in range
    assert set(np.unique(bb)).issubset({0, 1, 2, 3})
    assert set(np.unique(cam)).issubset({0, 1, 2, 3})
    assert aam.min() >= 0 and aam.max() <= 20
    # the CA-mask class-3 count across kept windows is > 0
    assert sum((ds[i][3] == 3).sum() for i in range(len(ds))) > 0
    # AF3 CA channel mirrors CA atoms
    assert sum(ds[i][1][0].sum() for i in range(len(ds))) > 0

    # density filter: every kept window has signal
    for i in range(len(ds)):
        assert ds[i][0].max() >= 0.01


def test_array_dataset_roundtrip(tmp_path):
    _make_inputs(tmp_path)
    ds = data_mod.build_training_grids(
        str(tmp_path / "map.mrc"), str(tmp_path / "model.pdb")
    )
    ds.save(tmp_path / "packed.npz")
    ds2 = data_mod.ArrayDataset.load(tmp_path / "packed.npz")
    assert len(ds2) == len(ds)
    np.testing.assert_allclose(ds2[0][0], ds[0][0], atol=1e-6)
    np.testing.assert_array_equal(ds2[0][3], ds[0][3])


def test_npz_grids_dataset(tmp_path):
    """Reference on-disk Grids layout reads unchanged."""
    base = tmp_path / "Grids"
    rng = np.random.default_rng(0)
    names = ["normalized_maps", "BB_masks", "CA_masks", "AA_masks"] + [
        f"{t}_encodings" for t in data_mod.CHANNEL_NAMES
    ]
    for name in names:
        d = base / name / "0001"
        d.mkdir(parents=True)
        grid = (
            rng.random((64, 64, 64)).astype(np.float32)
            if "mask" not in name
            else rng.integers(0, 4, (64, 64, 64))
        )
        np.savez(d / "grid_i0_j0_k0.npz", grid=grid)
    ds = data_mod.NpzGridsDataset.from_root(str(base))
    assert len(ds) == 1
    density, af3, bb, cam, aam = ds[0]
    assert density.shape == (64, 64, 64)
    assert af3.shape == (24, 64, 64, 64)


def test_batch_iterator(tmp_path):
    _make_inputs(tmp_path)
    ds = data_mod.build_training_grids(
        str(tmp_path / "map.mrc"), str(tmp_path / "model.pdb")
    )
    n = len(ds)
    batches = list(data_mod.batch_iterator(ds, 1, shuffle=False))
    assert len(batches) == n
    assert batches[0][0].shape == (1, 64, 64, 64)


def test_metrics_logger(tmp_path):
    m = MetricsLogger(str(tmp_path), run_name="t")
    m.log_batch({"total_loss": 1.0})
    m.log_epoch(0, {"total_loss": 1.0}, {"total_loss": 2.0}, lr=1e-4)
    m.close()
    lines = (tmp_path / "t.metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    import json

    rec = json.loads(lines[1])
    assert rec["kind"] == "epoch" and rec["val_total_loss"] == 2.0
