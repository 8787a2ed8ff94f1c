import numpy as np

from mica_tpu.io import pdb
from mica_tpu.ops import masks, rasterize


def _atoms(records):
    """records: list of (name, res_name, chain, res_id, x, y, z)."""
    rows = [
        (i + 1, n, "", rn, c, rid, "", x, y, z, 1.0, 0.0, n[:1], False)
        for i, (n, rn, c, rid, x, y, z) in enumerate(records)
    ]
    return np.array(rows, dtype=pdb.ATOM_DTYPE)


def test_rasterize_nearest():
    atoms = _atoms([
        ("CA", "ALA", "A", 1, 2.0, 3.0, 4.0),
        ("N", "ALA", "A", 1, 2.4, 3.0, 4.0),   # rounds to same-ish voxel
        ("CB", "CYS", "A", 2, 7.0, 1.0, 0.0),
    ])
    vol = rasterize.rasterize_af3_encoding(atoms, (10, 10, 10))
    # channel 0 = CA at (2,3,4)
    assert vol[0, 2, 3, 4] == 1.0 and vol[0].sum() == 1.0
    # channel 1 = N at (2,3,4) (2.4 rounds to 2)
    assert vol[1, 2, 3, 4] == 1.0
    # ALA channel (4 + 0) set by both ALA atoms
    assert vol[4, 2, 3, 4] == 1.0
    # CYS channel (4 + 1) from the CB atom
    assert vol[5, 7, 1, 0] == 1.0
    # CB itself is not a backbone channel
    assert vol[:4, 7, 1, 0].sum() == 0.0


def test_rasterize_origin_nstart():
    atoms = _atoms([("CA", "GLY", "A", 1, 12.0, 13.0, 14.0)])
    vol = rasterize.rasterize_af3_encoding(
        atoms, (8, 8, 8), origin=(10.0, 10.0, 10.0), nstart=(0, 1, 2)
    )
    # index = coord - origin - nstart = (2, 2, 2)
    assert vol[0, 2, 2, 2] == 1.0


def test_rasterize_trilinear_mass():
    atoms = _atoms([("CA", "ALA", "A", 1, 2.5, 3.25, 4.0)])
    vol = rasterize.rasterize_af3_encoding(atoms, (10, 10, 10), mode="trilinear")
    np.testing.assert_allclose(vol[0].sum(), 1.0, rtol=1e-6)
    assert (vol <= 1.0).all() and (vol >= 0.0).all()


def test_voxel_world_roundtrip(rng):
    coords = rng.normal(size=(5, 3)) * 20
    idx = rasterize.world_to_voxel(coords, (1.0, 2.0, 3.0), 1.0, (4, 5, 6))
    back = rasterize.voxel_to_world(idx, (1.0, 2.0, 3.0), 1.0, (4, 5, 6))
    np.testing.assert_allclose(back, coords, atol=1e-9)


def test_backbone_mask_labels():
    atoms = _atoms([
        ("CA", "ALA", "A", 1, 5.0, 5.0, 5.0),
        ("CB", "ALA", "A", 1, 8.0, 8.0, 8.0),
    ])
    m = masks.backbone_mask(atoms, (12, 12, 12))
    assert m[5, 5, 5] == 3  # backbone atom
    assert m[8, 8, 8] == 2  # other atom
    assert m[4, 4, 4] == 1 and m[6, 6, 6] == 1  # 26-neighbor shell
    assert m[7, 7, 7] == 1  # neighbor of the CB atom
    assert m[0, 0, 0] == 0
    # shell never overwrites atoms
    assert (m == 3).sum() == 1 and (m == 2).sum() == 1


def test_carbon_alpha_mask_labels():
    atoms = _atoms([
        ("CA", "ALA", "A", 1, 5.0, 5.0, 5.0),
        ("N", "ALA", "A", 1, 2.0, 2.0, 2.0),
    ])
    m = masks.carbon_alpha_mask(atoms, (10, 10, 10))
    assert m[5, 5, 5] == 3  # CA
    assert m[2, 2, 2] == 2  # N is "other" for the CA mask
    assert m[4, 5, 5] == 1


def test_amino_acid_mask_labels():
    atoms = _atoms([
        ("CA", "LEU", "A", 1, 5.0, 5.0, 5.0),   # type 10
        ("CA", "CYS", "A", 2, 7.0, 5.0, 5.0),   # type 2
    ])
    m = masks.amino_acid_mask(atoms, (12, 12, 12))
    assert m[5, 5, 5] == 0 and m[7, 5, 5] == 0  # CA voxels forced background
    assert m[4, 5, 5] == 10  # LEU neighborhood
    assert m[8, 5, 5] == 2  # CYS neighborhood
    # collision at x=6: neighbor of both -> min type wins (CYS=2)
    assert m[6, 5, 5] == 2
