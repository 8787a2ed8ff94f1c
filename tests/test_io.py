import numpy as np

from mica_tpu.io import fasta, mrc, pdb


def test_mrc_roundtrip(tmp_path, rng):
    data = rng.normal(size=(10, 12, 14)).astype(np.float32)
    path = tmp_path / "vol.mrc"
    mrc.write_mrc(path, data, voxel_size=1.5, origin=(1.0, 2.0, 3.0),
                  nstart=(4, 5, 6))
    vol = mrc.read_mrc(path)
    np.testing.assert_array_equal(vol.data, data)
    np.testing.assert_allclose(vol.voxel_size, [1.5, 1.5, 1.5], rtol=1e-6)
    assert vol.header.origin == (1.0, 2.0, 3.0)
    assert (vol.header.nxstart, vol.header.nystart, vol.header.nzstart) == (4, 5, 6)


def test_mrc_to_xyz_standard_order(tmp_path, rng):
    # standard mapc,mapr,maps = 1,2,3: data is (z,y,x) -> xyz is transpose
    data = rng.normal(size=(4, 5, 6)).astype(np.float32)
    path = tmp_path / "vol.mrc"
    mrc.write_mrc(path, data, nstart=(7, 8, 9))
    vol = mrc.read_mrc(path)
    xyz, offset = vol.to_xyz()
    assert xyz.shape == (6, 5, 4)
    np.testing.assert_array_equal(xyz, np.transpose(data, (2, 1, 0)))
    np.testing.assert_array_equal(offset, [7, 8, 9])


def test_mrc_to_xyz_permuted_order(tmp_path, rng):
    # mapc,mapr,maps = 2,3,1: cols=Y, rows=Z, sections=X
    data = rng.normal(size=(4, 5, 6)).astype(np.float32)  # (sec, row, col)
    path = tmp_path / "vol.mrc"
    mrc.write_mrc(path, data, nstart=(7, 8, 9), axis_order=(2, 3, 1))
    vol = mrc.read_mrc(path)
    xyz, offset = vol.to_xyz()
    # X axis <- sections (len 4), Y <- cols (6), Z <- rows (5)
    assert xyz.shape == (4, 6, 5)
    np.testing.assert_array_equal(xyz, np.transpose(data, (0, 2, 1)))
    # offset: X from nzstart(sections)=9, Y from nxstart(cols)=7, Z from nystart=8
    np.testing.assert_array_equal(offset, [9, 7, 8])


def test_pdb_roundtrip(tmp_path):
    lines = [
        "ATOM      1  N   MET A   1      11.104   6.134  -6.504  1.00  0.00           N",
        "ATOM      2  CA  MET A   1      11.639   6.071  -5.147  1.00 10.50           C",
        "ATOM      3  CA  ALA B   2       1.000   2.000   3.000  1.00  0.00           C",
    ]
    p = tmp_path / "m.pdb"
    p.write_text("\n".join(lines) + "\nEND\n")
    atoms = pdb.parse_pdb(p)
    assert len(atoms) == 3
    assert list(atoms["name"]) == ["N", "CA", "CA"]
    assert pdb.chains(atoms) == ["A", "B"]
    ca = pdb.select(atoms, name="CA")
    assert len(ca) == 2
    np.testing.assert_allclose(pdb.coords(ca)[1], [1.0, 2.0, 3.0])

    out = tmp_path / "out.pdb"
    pdb.write_pdb(out, atoms)
    atoms2 = pdb.parse_pdb(out)
    np.testing.assert_allclose(pdb.coords(atoms2), pdb.coords(atoms), atol=1e-3)
    assert list(atoms2["res_name"]) == list(atoms["res_name"])


def test_chain_sequence(tmp_path):
    coords = [[[0, 0, 0], [3.8, 0, 0]]]
    pdb.write_ca_pdb(tmp_path / "ca.pdb", coords, res_names_by_chain=[["M", "A"]])
    atoms = pdb.parse_pdb(tmp_path / "ca.pdb")
    assert pdb.chain_sequence(atoms, "A") == "MA"


def test_fasta_chain_headers(tmp_path):
    text = """>prot1|Chains A, B
MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ
>dna1
ACGTACGTACGTACGT
>prot2
MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQ
>short
MKT
"""
    entries = fasta.parse_fasta(text)
    assert len(entries) == 2
    assert entries[0].name == "prot1"
    assert entries[0].chain_ids == ["A", "B"]
    # auto-assigned deterministic chain id, skipping used A,B
    assert entries[1].chain_ids == ["C"]


def test_fasta_nonstandard_residue_rewrite():
    entries = fasta.parse_fasta(">p|Chains A\nMKTXYIAKQRQISFVK\n")
    assert entries[0].sequence == "MKTAYIAKQRQISFVK"


def test_fasta_duplicate_names():
    text = ">p|Chains A\nMKTAYIAKQRQISFVK\n>p|Chains B\nMKTAYIAKQRQISFVK\n"
    entries = fasta.parse_fasta(text)
    assert [e.name for e in entries] == ["p", "p_1"]
