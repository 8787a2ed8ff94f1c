import json

import numpy as np
import pytest

from mica_tpu.io import cif as cif_io
from mica_tpu.io import mrc as mrc_io
from mica_tpu.io import pdb as pdb_io
from mica_tpu.models import segmenter
from mica_tpu.prep import af3_json, af3_results, dock

CIF_SAMPLE = """data_test
#
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_alt_id
_atom_site.label_comp_id
_atom_site.label_asym_id
_atom_site.label_entity_id
_atom_site.label_seq_id
_atom_site.auth_seq_id
_atom_site.auth_asym_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.occupancy
_atom_site.B_iso_or_equiv
ATOM 1 N N . MET A 1 1 1 A 11.104 6.134 -6.504 1.00 50.00
ATOM 2 C CA . MET A 1 1 1 A 11.639 6.071 -5.147 1.00 50.00
ATOM 3 C CA . ALA B 1 2 2 B 1.000 2.000 3.000 1.00 40.00
HETATM 4 O O . HOH C 1 3 3 C 0.000 0.000 0.000 1.00 30.00
#
"""


def test_cif_parse():
    atoms = cif_io.parse_cif_atoms(CIF_SAMPLE)
    assert len(atoms) == 3  # HETATM skipped
    assert list(atoms["name"]) == ["N", "CA", "CA"]
    assert list(atoms["chain"]) == ["A", "A", "B"]
    np.testing.assert_allclose(atoms["x"][1], 11.639)
    assert atoms["bfactor"][2] == 40.0


def test_af3_json(tmp_path):
    fasta = tmp_path / "p.fasta"
    fasta.write_text(">prot1|Chains A, B\nMKTAYIAKQRQISFVKSHFSRQ\n>dna\nACGTACGTACGT\n")
    files = af3_json.convert_fasta_to_af3_json(str(fasta), str(tmp_path))
    assert len(files) == 1
    payload = json.loads((tmp_path / "p" / "AF3_JSON" / "prot1.json").read_text())
    assert payload[0]["dialect"] == "alphafold3"
    assert len(payload[0]["sequences"]) == 2
    assert payload[0]["sequences"][0]["proteinChain"]["id"] == "A"


def test_int_to_chain_and_rename():
    assert af3_results.int_to_chain(0) == "A"
    assert af3_results.int_to_chain(26) == "a"
    assert af3_results.int_to_chain(61) == "9"
    with pytest.raises(af3_results.OutOfChainsError):
        af3_results.int_to_chain(62)


def _make_many_chain_cif(n_chains: int) -> str:
    """CIF with n_chains single-CA chains, label_asym_id A..Z, AA, AB, ..."""

    def asym_id(i):
        s = ""
        i += 1
        while i > 0:
            i, r = divmod(i - 1, 26)
            s = chr(ord("A") + r) + s
        return s

    header = CIF_SAMPLE.split("ATOM 1")[0]
    rows = []
    for i in range(n_chains):
        cid = asym_id(i)
        rows.append(
            f"ATOM {i+1} C CA . ALA {cid} {i+1} 1 1 {cid} "
            f"{float(i):.3f} 0.000 0.000 1.00 50.00"
        )
    return header + "\n".join(rows) + "\n#\n"


def test_cif_multichar_chain_ids_survive_and_rename():
    """AF3 CIFs with >26 chains use multi-char asym IDs ("AA", "AB", ...);
    they must stay distinct through parsing and be renamed into the 62-ID
    space (reference: process_AF3_results.py:145-198)."""
    n = 30
    atoms = cif_io.parse_cif_atoms(_make_many_chain_cif(n))
    assert len(atoms) == n
    # distinct chains preserved by the parser (no premature truncation)
    assert len(pdb_io.chains(atoms)) == n
    assert "AA" in atoms["chain"] and "AD" in atoms["chain"]

    mapping = af3_results.rename_chains(atoms)
    renamed = pdb_io.chains(atoms)
    assert len(renamed) == n
    assert all(len(c) == 1 and c in pdb_io.CHAIN_IDS for c in renamed)
    # single-char IDs already valid are preserved; multi-char got fresh IDs
    assert mapping["A"] == "A"
    assert len(set(mapping.values())) == n


def test_cif_over_62_chains_raises():
    atoms = cif_io.parse_cif_atoms(_make_many_chain_cif(63))
    with pytest.raises(af3_results.OutOfChainsError):
        af3_results.rename_chains(atoms)


def test_process_af3_results(tmp_path):
    res_dir = tmp_path / "AF3_results"
    (res_dir / "prot1").mkdir(parents=True)
    (res_dir / "prot1" / "fold_prot1_model_0.cif").write_text(CIF_SAMPLE)
    out = af3_results.process_af3_results(str(res_dir), split_domains=False)
    assert len(out["converted"]) == 1
    assert (tmp_path / "AF3_PDBs" / "fold_prot1_model_0.pdb").exists()
    ranked = tmp_path / "AF3_structures" / "prot1" / "ranked_0.pdb"
    assert ranked.exists()
    atoms = pdb_io.parse_pdb(ranked)
    assert set(atoms["chain"]) == {"A"}
    assert len(out["chains"]) == 2


def _two_domain_coords(n1=60, n2=60, sep=35.0, seed=0):
    from synthetic import make_chain

    d1 = make_chain(n1, (64, 64, 64), seed)
    d2 = make_chain(n2, (64, 64, 64), seed + 5) + np.array([sep, 0, 0])
    # short linker
    return np.concatenate([d1, d2])


def test_geometric_segmenter_two_domains():
    coords = _two_domain_coords()
    labels = segmenter.segment_domains(coords)
    assert labels.shape == (120,)
    assert len(np.unique(labels)) == 2
    # split point near the middle
    first = labels[:50]
    second = labels[70:]
    assert len(np.unique(first)) == 1 and len(np.unique(second)) == 1
    assert first[0] != second[0]


def test_geometric_segmenter_single_domain():
    from synthetic import make_chain

    coords = make_chain(80, (64, 64, 64), 2)
    labels = segmenter.segment_domains(coords)
    assert len(np.unique(labels)) == 1


def test_learned_segmenter_runs():
    import jax
    import jax.numpy as jnp

    from mica_tpu.models.init import init_params_fast

    model_cls = segmenter.build_segmenter()
    model = model_cls(dim=32, z_dim=8, blocks=1, n_domains=4)
    n = 12
    coords = _two_domain_coords(6, 6, 20.0)[:n]
    onehot = jnp.zeros((n, 20))
    dist = jnp.asarray(
        np.linalg.norm(coords[:, None] - coords[None], axis=-1), jnp.float32
    )
    frames = jnp.asarray(segmenter._pseudo_frames(coords), jnp.float32)
    params = init_params_fast(
        model, (onehot, dist, frames, jnp.asarray(coords, jnp.float32), jnp.arange(n))
    )
    logits, conf = model.apply(
        {"params": params}, onehot, dist, frames,
        jnp.asarray(coords, jnp.float32), jnp.arange(n),
    )
    assert logits.shape == (n, 4)
    assert np.isfinite(np.asarray(logits)).all()


def test_dock_threshold_and_mask(tmp_path, rng):
    data = rng.random((20, 20, 20)).astype(np.float32)
    mrc_io.write_mrc(tmp_path / "map.mrc", data, voxel_size=1.0)
    out = dock.threshold_map(str(tmp_path / "map.mrc"), 0.5, str(tmp_path / "t.mrc"))
    t = mrc_io.read_mrc(out)
    assert (t.data[t.data != 0] >= 0.5).all()

    # docked model at center: masking should zero the region around it
    coords = [[[10.0, 10.0, 10.0], [11.0, 10.0, 10.0]]]
    pdb_io.write_ca_pdb(tmp_path / "docked.pdb", coords,
                        res_names_by_chain=[["A", "A"]])
    out2 = dock.mask_docked_region(out, str(tmp_path / "docked.pdb"),
                                   str(tmp_path / "m.mrc"))
    m = mrc_io.read_mrc(out2)
    assert m.data[10, 10, 10] == 0.0
    assert m.data.sum() < t.data.sum()


def test_dock_mask_permuted_axis_order(tmp_path, rng):
    """mask_docked_region must hit the right voxels on maps whose file
    axis order is permuted (mapc/mapr/maps != 1/2/3): the naive raw-array
    reversal previously masked wrong voxels or nothing."""
    # canonical content: uniform density
    # axis_order=(3,2,1): cols carry Z, rows carry Y, sections carry X,
    # so the file array IS the canonical [x, y, z] array here
    vol_xyz = np.full((8, 10, 12), 1.0, np.float32)
    mrc_io.write_mrc(tmp_path / "perm.mrc", vol_xyz,
                     voxel_size=1.0, axis_order=(3, 2, 1))
    pdb_io.write_ca_pdb(tmp_path / "docked.pdb", [[[2.0, 5.0, 9.0]]],
                        res_names_by_chain=[["A"]])
    out = dock.mask_docked_region(
        str(tmp_path / "perm.mrc"), str(tmp_path / "docked.pdb"),
        str(tmp_path / "masked.mrc"), core_fraction=1.0,
        dilate_angstrom=0.5,
    )
    masked = mrc_io.read_mrc(out)
    mx, _ = masked.to_xyz()
    assert mx.shape == (8, 10, 12)
    assert mx[2, 5, 9] == 0.0, "atom voxel not masked on permuted map"
    assert (mx != 0).sum() > 0.9 * mx.size  # only the local region zeroed


def test_dock_resume_reestablishes_mask_chain(tmp_path, rng):
    """Resume must not dock against the unmasked map: when a model's
    output already exists, its mask still applies before the next one."""
    data = np.full((16, 16, 16), 1.0, np.float32)
    mrc_io.write_mrc(tmp_path / "map.mrc", data, voxel_size=1.0)
    pdb_io.write_ca_pdb(tmp_path / "m1.pdb", [[[8.0, 8.0, 8.0]]])
    # pre-docked output exists; dry_run so no real phenix runs
    (tmp_path / "work").mkdir()
    pdb_io.write_ca_pdb(tmp_path / "work" / "m1_docked.pdb",
                        [[[8.0, 8.0, 8.0]]])
    res = dock.dock_structures(
        str(tmp_path / "map.mrc"), [str(tmp_path / "m1.pdb")],
        resolution=3.0, contour_level=0.1, work_dir=str(tmp_path / "work"),
        dry_run=True,
    )
    assert res["docked"], "pre-docked model not picked up"
    next_map = tmp_path / "work" / "docking_map_1.mrc"
    assert next_map.exists(), "mask chain not re-established on resume"
    m = mrc_io.read_mrc(next_map)
    assert m.data[8, 8, 8] == 0.0


def test_dock_merge_blank_and_excess_chains(tmp_path):
    """Blank chain IDs get reassigned (substring membership previously let
    '' through) and >62 chains raise OutOfChainsError."""
    pdb_io.write_ca_pdb(tmp_path / "b_docked.pdb", [[[0, 0, 0]]])
    atoms = pdb_io.parse_pdb(tmp_path / "b_docked.pdb")
    atoms["chain"] = ""
    pdb_io.write_pdb(tmp_path / "b_docked.pdb", atoms)
    merged = dock.merge_docked_models(
        [str(tmp_path / "b_docked.pdb")], str(tmp_path / "merged.pdb"))
    out = pdb_io.parse_pdb(merged)
    assert pdb_io.chains(out) == ["A"]


def test_dock_merge(tmp_path):
    pdb_io.write_ca_pdb(tmp_path / "d1_docked.pdb", [[[0, 0, 0], [3.8, 0, 0]]])
    pdb_io.write_ca_pdb(tmp_path / "d2_docked.pdb", [[[10, 0, 0], [13.8, 0, 0]]])
    merged = dock.merge_docked_models(
        [str(tmp_path / "d1_docked.pdb"), str(tmp_path / "d2_docked.pdb")],
        str(tmp_path / "merged.pdb"),
    )
    atoms = pdb_io.parse_pdb(merged)
    assert len(pdb_io.chains(atoms)) == 2
    assert len(atoms) == 4
