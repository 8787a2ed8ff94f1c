import numpy as np
import pytest

from mica_tpu.io import pdb as pdb_io
from mica_tpu.tools import allatom
from mica_tpu.trace.solver import ModelingConfig, Solver

from synthetic import make_scenario


def _helix_ca(n=20):
    """Ideal alpha-helix CA trace."""
    t = np.arange(n) * (100.0 * np.pi / 180.0)
    return np.stack([2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * np.arange(n)], axis=1)


@pytest.fixture(scope="module")
def rebuilt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("allatom")
    ca = _helix_ca(20)
    seq = "MKTAYIAKQRQISFVKSHFS"
    pdb_io.write_ca_pdb(tmp / "ca.pdb", [ca], res_names_by_chain=[list(seq)])
    out = allatom.rebuild_ca_model(str(tmp / "ca.pdb"), str(tmp / "aa.pdb"))
    assert out is not None
    return pdb_io.parse_pdb(out), ca, seq


def test_allatom_backbone_complete(rebuilt):
    atoms, ca, seq = rebuilt
    for name in ("N", "CA", "C", "O"):
        assert (atoms["name"] == name).sum() == len(ca), name
    # non-GLY residues must have CB
    n_gly = seq.count("G")
    assert (atoms["name"] == "CB").sum() == len(ca) - n_gly


def test_allatom_geometry(rebuilt):
    atoms, ca, seq = rebuilt
    coords = pdb_io.coords(atoms)
    by = {}
    for a, c in zip(atoms, coords):
        by[(int(a["res_id"]), str(a["name"]))] = c

    n_ca, ca_c, c_n, ca_ca = [], [], [], []
    for i in range(1, len(ca) + 1):
        n_ca.append(np.linalg.norm(by[(i, "N")] - by[(i, "CA")]))
        ca_c.append(np.linalg.norm(by[(i, "CA")] - by[(i, "C")]))
        if (i + 1, "N") in by:
            c_n.append(np.linalg.norm(by[(i, "C")] - by[(i + 1, "N")]))
            ca_ca.append(np.linalg.norm(by[(i, "CA")] - by[(i + 1, "CA")]))
    assert np.allclose(n_ca, 1.458, atol=0.1), np.round(n_ca, 2)
    assert np.allclose(ca_c, 1.525, atol=0.12), np.round(ca_c, 2)
    assert np.allclose(c_n, 1.329, atol=0.35), np.round(c_n, 2)
    # original CA positions preserved
    rebuilt_ca = pdb_io.coords(pdb_io.select(atoms, name="CA"))
    np.testing.assert_allclose(rebuilt_ca, ca, atol=1e-3)


def test_allatom_chirality(rebuilt):
    """L-amino acids: improper dihedral N-CA-C-CB must be negative (~-34)."""
    atoms, ca, seq = rebuilt
    coords = pdb_io.coords(atoms)
    by = {}
    for a, c in zip(atoms, coords):
        by[(int(a["res_id"]), str(a["name"]))] = c

    def dihedral(p0, p1, p2, p3):
        b0, b1, b2 = p1 - p0, p2 - p1, p3 - p2
        b1 /= np.linalg.norm(b1)
        v = b0 - np.dot(b0, b1) * b1
        w = b2 - np.dot(b2, b1) * b1
        return np.degrees(np.arctan2(np.dot(np.cross(b1, v), w), np.dot(v, w)))

    vals = []
    for i in range(1, len(ca) + 1):
        if (i, "CB") not in by:
            continue
        vals.append(dihedral(by[(i, "N")], by[(i, "CA")], by[(i, "C")], by[(i, "CB")]))
    vals = np.asarray(vals)
    # consistent L-chirality across all residues
    assert (np.sign(vals) == np.sign(vals[0])).all()
    assert 15 < np.abs(vals).mean() < 60, vals


def test_allatom_sidechains_and_splitting(tmp_path):
    # two fragments: chain break and residue gap
    ca1 = _helix_ca(8)
    ca2 = _helix_ca(8) + np.array([30.0, 0, 0])
    lines = []
    serial = 1
    for i, c in enumerate(ca1):
        lines.append(pdb_io.format_atom_line(serial, "CA", "ARG", "A", i + 1, c, element="C"))
        serial += 1
    for i, c in enumerate(ca2):
        lines.append(pdb_io.format_atom_line(serial, "CA", "TRP", "B", i + 50, c, element="C"))
        serial += 1
    (tmp_path / "ca.pdb").write_text("\n".join(lines) + "\nEND\n")
    out = allatom.rebuild_ca_model(str(tmp_path / "ca.pdb"), str(tmp_path / "aa.pdb"))
    atoms = pdb_io.parse_pdb(out)
    # ARG has 11 heavy atoms, TRP has 14
    assert (atoms["chain"] == "A").sum() == 8 * 11
    assert (atoms["chain"] == "B").sum() == 8 * 14
    assert np.isfinite(pdb_io.coords(atoms)).all()


def test_solver_end_to_end(tmp_path):
    ca, seq, vols = make_scenario(n_res=60, shape=(64, 64, 64), seed=3)

    # write fasta + AF3 template structure
    (tmp_path / "input").mkdir()
    fasta = tmp_path / "synth.fasta"
    fasta.write_text(f">synth|Chains A\n{seq}\n")
    af_dir = tmp_path / "input" / "AF3_structures" / "synth"
    af_dir.mkdir(parents=True)
    pdb_io.write_ca_pdb(af_dir / "ranked_0.pdb", [ca],
                        res_names_by_chain=[list(seq)])

    cfg = ModelingConfig(
        map_path=str(tmp_path / "emd_9999.mrc"),
        fasta_path=str(fasta),
        input_dir=str(tmp_path / "input"),
        output_path=str(tmp_path / "out"),
        protocol="AF3_struct",
        run_pulchra=True,
    )
    solver = Solver(cfg)
    assert solver.check_seq() == "success"
    solver.set_volumes(vols)
    solver._timed("clustering", solver._clustering)
    solver._timed("fragModeling", solver.frag_modeling)
    solver._timed("seqStructAlignWithAF3Structure", solver.align_af3)
    solver._timed("initialModelBuilding", solver.build_initial)
    solver._timed("gapFilling", solver.fill_gaps)
    all_atom = solver._timed("run_pulchra", solver.rebuild_all_atom)
    solver.time_record()

    # CA model exists and is close to ground truth
    model = pdb_io.parse_pdb(solver.ca_model_path)
    mca = pdb_io.select(model, name="CA")
    assert len(mca) > 0.6 * len(ca)
    d = np.linalg.norm(
        pdb_io.coords(mca)[:, None, :] - ca[None, :, :], axis=-1
    ).min(axis=1)
    assert np.median(d) < 1.5, f"median deviation {np.median(d)}"

    # all-atom model has side chains
    assert all_atom is not None
    aa_atoms = pdb_io.parse_pdb(all_atom)
    assert len(aa_atoms) > 4 * len(mca)

    # time cost CSV written
    assert "gapFilling" in (tmp_path / "out" / solver.time_log.split("/")[-1]).read_text()


# ---------------------------------------------------------------------------
# golden comparison against the reference PULCHRA binary (shipped, static)

_PULCHRA_BIN = "/root/reference/modules/pulchra304/bin/linux/pulchra"
_PULCHRA_EXAMPLE = "/root/reference/modules/pulchra304/examples/model.pdb"


def _rmsd_by_atom(a, b, names):
    am = {(int(r), str(n)): (x, y, z) for r, n, x, y, z in
          zip(a["res_id"], a["name"], a["x"], a["y"], a["z"])}
    bm = {(int(r), str(n)): (x, y, z) for r, n, x, y, z in
          zip(b["res_id"], b["name"], b["x"], b["y"], b["z"])}
    common = [k for k in am if k in bm and k[1] in names]
    d = np.array([np.subtract(am[k], bm[k]) for k in common])
    return float(np.sqrt((d ** 2).sum(axis=1).mean())), len(common)


def _clash_count(atoms, thr=2.2):
    from scipy.spatial import cKDTree

    xyz = pdb_io.coords(atoms)
    rid = atoms["res_id"]
    tree = cKDTree(xyz)
    return sum(1 for i, j in tree.query_pairs(thr)
               if abs(int(rid[i]) - int(rid[j])) > 1)


@pytest.mark.skipif(
    not (__import__("pathlib").Path(_PULCHRA_BIN).exists()
         and __import__("pathlib").Path(_PULCHRA_EXAMPLE).exists()),
    reason="reference PULCHRA binary/example not available",
)
def test_allatom_golden_vs_pulchra(tmp_path):
    """Behavioral parity vs the reference tool on its own example:
    backbone N/C/O RMSD < 0.5 A, all L residues, clashes <= PULCHRA's."""
    import shutil
    import subprocess

    binary = tmp_path / "pulchra"
    shutil.copy(_PULCHRA_BIN, binary)
    binary.chmod(0o755)
    model = tmp_path / "model.pdb"
    shutil.copy(_PULCHRA_EXAMPLE, model)
    # -c (skip CA optimization) is how the reference pipeline invokes it
    # (modeler.py:371)
    r = subprocess.run([str(binary), "-c", str(model)], capture_output=True)
    assert r.returncode == 0
    gold = pdb_io.parse_pdb(tmp_path / "model.rebuilt.pdb")

    out = allatom.rebuild_ca_model(str(model), str(tmp_path / "ours.pdb"))
    ours = pdb_io.parse_pdb(out)

    bb_rmsd, n_bb = _rmsd_by_atom(ours, gold, ("N", "C", "O"))
    assert n_bb > 600
    assert bb_rmsd < 0.5, f"backbone RMSD vs PULCHRA {bb_rmsd:.3f}"
    cb_rmsd, _ = _rmsd_by_atom(ours, gold, ("CB",))
    assert cb_rmsd < 0.8, f"CB RMSD vs PULCHRA {cb_rmsd:.3f}"
    assert _clash_count(ours) <= _clash_count(gold)

    # zero D-residues: improper dihedral sign consistent and L-handed
    coords = pdb_io.coords(ours)
    by = {}
    for a, c in zip(ours, coords):
        by[(int(a["res_id"]), str(a["name"]))] = c

    def improper(p0, p1, p2, p3):
        b0, b1, b2 = p1 - p0, p2 - p1, p3 - p2
        b1 /= np.linalg.norm(b1)
        v = b0 - np.dot(b0, b1) * b1
        w = b2 - np.dot(b2, b1) * b1
        return np.degrees(np.arctan2(np.dot(np.cross(b1, v), w), np.dot(v, w)))

    vals = [improper(by[(i, "N")], by[(i, "CA")], by[(i, "C")], by[(i, "CB")])
            for i in np.unique(ours["res_id"]) if (i, "CB") in by]
    vals = np.asarray(vals)
    assert (np.sign(vals) == np.sign(vals[0])).all(), "mixed chirality"
