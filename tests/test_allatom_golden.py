"""Golden validation of the native all-atom tool against the shipped
PULCHRA binary (reference modules/pulchra304/bin/linux/pulchra) on the
reference's own example (modules/pulchra304/examples/model.pdb) — the
implicit golden-file test the reference relies on (SURVEY.md §4).

Measured baseline (recorded 2026-08-16, v3.04 binary):
  backbone RMSD vs PULCHRA: N 0.18 A, C 0.23 A, O 0.55 A, CB 0.39 A
  atom composition: identical (1656/1656 common (residue, atom) keys)
  steric clashes (<2 A, non-adjacent residues): ours 0, PULCHRA 35
  chirality: both tools produce 190/190 L-residues
"""

import shutil
import stat
import subprocess
from pathlib import Path

import numpy as np
import pytest

from mica_tpu.tools import allatom

REF_BIN = Path("/root/reference/modules/pulchra304/bin/linux/pulchra")
REF_EXAMPLE = Path("/root/reference/modules/pulchra304/examples/model.pdb")

pytestmark = pytest.mark.skipif(
    not (REF_BIN.exists() and REF_EXAMPLE.exists()),
    reason="reference PULCHRA binary/example not available",
)


def _coords(a):
    return np.stack([a["x"], a["y"], a["z"]], axis=1)


@pytest.fixture(scope="module")
def outputs(tmp_path_factory):
    from mica_tpu.io import pdb as pdb_io

    tmp = tmp_path_factory.mktemp("pulchra_golden")
    shutil.copy(REF_EXAMPLE, tmp / "model.pdb")
    # the reference mount is read-only; the binary must be copied to chmod
    pbin = tmp / "pulchra"
    shutil.copy(REF_BIN, pbin)
    pbin.chmod(pbin.stat().st_mode | stat.S_IXUSR)
    subprocess.run([str(pbin), "model.pdb", "-c"], cwd=tmp, check=True,
                   timeout=300, stdout=subprocess.PIPE)
    out = allatom.rebuild_ca_model(str(tmp / "model.pdb"), str(tmp / "ours.pdb"))
    assert out is not None
    return (pdb_io.parse_pdb(tmp / "ours.pdb"),
            pdb_io.parse_pdb(tmp / "model.rebuilt.pdb"))


def test_backbone_rmsd_vs_pulchra(outputs):
    ours, theirs = outputs
    limits = {"N": 0.35, "CA": 0.01, "C": 0.40, "O": 0.80, "CB": 0.60}
    for nm, lim in limits.items():
        m1, m2 = ours["name"] == nm, theirs["name"] == nm
        c1, r1 = _coords(ours)[m1], ours["res_id"][m1]
        c2, r2 = _coords(theirs)[m2], theirs["res_id"][m2]
        assert len(c1) == len(c2), nm
        assert (r1 == r2).all(), nm
        rmsd = float(np.sqrt(np.mean(np.sum((c1 - c2) ** 2, -1))))
        assert rmsd < lim, (nm, rmsd)


def test_atom_composition_matches(outputs):
    ours, theirs = outputs
    k1 = {(int(r), str(n)) for r, n in zip(ours["res_id"], ours["name"])}
    k2 = {(int(r), str(n)) for r, n in zip(theirs["res_id"], theirs["name"])}
    assert k1 == k2


def test_no_clashes_and_not_worse_than_pulchra(outputs):
    from scipy.spatial import cKDTree

    def clashes(a):
        c = _coords(a)
        t = cKDTree(c)
        return sum(
            1 for i, j in t.query_pairs(2.0)
            if abs(int(a["res_id"][i]) - int(a["res_id"][j])) > 1
        )

    ours, theirs = outputs
    assert clashes(ours) <= clashes(theirs)


def test_chirality_all_l(outputs):
    ours, theirs = outputs

    def signs(a):
        out = []
        for rs in np.unique(a["res_id"]):
            m = a["res_id"] == rs
            d = {n: c for n, c in zip(a["name"][m], _coords(a)[m])}
            if not all(k in d for k in ("N", "CA", "C", "CB")):
                continue
            out.append(np.dot(np.cross(d["N"] - d["CA"], d["C"] - d["CA"]),
                              d["CB"] - d["CA"]))
        return np.asarray(out)

    s_ours, s_theirs = signs(ours), signs(theirs)
    assert len(s_ours) == len(s_theirs)
    # same handedness convention as PULCHRA, no D-residues
    assert (np.sign(s_ours) == np.sign(s_theirs)).all()
    assert (s_ours > 0).all() == (s_theirs > 0).all()
