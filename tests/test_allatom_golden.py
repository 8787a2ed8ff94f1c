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


# ---------------------------------------------------------------------------
# Tool-surface golden tests for the modes MICA's pipeline does NOT use but
# the reference tool ships: CA-position optimization (PULCHRA's default,
# skipped via -c — pulchra.c:801) and H-bond-aware backbone refinement
# (pulchra -q — pulchra.c:2996).  Oracle: the shipped binary run WITHOUT -c.
#
# Measured baseline (2026-08-17): our --ca-optimize lands within 0.004 A
# RMSD (max 0.043 A) of PULCHRA's own optimized CA positions; bond-length
# stats match (mean 3.800, sd 0.001 both tools).


@pytest.fixture(scope="module")
def opt_outputs(tmp_path_factory):
    from mica_tpu.tools import allatom

    tmp = tmp_path_factory.mktemp("pulchra_caopt")
    shutil.copy(REF_EXAMPLE, tmp / "model.pdb")
    pbin = tmp / "pulchra"
    shutil.copy(REF_BIN, pbin)
    pbin.chmod(pbin.stat().st_mode | stat.S_IXUSR)
    # no -c: the binary runs its CA optimization before rebuilding
    subprocess.run([str(pbin), "model.pdb"], cwd=tmp, check=True,
                   timeout=300, stdout=subprocess.PIPE)
    out = allatom.rebuild_ca_model(
        str(tmp / "model.pdb"), str(tmp / "ours_opt.pdb"),
        ca_optimize=True, hbond_optimize=True,
    )
    assert out is not None
    return tmp


def _ca_by_res(path):
    from mica_tpu.io import pdb as pdb_io

    a = pdb_io.parse_pdb(path)
    m = a["name"] == "CA"
    return {int(r): c for r, c in zip(a["res_id"][m], _coords(a)[m])}


def test_ca_optimize_matches_pulchra(opt_outputs):
    tmp = opt_outputs
    pul = _ca_by_res(tmp / "model.rebuilt.pdb")
    ours = _ca_by_res(tmp / "ours_opt.pdb")
    common = sorted(set(pul) & set(ours))
    assert len(common) >= 200
    p = np.stack([pul[r] for r in common])
    o = np.stack([ours[r] for r in common])
    rmsd = float(np.sqrt(np.mean(np.sum((p - o) ** 2, -1))))
    assert rmsd < 0.05, rmsd  # both minimize the same energy from the same start
    # bond lengths pulled to the 3.8 A ideal like the reference tool
    b = np.sqrt(np.sum((o[1:] - o[:-1]) ** 2, -1))
    assert abs(float(b.mean()) - 3.8) < 0.01
    assert float(np.abs(b - 3.8).max()) < 0.05


def test_hbond_optimize_improves_dssp_energy(opt_outputs):
    from mica_tpu.io import pdb as pdb_io

    def dssp_total(path):
        a = pdb_io.parse_pdb(path)
        byres = {}
        for r, n, c in zip(a["res_id"], a["name"], _coords(a)):
            byres.setdefault(int(r), {})[str(n)] = c
        rs = sorted(byres)
        total = 0.0
        for i, r in enumerate(rs):
            if i == 0 or rs[i - 1] != r - 1:
                continue
            d, prev = byres[r], byres[r - 1]
            if not all(k in d for k in ("N",)) or not all(
                k in prev for k in ("C", "O")
            ):
                continue
            v = prev["C"] - prev["O"]
            h = d["N"] + 1.08 * v / np.linalg.norm(v)
            best = 1e3
            for r2 in rs:
                if abs(r2 - r) <= 2:
                    continue
                a2 = byres[r2]
                if "O" not in a2 or "C" not in a2:
                    continue
                dno = np.linalg.norm(d["N"] - a2["O"])
                if dno > 5.0:
                    continue
                e = -27.888 * (
                    1 / dno
                    + 1 / np.linalg.norm(h - a2["C"])
                    - 1 / np.linalg.norm(h - a2["O"])
                    - 1 / np.linalg.norm(d["N"] - a2["C"])
                )
                best = min(best, e)
            if best < -0.5:
                total += best
        return total

    tmp = opt_outputs
    from mica_tpu.tools import allatom

    # same CA optimization, H-bond refinement off -> the "before" model
    out = allatom.rebuild_ca_model(
        str(tmp / "model.pdb"), str(tmp / "ours_nohb.pdb"), ca_optimize=True
    )
    assert out is not None
    before = dssp_total(tmp / "ours_nohb.pdb")
    after = dssp_total(tmp / "ours_opt.pdb")
    assert after < before  # strictly more/stronger backbone H-bonds


def test_multichain_gapped_trace(tmp_path):
    """Multi-chain + gapped CA traces: native tool vs the shipped binary
    driven through the reference's split/merge protocol (modeler.py:329-417).
    """
    from mica_tpu.io import pdb as pdb_io
    from mica_tpu.tools import allatom

    src = pdb_io.parse_pdb(REF_EXAMPLE)
    m = src["name"] == "CA"
    res_ids = src["res_id"][m]
    coords = _coords(src)[m]
    names = src["res_name"][m]
    # two chains with a residue gap inside each chain
    lines = []
    n = len(res_ids)
    for i in range(n):
        chain = "A" if i < n // 2 else "B"
        rid = int(res_ids[i])
        if (n // 4 < i < n // 4 + 3) or (3 * n // 4 < i < 3 * n // 4 + 3):
            continue  # carve two gaps
        x, y, z = coords[i]
        lines.append(
            f"ATOM  {i+1:5d}  CA  {names[i]:3s} {chain}{rid:4d}    "
            f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C"
        )
    ca_path = tmp_path / "multi.pdb"
    ca_path.write_text("\n".join(lines) + "\nEND\n")

    out = allatom.rebuild_ca_model(str(ca_path), str(tmp_path / "ours.pdb"))
    assert out is not None
    ours = pdb_io.parse_pdb(out)

    # the shipped binary through the compatibility split/merge driver
    pbin = tmp_path / "pulchra"
    shutil.copy(REF_BIN, pbin)
    pbin.chmod(pbin.stat().st_mode | stat.S_IXUSR)
    out2 = allatom.rebuild_ca_model(
        str(ca_path), str(tmp_path / "pul.pdb"), pulchra_path=str(pbin)
    )
    assert out2 is not None
    pul = pdb_io.parse_pdb(out2)

    # same (chain, residue, atom) composition
    k1 = {(str(c), int(r), str(nm))
          for c, r, nm in zip(ours["chain"], ours["res_id"], ours["name"])}
    k2 = {(str(c), int(r), str(nm))
          for c, r, nm in zip(pul["chain"], pul["res_id"], pul["name"])}
    assert k1 == k2
    # CAs pass through unchanged, chains preserved
    mca = ours["name"] == "CA"
    assert len(set(ours["chain"][mca])) == 2
    # no peptide bond built across the gaps: the C(i)->N(i+1) distance at a
    # gap must be far from the 1.33 A bond length
    byres = {}
    for c, r, nm, xyz in zip(ours["chain"], ours["res_id"], ours["name"],
                             _coords(ours)):
        byres.setdefault((str(c), int(r)), {})[str(nm)] = xyz
    keys = sorted(byres)
    for (c1, r1), (c2, r2) in zip(keys, keys[1:]):
        if c1 != c2 or r2 != r1 + 1:
            if "C" in byres[(c1, r1)] and "N" in byres[(c2, r2)]:
                d = float(np.linalg.norm(byres[(c1, r1)]["C"]
                                         - byres[(c2, r2)]["N"]))
                assert d > 2.0, ((c1, r1), (c2, r2), d)


_GAMMA = {"SER": "OG", "CYS": "SG", "THR": "OG1", "VAL": "CG1",
          "ILE": "CG1", "LEU": "CG", "MET": "CG", "PRO": "CG",
          "PHE": "CG", "TYR": "CG", "TRP": "CG", "ASP": "CG",
          "ASN": "CG", "GLU": "CG", "GLN": "CG", "LYS": "CG",
          "ARG": "CG", "HIS": "CG"}


def _chi1_by_residue(atoms):
    from collections import defaultdict

    by = defaultdict(dict)
    names = {}
    for r, n, rn, x, y, z in zip(atoms["res_id"], atoms["name"],
                                 atoms["res_name"], atoms["x"],
                                 atoms["y"], atoms["z"]):
        by[int(r)][str(n)] = np.array([x, y, z])
        names[int(r)] = str(rn)
    out = {}
    for r, pos in by.items():
        g = _GAMMA.get(names[r])
        if not g or g not in pos or "CB" not in pos:
            continue
        p0, p1, p2, p3 = pos["N"], pos["CA"], pos["CB"], pos[g]
        b1, b2, b3 = p1 - p0, p2 - p1, p3 - p2
        n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
        m = np.cross(n1, b2 / np.linalg.norm(b2))
        out[r] = float(np.degrees(np.arctan2(m @ n2, n1 @ n2)))
    return out


def test_allatom_and_chi1_vs_pulchra(outputs):
    """Side-chain fidelity metrics vs the shipped binary (VERDICT r2 #6,
    r4 #5).

    PULCHRA is itself a predictor (no crystal ground truth exists for the
    CA-trace example), so these are AGREEMENT metrics between two rotamer
    selectors.  Measured 2026-08-21 (round-5 calibrated placement table —
    the binary's rotamer choice recovered as a function of its own
    CA-geometry bins, calibrate_sidechains.py): all-atom RMSD 1.44 A,
    side-chain-only 1.97 A, chi1 within 40 deg 82.9% (median 4.1 deg) —
    the bounds below are regression floors at the VERDICT r4 targets
    (chi1 >= 70%, sc RMSD <= 2.2 A)."""
    ours, theirs = outputs

    def keyed(a):
        return {(int(r), str(n)): (x, y, z)
                for r, n, x, y, z in zip(a["res_id"], a["name"],
                                         a["x"], a["y"], a["z"])}

    ko, kr = keyed(ours), keyed(theirs)
    common = sorted(set(ko) & set(kr))
    assert len(common) > 1500
    d = np.array([np.subtract(ko[k], kr[k]) for k in common])
    rmsd_all = float(np.sqrt((d ** 2).sum(1).mean()))
    sc_rows = [i for i, k in enumerate(common)
               if k[1] not in ("N", "CA", "C", "O", "CB")]
    rmsd_sc = float(np.sqrt((d[sc_rows] ** 2).sum(1).mean()))
    assert rmsd_all < 1.7, rmsd_all
    assert rmsd_sc < 2.2, rmsd_sc

    c_o = _chi1_by_residue(ours)
    c_r = _chi1_by_residue(theirs)
    comm = sorted(set(c_o) & set(c_r))
    assert len(comm) > 150
    diff = np.array([abs((c_o[r] - c_r[r] + 180) % 360 - 180)
                     for r in comm])
    within = float((diff < 40).mean())
    assert within >= 0.70, f"chi1 within-40deg agreement {within:.3f}"
    assert float(np.median(diff)) < 10.0, float(np.median(diff))


def test_rotamer_selection_avoids_clash(tmp_path):
    """Forced-contact case: two strands 4.6 A apart with LYS side chains
    forced inward.  Round-5: the rotamer choice itself is table-first
    (clash-blind, like the reference tool's own selection) and the
    downstream excluded-volume relaxation must resolve the collisions —
    the output still has to be clash-free at the 2.0 A hard count."""
    from mica_tpu.io import pdb as pdb_io
    from mica_tpu.tools import allatom

    lines = []
    serial = 1
    # two straight CA strands 4.6 A apart, side chains forced inward
    for strand, (y, chain_ofs) in enumerate(((0.0, 0), (4.6, 40))):
        for i in range(12):
            xyz = np.array([i * 3.8, y, 0.0])
            lines.append(pdb_io.format_atom_line(
                serial, "CA", "LYS", "A", chain_ofs + i + 1, xyz,
                element="C"))
            serial += 1
    src = tmp_path / "strands.pdb"
    src.write_text("\n".join(lines) + "\nEND\n")
    out = allatom.rebuild_ca_model(str(src), str(tmp_path / "out.pdb"))
    assert out is not None
    atoms = pdb_io.parse_pdb(tmp_path / "out.pdb")
    co = np.stack([atoms["x"], atoms["y"], atoms["z"]], 1)
    from scipy.spatial import cKDTree

    pairs = cKDTree(co).query_pairs(2.0, output_type="ndarray")
    rid = atoms["res_id"].astype(int)
    bad = int(np.sum(np.abs(rid[pairs[:, 0]] - rid[pairs[:, 1]]) > 1))
    assert bad == 0, f"{bad} hard clashes in the forced-contact case"
