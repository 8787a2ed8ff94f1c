"""Minimal test-only stand-in for the BioPython surface the reference
modeler touches (modeler.py:19-21, 430-448, 1240-1241):

* ``PDBParser(PERMISSIVE=1).get_structure(name, path)`` returning a
  structure that iterates models -> chains (with ``.id``) -> residues
  (with ``.id[1]``, ``'CA' in residue``, ``residue['CA'].get_coord()``,
  ``residue.get_resname()``);
* bare ``Structure``/``Model`` containers with ``.add``.

Backed by a ~40-line ATOM-record reader; re-implemented API, not vendored
source.  Only fixture PDBs produced by this repo's writers are parsed.
"""

import sys
import types

import numpy as np


class _Atom:
    def __init__(self, coord):
        self._coord = np.asarray(coord, np.float32)

    def get_coord(self):
        return self._coord


class _Residue:
    def __init__(self, resseq, resname):
        self.id = (" ", resseq, " ")
        self._resname = resname
        self._atoms = {}

    def get_resname(self):
        return self._resname

    def __contains__(self, name):
        return name in self._atoms

    def __getitem__(self, name):
        return self._atoms[name]


class _Chain:
    def __init__(self, cid):
        self.id = cid
        self._residues = {}

    def __iter__(self):
        return iter(self._residues.values())


class Model:
    def __init__(self, mid=0):
        self.id = mid
        self._chains = {}

    def __iter__(self):
        return iter(self._chains.values())

    def __getitem__(self, cid):
        return self._chains[cid]


class Structure:
    def __init__(self, sid):
        self.id = sid
        self._models = []

    def add(self, model):
        self._models.append(model)

    def __iter__(self):
        return iter(self._models)

    def __getitem__(self, ix):
        return self._models[ix]


class PDBParser:
    def __init__(self, PERMISSIVE=1, QUIET=False):
        pass

    def get_structure(self, name, path):
        s = Structure(name)
        m = Model(0)
        s.add(m)
        with open(path) as fh:
            for line in fh:
                if not line.startswith(("ATOM", "HETATM")):
                    continue
                atom_name = line[12:16].strip()
                resname = line[17:20].strip()
                cid = line[21]
                resseq = int(line[22:26])
                xyz = (float(line[30:38]), float(line[38:46]), float(line[46:54]))
                chain = m._chains.setdefault(cid, _Chain(cid))
                res = chain._residues.setdefault(resseq, _Residue(resseq, resname))
                res._atoms[atom_name] = _Atom(xyz)
        return s


def install():
    """Register this shim as the ``Bio`` package tree in sys.modules."""
    this = sys.modules[__name__]
    bio = types.ModuleType("Bio")
    pdb = types.ModuleType("Bio.PDB")
    pdb.PDBParser = PDBParser

    # PEP-562 fallback: reference modules touch attributes this shim does not
    # model (e.g. preprocessing.py:53 ``PDB.PDBIO()``) on paths the tests never
    # exercise — hand back an inert callable instead of AttributeError
    def _inert(name):
        if name.startswith("__"):
            raise AttributeError(name)
        return lambda *a, **k: None

    pdb.__getattr__ = _inert
    parser_mod = types.ModuleType("Bio.PDB.PDBParser")
    parser_mod.PDBParser = PDBParser
    structure_mod = types.ModuleType("Bio.PDB.Structure")
    structure_mod.Structure = Structure
    model_mod = types.ModuleType("Bio.PDB.Model")
    model_mod.Model = Model
    bio.PDB = pdb
    # assignment, not setdefault: another test module's weaker Bio stub
    # (attribute-only, not a package) must not shadow this one
    for name, mod in {
        "Bio": bio,
        "Bio.PDB": pdb,
        "Bio.PDB.PDBParser": parser_mod,
        "Bio.PDB.Structure": structure_mod,
        "Bio.PDB.Model": model_mod,
    }.items():
        sys.modules[name] = mod
    return this
