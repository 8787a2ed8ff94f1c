"""Minimal ``mrcfile`` stand-in backed by mica_tpu.io.mrc.

The reference pipeline (used as a parity oracle in tests) imports
``mrcfile``, which is not installed in this environment; this shim provides
exactly the API surface the reference touches (preprocessing.py:98-148,
create_grids.py:108-117): ``open``/``new`` context managers, ``.data``,
``.voxel_size`` with x/y/z attributes, and the header words origin /
mapc / mapr / maps / n{x,y,z}start.

Install with: ``sys.modules["mrcfile"] = mrcfile_shim``.
"""

from __future__ import annotations

import sys
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, "/root/repo")
from mica_tpu.io import mrc as mrc_io  # noqa: E402


class _Rec:
    """numpy-recarray-style record with .x/.y/.z attributes."""

    def __init__(self, x, y, z):
        self.x, self.y, self.z = float(x), float(y), float(z)

    def __iter__(self):
        return iter((self.x, self.y, self.z))


class _OpenMrc:
    def __init__(self, path):
        vol = mrc_io.read_mrc(path)
        h = vol.header
        self.data = vol.data
        vs = h.voxel_size
        self.voxel_size = _Rec(*vs)
        self.header = SimpleNamespace(
            origin=_Rec(*h.origin),
            mapc=h.mapc, mapr=h.mapr, maps=h.maps,
            nxstart=h.nxstart, nystart=h.nystart, nzstart=h.nzstart,
        )

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _NewMrc:
    def __init__(self, path):
        self._path = path
        self._data = None
        self.voxel_size = 1.0
        self.header = SimpleNamespace(
            origin=(0.0, 0.0, 0.0), mapc=1, mapr=2, maps=3,
            nxstart=0, nystart=0, nzstart=0,
        )

    def set_data(self, arr):
        self._data = np.asarray(arr)

    def update_header_stats(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None and self._data is not None:
            vs = self.voxel_size
            if np.isscalar(vs):
                vs = (float(vs),) * 3
            else:
                vs = tuple(float(v) for v in vs)
            origin = tuple(float(v) for v in self.header.origin)
            mrc_io.write_mrc(
                self._path, self._data, voxel_size=vs, origin=origin,
                nstart=(int(self.header.nxstart), int(self.header.nystart),
                        int(self.header.nzstart)),
                axis_order=(int(self.header.mapc), int(self.header.mapr),
                            int(self.header.maps)),
            )
        return False


def open(path, mode="r", permissive=False):  # noqa: A001
    return _OpenMrc(path)


def new(path, overwrite=False):
    return _NewMrc(path)
