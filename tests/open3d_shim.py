"""Minimal test-only stand-in for the ``open3d`` API surface the reference
modeler uses (modeler.py:767-770): a PointCloud holding an (N, 3) array and
``cluster_dbscan``.  Backed by sklearn's DBSCAN — identical semantics for
the dense voxel clouds the pipeline clusters (every retained point is a
core point at eps=10/min_points=10), and the downstream cluster scoring is
invariant to label numbering.  Re-implemented API, not vendored source.
"""

import sys
import types

import numpy as np


class PointCloud:
    def __init__(self):
        self.points = None

    def cluster_dbscan(self, eps, min_points, print_progress=False):
        pts = np.asarray(self.points, float)
        if len(pts) == 0:
            return []
        from sklearn.cluster import DBSCAN

        return DBSCAN(eps=eps, min_samples=min_points).fit(pts).labels_.tolist()


def Vector3dVector(arr):
    return np.asarray(arr, float)


geometry = types.ModuleType("open3d.geometry")
geometry.PointCloud = PointCloud
utility = types.ModuleType("open3d.utility")
utility.Vector3dVector = Vector3dVector


def install():
    """Register this shim as ``open3d`` in sys.modules (overwrites any
    weaker stub another test module may have left behind)."""
    mod = sys.modules[__name__]
    sys.modules["open3d"] = mod
    sys.modules["open3d.geometry"] = geometry
    sys.modules["open3d.utility"] = utility
