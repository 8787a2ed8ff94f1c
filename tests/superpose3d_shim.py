"""Minimal test-only stand-in for the ``superpose3d`` package as the
reference modeler uses it (modeler.py:163, 202, 262, 1460-1487):

    rmsd, R, T, c = Superpose3D(X_target, x_mobile)

with the fit applied as ``x @ R.T + T`` and ``rmsd`` indexable
(``rmsd[0]``).  Implemented as a plain Kabsch superposition (same math as
mica_tpu.ops.kabsch); re-implemented API, not vendored source.
"""

import numpy as np


def Superpose3D(target, mobile, weights=None, allow_rescale=False):
    X = np.asarray(target, float)
    x = np.asarray(mobile, float)
    cX = X.mean(axis=0)
    cx = x.mean(axis=0)
    Xc = X - cX
    xc = x - cx
    C = xc.T @ Xc
    U, S, Vt = np.linalg.svd(C)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = Vt.T @ D @ U.T
    T = cX - R @ cx
    fitted = xc @ R.T + cX
    rmsd = float(np.sqrt(np.mean(np.sum((X - fitted) ** 2, axis=1))))
    return np.array([rmsd]), R, T, 1.0
