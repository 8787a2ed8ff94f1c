"""Cubic B-spline volume resampling on device, scipy-parity.

Re-implements the semantics of ``scipy.ndimage.zoom(data, factors, order=3)``
used by the reference for map resampling (preprocessing.py:112-118) as a
jittable JAX op:

  * cubic B-spline prefilter (Unser's recursive filter, pole sqrt(3)-2) with
    mirror boundary and exact initialization — scipy's ``mode='constant'``
    prefilter uses exactly these boundary conditions;
  * endpoint-aligned coordinate mapping ``coord[i] = i * (in-1)/(out-1)``
    evaluated in float64 *at trace time* (shapes are static), reproducing
    scipy's exact floating-point boundary behavior (coordinates that land an
    ulp past ``in-1`` yield cval=0, as scipy's C kernel does);
  * mirror extension of spline coefficients for in-range coordinates.

The recursive prefilter is expressed as a first-order linear recurrence and
evaluated with ``jax.lax.associative_scan`` so it parallelizes on the VPU
instead of serializing over the axis.

Validated to ~1e-6 (float32) against scipy in tests/test_resample.py.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_POLE = np.sqrt(3.0) - 2.0  # cubic B-spline filter pole
_GAIN = 6.0


def _linear_recurrence(x: jnp.ndarray, z: float, c0: jnp.ndarray) -> jnp.ndarray:
    """Evaluate c[0]=c0, c[k] = x[k] + z*c[k-1] along axis 0 via assoc. scan."""
    n = x.shape[0]
    a = jnp.concatenate(
        [jnp.zeros((1,) + x.shape[1:], x.dtype), jnp.full((n - 1,) + x.shape[1:], z, x.dtype)]
    )
    b = jnp.concatenate([c0[None], x[1:]])

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar * bl + br

    _, c = jax.lax.associative_scan(combine, (a, b))
    return c


def spline_prefilter(x: jnp.ndarray) -> jnp.ndarray:
    """Cubic B-spline coefficients along axis 0 (mirror boundary, exact init)."""
    n = x.shape[0]
    if n == 1:
        return x
    z = x.dtype.type(_POLE)
    c = x * x.dtype.type(_GAIN)

    # Exact causal init under mirror extension (period 2n-2).
    k = np.arange(2 * n - 2, dtype=np.float64)
    zk = (_POLE ** k) / (1.0 - _POLE ** (2 * n - 2))
    zk = jnp.asarray(zk, x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
    ext = jnp.concatenate([c, c[-2:0:-1]], axis=0)
    c_plus0 = jnp.sum(zk * ext, axis=0)

    c_plus = _linear_recurrence(c, z, c_plus0)

    # Anticausal pass, reversed.
    c_minus_last = (z / (z * z - 1.0)) * (c_plus[-1] + z * c_plus[-2])
    rev = -z * c_plus[::-1]
    c_minus = _linear_recurrence(rev, z, c_minus_last)
    return c_minus[::-1]


def _mirror_index(idx: np.ndarray, n: int) -> np.ndarray:
    if n == 1:
        return np.zeros_like(idx)
    period = 2 * n - 2
    idx = np.abs(idx) % period
    return np.where(idx >= n, period - idx, idx)


def _cubic_tap_tables(in_n: int, out_n: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static (taps, weights, outside-mask) tables for one axis.

    Computed in float64 numpy to match scipy's coordinate arithmetic exactly.
    """
    if out_n == 1:
        coords = np.zeros(1, dtype=np.float64)
    else:
        zoom = np.float64(in_n - 1) / np.float64(out_n - 1)
        coords = np.arange(out_n, dtype=np.float64) * zoom
    outside = (coords < 0) | (coords > in_n - 1)
    coords_in = np.clip(coords, 0, in_n - 1)
    f = np.floor(coords_in).astype(np.int64)
    t = coords_in - f
    w = np.stack(
        [
            (1 - t) ** 3 / 6.0,
            (4 - 6 * t * t + 3 * t ** 3) / 6.0,
            (1 + 3 * t + 3 * t * t - 3 * t ** 3) / 6.0,
            t ** 3 / 6.0,
        ],
        axis=0,
    )  # (4, out_n)
    taps = np.stack([_mirror_index(f + o - 1, in_n) for o in range(4)], axis=0)
    return taps, w, outside


def _interp_axis0(c: jnp.ndarray, in_n: int, out_n: int) -> jnp.ndarray:
    taps, w, outside = _cubic_tap_tables(in_n, out_n)
    acc = jnp.zeros((out_n,) + c.shape[1:], c.dtype)
    wshape = (-1,) + (1,) * (c.ndim - 1)
    for o in range(4):
        acc = acc + jnp.asarray(w[o], c.dtype).reshape(wshape) * c[taps[o]]
    if outside.any():
        acc = jnp.where(
            jnp.asarray(outside).reshape(wshape), jnp.zeros((), c.dtype), acc
        )
    return acc


def _resize_axis(x: jnp.ndarray, axis: int, out_n: int, prefilter: bool = True) -> jnp.ndarray:
    x = jnp.moveaxis(x, axis, 0)
    in_n = x.shape[0]
    if out_n != in_n or prefilter:
        c = spline_prefilter(x) if (prefilter and in_n > 1) else x
        x = _interp_axis0(c, in_n, out_n)
    return jnp.moveaxis(x, 0, axis)


def zoom_output_shape(shape: Sequence[int], factors: Sequence[float]) -> Tuple[int, ...]:
    """scipy's output-shape rule: round(in * factor) per axis."""
    return tuple(int(round(s * f)) for s, f in zip(shape, factors))


@partial(jax.jit, static_argnames=("output_shape",))
def zoom_cubic(volume: jnp.ndarray, output_shape: Tuple[int, ...]) -> jnp.ndarray:
    """Cubic-spline resample ``volume`` to ``output_shape`` (scipy zoom parity).

    Axes where the size is unchanged are passed through untouched (matching
    a zoom factor of exactly 1 only if the caller wants full scipy parity for
    non-integer factors that round to the same size, use factors via
    :func:`zoom_output_shape` and note scipy would still resample; we resample
    whenever sizes differ, and skip identical sizes for speed — scipy's
    round-trip at factor 1.0 is the identity as well).
    """
    out = volume
    for axis, out_n in enumerate(output_shape):
        if out.shape[axis] != out_n:
            out = _resize_axis(out, axis, out_n)
    return out


def resample_to_voxel_size(
    volume: jnp.ndarray,
    voxel_size: Sequence[float],
    target_voxel_size: float = 1.0,
) -> jnp.ndarray:
    """Resample a (d0,d1,d2) volume so each axis has ``target_voxel_size`` Å.

    ``voxel_size`` gives the Å spacing of each *data axis* of ``volume``
    (axis-matched, unlike the reference quirk in
    scripts_for_training_data/create_normalized_map.py:40-43 which pairs
    x/y/z spacings with data dims regardless of axis order).
    """
    factors = [float(v) / float(target_voxel_size) for v in voxel_size]
    out_shape = zoom_output_shape(volume.shape, factors)
    if tuple(out_shape) == tuple(volume.shape):
        # identity fast path: the map is already at the target spacing
        # on every axis.  zoom_cubic would pass each unchanged axis
        # through anyway (its per-axis skip), so this only avoids the
        # call; scipy's zoom at factor 1.0 evaluates the spline at its
        # knots — the identity up to ~1e-7 float noise — so returning
        # the input is the exact answer.
        return volume
    return zoom_cubic(volume, out_shape)
