"""Density-map normalization, jit-compiled, scipy/numpy-parity.

Reproduces the reference normalization (preprocessing.py:121-133):
median-threshold, clip at the 99.9th percentile of positive values, scale to
[0, 1] — as a single fused device computation.  The percentile of the
dynamic positive subset is computed from one global sort plus a dynamic
gather, keeping everything static-shaped for XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def normalize_map(volume: jnp.ndarray) -> jnp.ndarray:
    """Normalize a density volume to [0, 1].

    Steps (numpy-parity with the reference):
      1. nan -> 0
      2. v = (v > median) * (v - median)
      3. p = 99.9th percentile (linear interpolation) of strictly positive v
      4. v = min(v, p) / p
    """
    v = jnp.nan_to_num(volume.astype(jnp.float32))
    flat = v.reshape(-1)
    n = flat.shape[0]

    sorted_all = jnp.sort(flat)
    # median with numpy semantics (average of middle two for even n)
    mid = n // 2
    if n % 2 == 1:
        median = sorted_all[mid]
    else:
        median = 0.5 * (sorted_all[mid - 1] + sorted_all[mid])

    thresh = jnp.where(flat > median, flat - median, 0.0)

    # 99.9th percentile of the positive subset. After the median shift the
    # positive values are exactly the top `count` entries of the sorted
    # shifted array; sorting the shifted values keeps one sort per call.
    sorted_thresh = jnp.sort(thresh)
    count = jnp.sum(thresh > 0)
    start = n - count  # first positive entry in sorted order

    # numpy computes the rank in float64; float32 here can be off by a couple
    # of rank positions for very large maps, which moves the clip value by
    # ~1e-6 relative — far inside the parity tolerance.
    q = 0.999 * (count.astype(jnp.float32) - 1.0)
    lo = jnp.floor(q).astype(jnp.int32)
    frac = q - lo.astype(jnp.float32)
    v_lo = sorted_thresh[jnp.clip(start + lo, 0, n - 1)]
    v_hi = sorted_thresh[jnp.clip(start + lo + 1, 0, n - 1)]
    percentile = jnp.where(count > 1, v_lo + frac * (v_hi - v_lo),
                           jnp.where(count == 1, sorted_thresh[n - 1], 0.0))

    safe_p = jnp.where(percentile > 0, percentile, 1.0)
    clipped = jnp.minimum(thresh, percentile)
    out = jnp.where(percentile > 0, clipped / safe_p, thresh)
    return out.reshape(v.shape)
