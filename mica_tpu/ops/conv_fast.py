"""MXU-friendly reformulations of the network's pathological convolutions.

Two conv shapes in the MICA network lower badly through XLA's generic conv
path on TPU (measured at 1-5% MXU utilization):

  * the multi-scale input stem: four convs with Cin=1 and kernels
    3/5/7/9 over a 64-cube (reference model.py:9-14) — a single-channel
    contraction starves the MXU;
  * the depthwise 3x3x3 "local attention" conv (feature_group_count = C,
    model.py:80) — grouped conv with one channel per group.

Reformulations (numerically identical up to float reassociation):

  * stem: per-dz matmuls over (dy, dx) patch planes with all four kernels
    embedded zero-padded into the 9-cube — trading ~2.4x more FLOPs for
    dense MXU contractions (183 -> 104 ms at batch 8 on v5e);
  * depthwise: 27 shifted elementwise multiply-accumulates on the VPU
    (kept available, but XLA's grouped conv measured faster on v5e, so
    the model uses that path).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _axis_patches(x: jnp.ndarray, axis: int, k: int) -> jnp.ndarray:
    """Stack k shifted views along a new trailing axis (zero padded)."""
    pad = [(0, 0)] * x.ndim
    half = k // 2
    pad[axis] = (half, half)
    xp = jnp.pad(x, pad)
    n = x.shape[axis]
    views = []
    for i in range(k):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(i, i + n)
        views.append(xp[tuple(idx)])
    return jnp.stack(views, axis=-1)


def extract_patches3d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, D, H, W) -> (B, D, H, W, k^3); taps ordered (dz, dy, dx)."""
    t = _axis_patches(x, 1, k)
    t = _axis_patches(t, 2, k)
    t = _axis_patches(t, 3, k)
    return t.reshape(*x.shape, k * k * k)


def embed_kernel(kernel: jnp.ndarray, k_out: int) -> jnp.ndarray:
    """Zero-pad a (k,k,k,1,C) kernel into the center of a k_out-cube."""
    k = kernel.shape[0]
    off = (k_out - k) // 2
    pad = [(off, k_out - k - off)] * 3 + [(0, 0), (0, 0)]
    return jnp.pad(kernel, pad)


def multiscale_stem_conv(
    x: jnp.ndarray,
    kernels: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    compute_dtype=None,
    allow_pallas: bool = True,
) -> jnp.ndarray:
    """Fused multi-scale Cin=1 convs: x (B,D,H,W,1) -> (B,D,H,W, sum(Cout)).

    Equivalent to concatenating SAME-padded convs of each kernel, computed
    as k matmuls over (dy, dx) patch planes — one per dz tap.  The patch
    tensor is kept at (..., k*k) so its trailing dim maps onto the 128-lane
    axis without the catastrophic (k,k,k) tiling blowup a naive 7-D layout
    incurs (3.6x padding at k=9 -> HBM OOM).

    On TPU the whole thing runs as a fused Pallas kernel
    (ops/stem_pallas.py) — patch build + contraction stay in VMEM —
    unless ``allow_pallas`` is False (training path: the Pallas kernel has
    no VJP, the XLA formulation differentiates fine).
    """
    k_max = max(k.shape[0] for k in kernels)
    dt = compute_dtype or x.dtype
    combined = jnp.concatenate(
        [
            embed_kernel(k.astype(dt), k_max).reshape(k_max, k_max * k_max, -1)
            for k in kernels
        ],
        axis=-1,
    )  # (k_max, k_max^2, total_out)
    bias = jnp.concatenate([b for b in biases], axis=-1)

    xin = x[..., 0].astype(dt)

    import os

    if (allow_pallas and k_max == 9 and jax.default_backend() == "tpu"
            and os.environ.get("MICA_PALLAS_STEM") == "1"):
        # Opt-in only: measured SLOWER than the XLA formulation on v5e
        # (141 ms vs 68 ms at batch 8 / 64-cube) — the 729 per-program
        # patch-column relayouts dominate.  Kept as a correct, tested
        # Pallas kernel and a baseline for future Mosaic improvements.
        from .stem_pallas import stem_conv_pallas

        return stem_conv_pallas(xin, combined, bias.astype(dt))
    b_, d, h, w = xin.shape
    half = k_max // 2
    xp = jnp.pad(xin, ((0, 0), (half, half), (0, 0), (0, 0)))

    out = None
    for dz in range(k_max):
        slab = xp[:, dz : dz + d]
        planes = _axis_patches(slab, 2, k_max)  # (B,D,H,W,k)
        planes = _axis_patches(planes, 3, k_max)  # (B,D,H,W,k,k)
        planes = planes.reshape(b_, d, h, w, k_max * k_max)
        term = jnp.einsum(
            "bdhwk,kc->bdhwc", planes, combined[dz],
            preferred_element_type=jnp.float32,
            precision="highest" if dt == jnp.float32 else None,
        )
        out = term if out is None else out + term
    return (out + bias.astype(jnp.float32)).astype(dt)


def depthwise_conv3(x: jnp.ndarray, kernel: jnp.ndarray,
                    bias: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3x3 SAME conv via shifted FMAs.

    ``x`` (B,D,H,W,C), ``kernel`` (3,3,3,1,C) — flax grouped-conv layout.
    """
    b, d, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros_like(x) + bias.astype(x.dtype)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                acc = acc + xp[:, dz : dz + d, dy : dy + h, dx : dx + w, :] * (
                    kernel[dz, dy, dx, 0].astype(x.dtype)
                )
    return acc
