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
    f32_out: bool = True,
) -> jnp.ndarray:
    """Fused multi-scale Cin=1 convs: x (B,D,H,W,1) -> (B,D,H,W, sum(Cout)).

    Equivalent to concatenating SAME-padded convs of each kernel, computed
    as k matmuls over (dy, dx) patch planes — one per dz tap.  The patch
    tensor is kept at (..., k*k) so its trailing dim maps onto the 128-lane
    axis without the catastrophic (k,k,k) tiling blowup a naive 7-D layout
    incurs (3.6x padding at k=9 -> HBM OOM).

    On TPU the production path is the space-to-depth formulation
    (``multiscale_stem_conv_s2d``): folding the single-channel input by 2
    per axis turns the four Cin=1 convs into one dense Cin=8 / Cout=1024
    conv — measured 17 ms vs 75 ms for the patch-matmul formulation at
    batch 8 on v5e.  Falls back to the patch-matmul path when a spatial
    dim is odd.  ``allow_pallas`` opts into the experimental Pallas stem
    kernel (measured slower on v5e; kept as a Mosaic baseline).
    """
    k_max = max(k.shape[0] for k in kernels)
    dt = compute_dtype or x.dtype

    if all(d % 2 == 0 for d in x.shape[1:4]):
        return multiscale_stem_conv_s2d(x, kernels, biases, s=2,
                                        compute_dtype=dt, f32_out=f32_out)

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


def _fold_s2d(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Space-to-depth: (B, D, H, W) -> (B, D/s, H/s, W/s, s^3).

    Intra-block channel index is qz*s^2 + qy*s + qx.
    """
    b, d, h, w = x.shape
    x = x.reshape(b, d // s, s, h // s, s, w // s, s)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6)
    return x.reshape(b, d // s, h // s, w // s, s * s * s)


def _unfold_s2d(y: jnp.ndarray, s: int) -> jnp.ndarray:
    """Inverse: (B, D/s, H/s, W/s, s^3 * C) -> (B, D, H, W, C).

    Output channel index layout is (pz, py, px, c).
    """
    b, dz, hy, wx, sc = y.shape
    c = sc // (s * s * s)
    y = y.reshape(b, dz, hy, wx, s, s, s, c)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(b, dz * s, hy * s, wx * s, c)


def _fold_kernel_s2d(kernel: jnp.ndarray, s: int) -> jnp.ndarray:
    """Polyphase fold of a (k,k,k,1,C) kernel for space-to-depth factor s.

    Returns a (T,T,T, s^3, s^3*C) kernel with T = ceil((k+s-1)/s) (odd by
    construction for odd k and s in {2,4} with k=9) such that a stride-1
    SAME conv on the folded input equals the original SAME conv:

        out[s*Z+p] = sum_t w[t+half] in[s*Z+p+t]
                   = sum_u sum_q W'[u+U, q, p] In[Z+u, q],
        W'[u, q, p] = w[s*u + q - p + half]  (0 when out of range).
    """
    k, _, _, cin, cout = kernel.shape
    assert cin == 1
    half = k // 2
    # symmetric tap window [-U, U] so SAME padding on the folded conv (U
    # blocks = s*U voxels) covers the original SAME padding exactly
    U = max(-(-half // s), (s - 1 + half) // s)
    taps = np.arange(-U, U + 1)
    T = len(taps)

    # idx[a, u, q, p] = s*u + q - p + half  along axis a (same for all axes)
    u = taps[:, None, None]
    q = np.arange(s)[None, :, None]
    p = np.arange(s)[None, None, :]
    idx = s * u + q - p + half  # (T, s, s)
    valid = (idx >= 0) & (idx < k)
    idx_c = np.clip(idx, 0, k - 1)

    kz = kernel[idx_c.reshape(-1)].reshape(T, s, s, k, k, 1, cout)
    kz = kz * jnp.asarray(valid.reshape(T, s, s, 1, 1, 1, 1), kernel.dtype)
    kzy = kz[:, :, :, idx_c.reshape(-1)].reshape(T, s, s, T, s, s, k, 1, cout)
    kzy = kzy * jnp.asarray(valid.reshape(1, 1, 1, T, s, s, 1, 1, 1), kernel.dtype)
    kzyx = kzy[:, :, :, :, :, :, idx_c.reshape(-1)].reshape(
        T, s, s, T, s, s, T, s, s, 1, cout
    )
    kzyx = kzyx * jnp.asarray(
        valid.reshape(1, 1, 1, 1, 1, 1, T, s, s, 1, 1), kernel.dtype
    )
    # -> (uz, uy, ux, qz, qy, qx, pz, py, px, cout)
    kf = kzyx.transpose(0, 3, 6, 1, 4, 7, 2, 5, 8, 9, 10)[..., 0, :]
    # contract (qz,qy,qx) -> Cin = s^3; out channels (pz,py,px,cout) -> s^3*C
    return kf.reshape(T, T, T, s ** 3, s ** 3 * cout)


def multiscale_stem_conv_s2d(
    x: jnp.ndarray,
    kernels: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    s: int = 2,
    compute_dtype=None,
    f32_out: bool = True,
) -> jnp.ndarray:
    """Space-to-depth formulation of the fused multi-scale stem.

    Folds the 64-cube single-channel input by ``s`` per axis so the four
    Cin=1 convs (k=3/5/7/9 zero-embedded into the 9-cube) become ONE dense
    conv with Cin = s^3 and Cout = 128*s^3 — full 128-lane MXU tiles
    instead of a single-channel contraction.  Numerically identical to the
    reference convs up to float reassociation.
    """
    dt = compute_dtype or x.dtype
    k_max = max(int(k.shape[0]) for k in kernels)
    combined = jnp.concatenate(
        [embed_kernel(k.astype(dt), k_max) for k in kernels], axis=-1
    )  # (9,9,9,1,Ctot)
    bias = jnp.concatenate(list(biases), axis=-1)

    xin = x[..., 0].astype(dt)
    b, d, h, w = xin.shape
    assert d % s == 0 and h % s == 0 and w % s == 0, (d, h, w, s)
    xf = _fold_s2d(xin, s)
    kf = _fold_kernel_s2d(combined, s)
    # ``f32_out``: emit f32 from the MXU (fuses into the downstream f32
    # attention math; measured faster at inference) — but its VJP calls a
    # transposed conv on mixed f32/bf16 args (TypeError under grad), so
    # the training path emits the compute dtype directly (the MXU
    # accumulates in f32 internally either way).
    out = jax.lax.conv_general_dilated(
        xf,
        kf,
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32 if f32_out else None,
        precision="highest" if dt == jnp.float32 else None,
    )
    out = _unfold_s2d(out, s)
    if f32_out:
        return (out + bias.astype(jnp.float32)).astype(dt)
    return out + bias.astype(out.dtype)


def depthwise_conv3_dense(x: jnp.ndarray, kernel: jnp.ndarray,
                          bias: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3x3 conv computed as a DENSE conv with a
    diagonal-expanded kernel (zeros off-diagonal).

    Burns C-times the FLOPs but runs on the MXU: at C<=128 the dense conv's
    measured time is far below XLA's grouped-conv lowering.  ``kernel`` is
    flax grouped layout (3,3,3,1,C).
    """
    c = x.shape[-1]
    eye = jnp.eye(c, dtype=kernel.dtype)
    dense_k = kernel[:, :, :, 0, :][..., None, :] * eye[None, None, None]
    # (3,3,3,C_in,C_out) with dense_k[..., i, j] = kernel[..., j] * (i == j)
    out = jax.lax.conv_general_dilated(
        x,
        dense_k.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + bias.astype(jnp.float32)).astype(x.dtype)


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


def packed_conv3(x: jnp.ndarray, kernel: jnp.ndarray, bias=None,
                 dtype=None, phases: int = 2) -> jnp.ndarray:
    """Lane-packed small-Cout k=3 conv (exact reformulation).

    A stride-1 conv with Cout < 128 wastes MXU output lanes: the conv
    emitter's rate is ~peak * min(Cout,128)/128 (PERFORMANCE.md).  This
    packs P adjacent x-positions ("phases") of the OUTPUT into the channel
    dim: a stride-P-in-x conv with kernel x-extent (3+P-1) whose weights
    hold P shifted copies of the original kernel (zeros elsewhere), so
    N = P*Cout fills the lanes at (3+P-1)/3 zero-padded FLOPs.  The
    (B,D,H,W/P,P*C) output unpacks to (B,D,H,W,C) with one reshape.

    Measured on v5e (batch 8, 64-cube, bf16): 1.4-1.5x for Cout=32 (P=4),
    1.1-1.4x for Cout=64 (P=2) — scripts/bench_packed_conv.py.
    """
    f32 = dtype is None or dtype == jnp.float32
    kd, kh, kw, ci, co = kernel.shape
    b, d, h, w, _ = x.shape
    P = phases
    assert w % P == 0, (w, P)
    k2 = jnp.concatenate(
        [
            jnp.pad(kernel, ((0, 0), (0, 0), (ph, P - 1 - ph), (0, 0), (0, 0)))
            for ph in range(P)
        ],
        axis=-1,
    ).astype(x.dtype)  # (kd, kh, kw+P-1, ci, P*co), phase-major channels
    y = jax.lax.conv_general_dilated(
        x, k2, (1, 1, P),
        [(kd // 2, kd // 2), (kh // 2, kh // 2),
         (kw // 2, kw - 1 - kw // 2)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision="highest" if f32 else None,
    )
    out = y.reshape(b, d, h, w, co)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def maybe_packed_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias=None,
                      dtype=None):
    """Dispatch to ``packed_conv3`` when it pays; None when ineligible.

    Eligible: TPU backend, 3x3x3 dense kernel, Cout < 128, x-extent
    divisible by the phase count (P = 4 for Cout <= 32, else 2).
    ``MICA_NO_PACKED=1`` disables the path (A/B measurement hook).
    """
    import os

    if jax.default_backend() != "tpu" or os.environ.get("MICA_NO_PACKED"):
        return None
    if kernel.ndim != 5 or kernel.shape[:3] != (3, 3, 3):
        return None
    co = kernel.shape[-1]
    if co >= 128:
        return None
    P = 4 if co <= 32 else 2
    if x.shape[3] % P:
        return None
    return packed_conv3(x, kernel, bias, dtype=dtype, phases=P)
