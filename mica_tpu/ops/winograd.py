"""z-axis Winograd convolution: fewer MACs for the dominant 3x3x3 convs.

The network's heavy encoder convs (Cin x Cout up to 512 x 256 at 64-cube
windows) run at 94% of v5e bf16 peak through XLA's conv emitter
(PERFORMANCE.md round-2 trace) — un-improvable by scheduling.  Winograd
F(m,3) applied along ONE axis (z) is the formulation that actually beats
them on silicon (scripts/bench_winograd2.py, 2026-08-20):

  * the per-transform-point work stays a dense 3x3 conv2d over (y, x) —
    XLA's best-tuned TPU path, batch (B * D/m), full MXU geometry;
  * transforms are tile reshapes + ONE neighbor-shifted view combined by
    small exact coefficients — no stride-m slices for XLA to relayout
    (the strided-slice variant measured 0.83x; this one 1.14x);
  * F(4,3): alpha = 6 transform points per 4 output z-planes = 2x fewer
    MACs, 1.5x transform-domain footprint.

Measured on v5e (batch 8, 64-cubes, bf16, dispatch-amortized): the
512->256 + 256->512 conv pair runs 141.4 ms vs 161.8 ms direct (1.144x).

Numerics: the F(4,3) transform matrices contain small integers and
1/6-family fractions; combined in bfloat16 the single-conv error is
~6x bf16-direct noise (mean |err|/|y| 8.5e-3 vs 1.4e-3), which the
instance-norm + softmax pipeline absorbs (model-level gate test in
tests/test_winograd.py).  The float32 parity path NEVER takes this
formulation — the gate requires bfloat16 compute.

Reference torch network uses plain Conv3d (models/model.py:103-152); this
is a TPU-side formulation change only — parameters and semantics are
identical up to float reassociation.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# F(2,3): points 0, 1, -1, inf — transforms exact in binary float
BT2 = np.array([[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]],
               np.float32)
G2 = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]],
              np.float32)
AT2 = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)

# F(4,3): points 0, 1, -1, 2, -2, inf (Lavin & Gray 2016 arrangement)
BT4 = np.array(
    [
        [4, 0, -5, 0, 1, 0],
        [0, -4, -4, 1, 1, 0],
        [0, 4, -4, -1, 1, 0],
        [0, -2, -1, 2, 1, 0],
        [0, 2, -1, -2, 1, 0],
        [0, 4, 0, -5, 0, 1],
    ],
    np.float32,
)
G4 = np.array(
    [
        [1 / 4, 0, 0],
        [-1 / 6, -1 / 6, -1 / 6],
        [-1 / 6, 1 / 6, -1 / 6],
        [1 / 24, 1 / 12, 1 / 6],
        [1 / 24, -1 / 12, 1 / 6],
        [0, 0, 1],
    ],
    np.float32,
)
AT4 = np.array(
    [
        [1, 1, 1, 1, 1, 0],
        [0, 1, -1, 2, -2, 0],
        [0, 1, 1, 4, 4, 0],
        [0, 1, -1, 8, -8, 1],
    ],
    np.float32,
)

_MATS = {2: (BT2, G2, AT2), 4: (BT4, G4, AT4)}


def conv3d_wino_z(x: jnp.ndarray, kernel: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None, m: int = 4,
                  precision=None) -> jnp.ndarray:
    """Stride-1 SAME 3x3x3 conv via z-axis Winograd F(m,3).

    ``x`` (B, D, H, W, Ci) with D % m == 0; ``kernel`` (3, 3, 3, Ci, Co)
    in the model's parameter dtype (float32) or the compute dtype.
    Output matches ``lax.conv_general_dilated(..., 'SAME')`` up to float
    reassociation (exact to ~1e-6 in float32 — tests/test_winograd.py).
    """
    BT, G, AT = _MATS[m]
    a = m + 2
    B, D, H, W, Ci = x.shape
    Co = kernel.shape[-1]
    Dt = D // m
    cdt = x.dtype  # combine in the compute dtype: coefficients are small
    # exact integers; an f32 combine doubles the transform bandwidth

    # tap views in tile space: plane t*m + (k-1) for tap k; k=0 is the
    # previous tile's last plane, k=m+1 the next tile's first (SAME pad 1)
    xt = x.reshape(B, Dt, m, H, W, Ci)
    zero = jnp.zeros_like(xt[:, :1, :1])
    taps = [jnp.concatenate([zero, xt[:, :-1, m - 1 : m]], axis=1)[:, :, 0]]
    for k in range(1, m + 1):
        taps.append(xt[:, :, k - 1])
    taps.append(jnp.concatenate([xt[:, 1:, 0:1], zero], axis=1)[:, :, 0])

    # input transform: V[p] = sum_k BT[p,k] x_k  (fused elementwise)
    V = []
    for p in range(a):
        acc = None
        for k in range(a):
            c = float(BT[p, k])
            if c == 0.0:
                continue
            term = taps[k].astype(cdt) * c if c != 1.0 else taps[k].astype(cdt)
            acc = term if acc is None else acc + term
        V.append(acc)

    # kernel transform in the PARAMETER dtype (f32 params: exact 1/6
    # fractions), cast to compute dtype at the conv
    Wt = [
        sum(float(G[p, dz]) * kernel[dz] for dz in range(3) if G[p, dz] != 0)
        for p in range(a)
    ]

    # per-point 3x3 conv2d over (y, x), batch (B * Dt)
    M = []
    for p in range(a):
        v2 = V[p].reshape(B * Dt, H, W, Ci)
        mp = lax.conv_general_dilated(
            v2, Wt[p].astype(cdt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
        M.append(mp.reshape(B, Dt, H, W, Co))

    # inverse transform: out[:, t*m + j] = sum_p AT[j,p] M[p][:, t]
    outs = []
    for j in range(m):
        acc = None
        for p in range(a):
            c = float(AT[j, p])
            if c == 0.0:
                continue
            term = M[p] * c if c != 1.0 else M[p]
            acc = term if acc is None else acc + term
        outs.append(acc)
    out = jnp.stack(outs, axis=2).reshape(B, D, H, W, Co)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# Channel geometries with a MEASURED dispatch-amortized win on silicon
# (scripts/bench_winograd2.py; v5e 2026-08-20: the 512x256 / 256x512 pair
# at 1.144x standalone) — the threshold is the product of the smallest
# measured-win pair.
_WINO_MIN_CICO = 512 * 256

# Device kinds where the IN-MODEL A/B has a recorded verdict (the
# standalone win does not transfer automatically: on v5e the model-step
# dispatch bench measured 60.0-60.5 vs 59.7 ms/window direct — the point
# convs run at 97% of bf16 peak, halving the conv MACs as designed, but
# the transform + stranded-epilogue data movement at this platform's
# effective elementwise bandwidth eats the entire saving; PERFORMANCE.md
# round-3).  Empty tuple = no geometry enabled in auto mode; MICA_WINO=1
# still force-enables for tests/experiments, and unknown device kinds
# fall back to the standalone-measured geometry threshold.
_MEASURED_MODEL_VERDICTS = {"TPU v5 lite": ()}


def _device_kind() -> str:
    try:
        return getattr(jax.devices()[0], "device_kind", "")
    except Exception:  # noqa: BLE001
        return ""


def conv3d_wino_z_in_relu(x: jnp.ndarray, kernel: jnp.ndarray,
                          bias: jnp.ndarray, m: int = 4,
                          eps: float = 1e-5) -> jnp.ndarray:
    """Winograd conv fused with InstanceNorm + ReLU.

    In the full model, the direct conv's InstanceNorm statistics fuse
    into the conv's output epilogue (the ~77 ms ``convert_reduce_fusion``
    HLOs in the round-3 trace); splitting the conv into 6 Winograd point
    convs strands those reductions as separate full-tensor passes (~86 ms
    of ``convert_reduce`` + copies) that eat the entire 2x MAC saving.
    This variant phrases the statistics as per-output-plane partial sums
    computed alongside the inverse transform, so XLA fuses them into the
    same pass that writes the output.

    Statistics accumulate in float32 (same math as models.mica's
    ``instance_norm``: E[x^2] - E[x]^2 with variance clamped at 0);
    bias is folded before the stats, matching conv -> IN -> relu.
    """
    BT, G, AT = _MATS[m]
    a = m + 2
    B, D, H, W, Ci = x.shape
    Co = kernel.shape[-1]
    Dt = D // m
    cdt = x.dtype

    xt = x.reshape(B, Dt, m, H, W, Ci)
    zero = jnp.zeros_like(xt[:, :1, :1])
    taps = [jnp.concatenate([zero, xt[:, :-1, m - 1 : m]], axis=1)[:, :, 0]]
    for k in range(1, m + 1):
        taps.append(xt[:, :, k - 1])
    taps.append(jnp.concatenate([xt[:, 1:, 0:1], zero], axis=1)[:, :, 0])

    V = []
    for p in range(a):
        acc = None
        for k in range(a):
            c = float(BT[p, k])
            if c == 0.0:
                continue
            term = taps[k].astype(cdt) * c if c != 1.0 else taps[k].astype(cdt)
            acc = term if acc is None else acc + term
        V.append(acc)

    Wt = [
        sum(float(G[p, dz]) * kernel[dz] for dz in range(3) if G[p, dz] != 0)
        for p in range(a)
    ]

    M = []
    for p in range(a):
        v2 = V[p].reshape(B * Dt, H, W, Ci)
        mp = lax.conv_general_dilated(
            v2, Wt[p].astype(cdt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        M.append(mp.reshape(B, Dt, H, W, Co))

    bvec = bias.astype(cdt)
    outs = []
    s1 = jnp.zeros((B, Co), jnp.float32)
    s2 = jnp.zeros((B, Co), jnp.float32)
    for j in range(m):
        acc = None
        for p in range(a):
            c = float(AT[j, p])
            if c == 0.0:
                continue
            term = M[p] * c if c != 1.0 else M[p]
            acc = term if acc is None else acc + term
        acc = acc + bvec
        outs.append(acc)
        # per-plane partial statistics: these reduces fuse into the
        # inverse-transform fusion that produces `acc`
        s1 = s1 + jnp.sum(acc, axis=(1, 2, 3), dtype=jnp.float32)
        s2 = s2 + jnp.sum(
            jax.lax.square(acc.astype(jnp.float32)), axis=(1, 2, 3))

    n = float(D * H * W)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jax.lax.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    mean_c = mean.astype(cdt)[:, None, None, None, :]
    scale_c = scale.astype(cdt)[:, None, None, None, :]
    out = jnp.stack(outs, axis=2).reshape(B, D, H, W, Co)
    return jax.nn.relu((out - mean_c) * scale_c)


def wino_eligible(x_shape, kernel_shape, dtype, m: int = 4) -> bool:
    """Trace-time gate for the production model path.

    Requires: operator not opted out (MICA_WINO != '0'), TPU backend +
    bfloat16 compute (the f32 parity path keeps XLA's reduction order) —
    or MICA_WINO=1 forcing any backend/dtype (tests) — a 3x3x3 dense
    kernel, z divisible by m, and a measured-win channel geometry.
    """
    env = os.environ.get("MICA_WINO", "")
    if env == "0":
        return False
    if len(kernel_shape) != 5 or tuple(kernel_shape[:3]) != (3, 3, 3):
        return False
    if len(x_shape) != 5 or x_shape[1] % m or x_shape[1] < 2 * m:
        return False
    ci, co = kernel_shape[3], kernel_shape[4]
    if x_shape[4] != ci:  # grouped conv
        return False
    if env == "1":
        # forced mode: MICA_WINO_MIN_CICO scopes the forcing to large
        # geometries (A/B experiments on the dominant convs only)
        return ci * co >= int(os.environ.get("MICA_WINO_MIN_CICO", 0))
    if env != "1":
        if jax.default_backend() != "tpu" or dtype != jnp.bfloat16:
            return False
        if ci * co < _WINO_MIN_CICO:
            return False
        # unknown device kinds DECLINE in auto mode (no measured verdict
        # means no evidence the formulation wins there — the only platform
        # ever A/B'd measured it neutral-to-worse in-model); MICA_WINO=1
        # is the explicit force for experiments / new-platform measurement
        verdict = _MEASURED_MODEL_VERDICTS.get(_device_kind(), ())
        if (ci, co) not in verdict:
            return False
    return True
