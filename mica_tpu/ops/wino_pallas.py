"""Pallas z-axis Winograd F(4,3) conv — transform domain in VMEM.

The XLA-level Winograd study (ops/winograd.py, PERFORMANCE.md round-3)
proved the MAC saving is real — the six per-point convs run at 97% of
bf16 peak, halving the dominant convs' MXU time — but the transform
domain (V: 1.5x input, M: 1.5x output) and the stranded InstanceNorm
statistics round-trip through HBM at the platform's slow elementwise
rates and cancel the win.  This kernel keeps EVERYTHING in VMEM:

  * grid (B, Co/128, D/4): per step one (4, H, W, Ci) z-tile of one
    batch element, plus two single-row z-halo views (the depthwise
    kernel's clamped-and-masked scheme) — HBM reads 1.5x the input, once;
  * the input transform (V_p = sum_k BT[p,k] x_k) is a handful of VPU
    combines over untiled z-rows of the slab — never written to HBM;
  * per transform point, the 3x3 (y,x) conv becomes 3 MXU matmuls
    (one per dy, with the 3 dx taps' kernels concatenated on lanes:
    (H*W, Ci) x (Ci, 3*Co) -> f32), and the (dy, dx) spatial offsets are
    applied to the f32 PRODUCT as sublane rolls + edge masks — f32
    rolls lower on Mosaic (the bf16-rotate limitation never applies);
  * the inverse transform accumulates the four output planes in f32
    VMEM, adds the bias, and also accumulates the per-(batch, channel)
    InstanceNorm partial sums (s1, s2) into a revisited stats block —
    so the downstream IN needs no full-tensor reduction pass;
  * output written once in the compute dtype.

SAME zero-padding semantics match ``lax.conv_general_dilated`` exactly;
the result equals the direct conv up to float reassociation (transform
coefficients are small integers and exact binary fractions).

Reference torch network uses plain Conv3d (models/model.py:103-152);
this is a TPU-side formulation change only.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .winograd import AT4, BT4, G4

M_TILE = 4          # F(4,3): 4 output z-planes per tile
ALPHA = 6           # m + 2 transform points
CO_BLK = 128        # output-channel block (one lane tile)


def _kernel(bt_ref, at_ref, lo_ref, x_ref, hi_ref, wt_ref, b_ref,
            out_ref, stats_ref, acc_ref):
    """Grid (B, Co/128, D/4, ALPHA): one transform point per step.

    The p axis rides the GRID so the per-step working set stays small
    (one (3, Ci, 3*CO_BLK) wt slice instead of all six points — the
    all-points variant double-buffered a 14 MB wt block and overflowed
    the scoped-VMEM arena by ~3 MB).  ``acc_ref`` is a persistent f32
    VMEM scratch holding the four output planes across the p steps; the
    x/lo/hi blocks keep the same index across them, so Mosaic elides
    their re-DMA.  ``stats_ref`` is the revisited (1, 2, CO_BLK)
    InstanceNorm partial-sum block (s1, s2 over this batch element /
    channel block).
    """
    t = pl.program_id(2)
    nt = pl.num_programs(2)
    pp = pl.program_id(3)
    _, m, h, w, ci = x_ref.shape
    co = out_ref.shape[-1]
    n = h * w

    @pl.when((t == 0) & (pp == 0))
    def _init_stats():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    @pl.when(pp == 0)
    def _init_acc():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dt = x_ref.dtype
    lo = jnp.where(t > 0, lo_ref[0, 0], 0.0).astype(dt)
    hi = jnp.where(t < nt - 1, hi_ref[0, 0], 0.0).astype(dt)

    def tap(k):
        if k == 0:
            return lo
        if k == ALPHA - 1:
            return hi
        return x_ref[0, k - 1]

    col = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) % w
    not_first_col = col != 0
    not_last_col = col != w - 1

    # input transform on the VPU: V_p = sum_k BT[p, k] slab[k]
    vp = None
    for k in range(ALPHA):
        term = tap(k) * bt_ref[pp, k].astype(dt)
        vp = term if vp is None else vp + term
    # SAME zero padding in y once; dy taps become plain row offsets
    zero_row = jnp.zeros((1, w, ci), dt)
    vpad = jnp.concatenate([zero_row, vp, zero_row], axis=0)

    mp = jnp.zeros((n, co), jnp.float32)
    for dy in range(3):
        lhs = vpad[dy:dy + h].reshape(n, ci)
        wslice = wt_ref[dy]
        for dx in range(3):
            prod = jnp.dot(lhs, wslice[:, dx * co:(dx + 1) * co],
                           preferred_element_type=jnp.float32)
            if dx == 0:
                prod = jnp.where(not_first_col,
                                 pltpu.roll(prod, 1, 0), 0.0)
            elif dx == 2:
                prod = jnp.where(not_last_col,
                                 pltpu.roll(prod, n - 1, 0), 0.0)
            mp = mp + prod

    # inverse transform: fold this point into each output plane
    for j in range(M_TILE):
        acc_ref[j] += mp * at_ref[j, pp]

    @pl.when(pp == ALPHA - 1)
    def _emit():
        bias = b_ref[0].astype(jnp.float32)
        s1 = jnp.zeros((co,), jnp.float32)
        s2 = jnp.zeros((co,), jnp.float32)
        for j in range(M_TILE):
            oj = acc_ref[j] + bias
            s1 = s1 + jnp.sum(oj, axis=0)
            s2 = s2 + jnp.sum(oj * oj, axis=0)
            out_ref[0, j] = oj.reshape(h, w, co).astype(out_ref.dtype)
        stats_ref[0, 0] += s1
        stats_ref[0, 1] += s2


@functools.partial(jax.jit, static_argnames=("interpret",))
def wino_conv3d_pallas(x: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray, interpret: bool = False):
    """3x3x3 SAME stride-1 conv + bias via in-VMEM Winograd F(4,3).

    x (B, D, H, W, Ci) with D % 4 == 0; kernel (3, 3, 3, Ci, Co) f32;
    bias (Co,).  Returns (out (B, D, H, W, Co) in x.dtype,
    stats (B, 2, Co) f32) where stats[:, 0]/stats[:, 1] are the
    per-(batch, channel) sums of out and out^2 over (D, H, W) — the
    InstanceNorm sufficient statistics, computed for free in-kernel.
    """
    b, d, h, w, ci = x.shape
    co_total = kernel.shape[-1]
    assert d % M_TILE == 0 and co_total % CO_BLK == 0, (d, co_total)
    nt = d // M_TILE
    nco = co_total // CO_BLK

    # kernel transform in f32 (exact binary fractions), then the compute
    # dtype; lane layout (co_block, dx, CO_BLK) so the per-co-block
    # BlockSpec slice is contiguous and the in-kernel dx slices are
    # 128-lane aligned
    g = jnp.asarray(G4)  # (ALPHA, 3)
    wt = jnp.einsum("pz,zyxio->pyxio", g, kernel)  # (ALPHA,dy,dx,Ci,Co)
    wt = jnp.transpose(wt, (0, 1, 3, 2, 4))  # (ALPHA, dy, Ci, dx, Co)
    wt = wt.reshape(ALPHA * 3, ci, 3, nco, CO_BLK)
    wt = jnp.transpose(wt, (0, 1, 3, 2, 4)).reshape(
        ALPHA * 3, ci, nco * 3 * CO_BLK).astype(x.dtype)

    blk = (1, M_TILE, h, w, ci)
    row = (1, 1, h, w, ci)
    lo_spec = pl.BlockSpec(
        row, lambda bi, co, t, p: (bi, jnp.clip(t * M_TILE - 1, 0, d - 1),
                                   0, 0, 0),
        memory_space=pltpu.VMEM)
    hi_spec = pl.BlockSpec(
        row,
        lambda bi, co, t, p: (bi, jnp.clip(t * M_TILE + M_TILE, 0, d - 1),
                              0, 0, 0),
        memory_space=pltpu.VMEM)

    bt = jnp.asarray(BT4, jnp.float32)
    at = jnp.asarray(AT4, jnp.float32)
    smem = pltpu.SMEM
    out, stats = pl.pallas_call(
        _kernel,
        grid=(b, nco, nt, ALPHA),
        in_specs=[
            pl.BlockSpec((ALPHA, ALPHA), lambda bi, co, t, p: (0, 0),
                         memory_space=smem),
            pl.BlockSpec((M_TILE, ALPHA), lambda bi, co, t, p: (0, 0),
                         memory_space=smem),
            lo_spec,
            pl.BlockSpec(blk, lambda bi, co, t, p: (bi, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            hi_spec,
            # one point's (3, Ci, 3*CO_BLK) slice of the transformed
            # kernel per grid step (the full-points block double-buffered
            # 14 MB and overflowed the arena)
            pl.BlockSpec((3, ci, 3 * CO_BLK),
                         lambda bi, co, t, p: (p, 0, co),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO_BLK), lambda bi, co, t, p: (0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, M_TILE, h, w, CO_BLK),
                         lambda bi, co, t, p: (bi, t, 0, 0, co),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, CO_BLK), lambda bi, co, t, p: (bi, 0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d, h, w, co_total), x.dtype),
            jax.ShapeDtypeStruct((b, 2, co_total), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((M_TILE, h * w, CO_BLK), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # stats/out/acc are revisited across grid dims: all sequential
            dimension_semantics=("arbitrary",) * 4,
            vmem_limit_bytes=100 << 20,
        ),
    )(bt, at, x, x, x, wt, bias.reshape(1, co_total).astype(jnp.float32))
    return out, stats


def _apply_kernel(out_ref, ms_ref, y_ref):
    """y = relu((out - mean) * scale): a roofline elementwise pass (the
    equivalent XLA fusion measured ~100 GB/s — 21.6 ms per 512-ch apply
    — against the ~2.7 GB/s*ms HBM bound)."""
    m = ms_ref[0, 0].astype(out_ref.dtype)
    sc = ms_ref[0, 1].astype(out_ref.dtype)
    y_ref[...] = jax.nn.relu((out_ref[...] - m) * sc)


def _in_apply_pallas(out: jnp.ndarray, mean: jnp.ndarray,
                     scale: jnp.ndarray, d_blk: int = 4) -> jnp.ndarray:
    b, d, h, w, co = out.shape
    while d % d_blk:
        d_blk -= 1
    ms = jnp.stack([mean, scale], axis=1)  # (B, 2, Co) f32
    return pl.pallas_call(
        _apply_kernel,
        grid=(b, co // CO_BLK, d // d_blk),
        in_specs=[
            pl.BlockSpec((1, d_blk, h, w, CO_BLK),
                         lambda bi, c, t: (bi, t, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, CO_BLK), lambda bi, c, t: (bi, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_blk, h, w, CO_BLK),
                               lambda bi, c, t: (bi, t, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            # the surrounding model program compiles with the 32 MB
            # scoped-VMEM option; this kernel sizes its own arena
            vmem_limit_bytes=64 << 20),
    )(out, ms)


def wino_conv3d_in_relu_pallas(x: jnp.ndarray, kernel: jnp.ndarray,
                               bias: jnp.ndarray, eps: float = 1e-5,
                               interpret: bool = False) -> jnp.ndarray:
    """relu(instance_norm(conv3x3(x) + bias)) with the conv and the IN
    sufficient statistics computed in one Pallas pass, and the
    normalize-apply as a second roofline Pallas pass (XLA's equivalent
    elementwise fusion runs ~5x above the HBM bound here).

    Matches models.mica's ``instance_norm`` math: f32 statistics in the
    E[x^2]-E[x]^2 form, variance clamped at 0, bf16 apply."""
    out, stats = wino_conv3d_pallas(x, kernel, bias, interpret=interpret)
    _, d, h, w, _ = x.shape
    n = float(d * h * w)
    mean = stats[:, 0] / n                    # (B, Co) f32
    var = jnp.maximum(stats[:, 1] / n - jax.lax.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    if not interpret and jax.default_backend() == "tpu":
        return _in_apply_pallas(out, mean, scale)
    dt = out.dtype
    mean_c = mean.astype(dt)[:, None, None, None, :]
    scale_c = scale.astype(dt)[:, None, None, None, :]
    return jax.nn.relu((out - mean_c) * scale_c)


def wino_pallas_eligible(x_shape, kernel_shape, dtype) -> bool:
    """Gate for the production model path: operator-controlled for now
    (``MICA_WINO_PALLAS=1`` / ``interpret``), plus the structural rules
    the kernel requires.  A measured per-platform default is added only
    after the in-model A/B (the XLA wino study showed standalone wins do
    not transfer automatically)."""
    env = os.environ.get("MICA_WINO_PALLAS", "")
    if env not in ("1", "interpret"):
        return False
    if len(kernel_shape) != 5 or tuple(kernel_shape[:3]) != (3, 3, 3):
        return False
    if len(x_shape) != 5 or x_shape[4] != kernel_shape[3]:
        return False
    b, d, h, w, ci = x_shape
    co = kernel_shape[4]
    if d % M_TILE or d < 2 * M_TILE or co % CO_BLK:
        return False
    if (h * w) % 8 or w < 8:
        return False
    if env != "interpret" and jax.default_backend() != "tpu":
        return False
    if env != "interpret" and dtype != jnp.bfloat16:
        return False
    # measured-win channel geometries only (the 512x256 pair measured
    # 1.35x on v5e; smaller geometries pay the kernel's fixed VPU work
    # against far fewer MACs and are enabled only after their own A/B);
    # MICA_WINO_PALLAS_MIN overrides for experiments
    min_cico = int(os.environ.get("MICA_WINO_PALLAS_MIN", 512 * 256))
    if env != "interpret" and ci * co < min_cico:
        return False
    return True
