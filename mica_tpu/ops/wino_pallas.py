"""Pallas z-axis Winograd F(4,3) conv — transform domain in VMEM, in the
conv emitters' physical layout.

The XLA-level Winograd study (ops/winograd.py, PERFORMANCE.md round-3)
proved the MAC saving is real — the per-point convs run at 97% of bf16
peak — but the transform-domain HBM traffic cancels it.  The round-3
Pallas kernel kept the transform domain in VMEM and won 1.349x
STANDALONE, yet lost in-model: TPU custom calls pin their operands to
the default ``{4,3,2,1,0}`` layout while XLA's conv fusions emit
``{4,0,3,2,1}`` (batch-in-sublanes), so every kernel boundary inserted
~6.4 ms transpose copies and the RDB concat materialized (33.8 ms).

Round-4 fix (this file): the kernel consumes the tensor in the
EMITTERS' OWN physical order.  A ``(B, D, H, W, C)`` activation with
layout ``{4,0,3,2,1}`` is byte-identical to a ``(D, H, W*B, C)`` array
in default layout, so the model-level wrapper does

    x_T = jnp.transpose(x, (1, 2, 3, 0, 4)).reshape(D, H, W*B, C)

and XLA folds both ops into layout bitcasts (measured:
scripts/probe_layout_boundary.py — boundary tax 10.5 -> 3.1 ms on a
copy-kernel sandwich; zero transpose copies in the custom-call chain).
Bonus of the flattened ``R = W*B`` row axis: the second-minor dim is a
full sublane multiple (512 at the production geometry), where a naive
``(..., B=8, C)`` block would waste half of every bf16 (16, 128) tile.

Kernel scheme (per grid step ``(co_blk, z_tile, h_blk, point)``):

  * the input transform (V_p = sum_k BT[p,k] x_k) is VPU combines over
    z-rows of the block, with single-row z/h halo views (clamped at
    volume edges, masked in-kernel) — the transform never touches HBM;
  * per transform point, the 3x3 (y,x) conv is 9 MXU matmuls
    ((n, Ci) x (Ci, CO_BLK), n = h_blk*W*B); dy taps are free row
    offsets into the h-padded transform slab, dx taps are applied to
    the f32 PRODUCT as sublane rolls by B rows + column edge masks
    (f32 rolls lower on Mosaic; the bf16-rotate limitation never
    applies);
  * a persistent f32 VMEM scratch accumulates the four output planes
    across transform points (inverse transform);
  * the per-(batch, channel) InstanceNorm sufficient statistics are
    accumulated in-kernel via a tiny one-hot selector matmul
    ((B, n) x (n, CO_BLK)) — rows of the flattened R axis interleave
    (w, b), and the selector sums each batch's rows without any
    layout-hostile reshape;
  * multiple input operands are supported and concatenated on the
    LANE axis inside the kernel — the RDB conv3's 256+128+128 concat
    (reference models/model.py:103-134) never materializes in HBM.

SAME zero-padding semantics match ``lax.conv_general_dilated`` exactly;
the result equals the direct conv up to float reassociation (transform
coefficients are small integers and exact binary fractions).

Reference torch network uses plain Conv3d (models/model.py:103-152);
this is a TPU-side formulation change only.
"""

from __future__ import annotations

import functools
import os
import warnings

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .winograd import AT4, BT4, G4

M_TILE = 4          # F(4,3): 4 output z-planes per tile
ALPHA = 6           # m + 2 transform points
CO_BLK = 128        # output-channel block (one lane tile)
H_BLK = 8           # h rows per grid step (n = H_BLK*W*B rows per matmul)


def _make_kernel(n_inputs: int, h_blk: int, w: int, b_sz: int,
                 with_stats: bool = True):
    def kernel(*refs):
        bt_ref, at_ref = refs[0], refs[1]
        in_refs = refs[2:2 + 9 * n_inputs]
        if with_stats:
            (wt_ref, bias_ref, out_ref, stats_ref,
             acc_ref) = refs[2 + 9 * n_inputs:]
        else:
            wt_ref, bias_ref, out_ref, acc_ref = refs[2 + 9 * n_inputs:]
            stats_ref = None

        t = pl.program_id(0)
        nt = pl.num_programs(0)
        hb = pl.program_id(1)
        nh = pl.num_programs(1)
        pp = pl.program_id(3)
        co = out_ref.shape[-1]
        n = h_blk * w * b_sz

        if with_stats:
            @pl.when((t == 0) & (hb == 0) & (pp == 0))
            def _init_stats():
                stats_ref[...] = jnp.zeros_like(stats_ref)

        @pl.when(pp == 0)
        def _init_acc():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        vpads = []
        for i in range(n_inputs):
            (z_lo, x_r, z_hi, h_lo, hl_zlo, hl_zhi,
             h_hi, hh_zlo, hh_zhi) = in_refs[9 * i:9 * i + 9]
            dt = x_r.dtype

            zlo = jnp.where(t > 0, z_lo[0], 0.0).astype(dt)
            zhi = jnp.where(t < nt - 1, z_hi[0], 0.0).astype(dt)

            def tap(k, zlo=zlo, zhi=zhi, x_r=x_r):
                if k == 0:
                    return zlo
                if k == ALPHA - 1:
                    return zhi
                return x_r[k - 1]

            # h-halo taps (one row), with the same z-edge masking
            hzlo = jnp.where(t > 0, hl_zlo[0, 0], 0.0).astype(dt)
            hzhi = jnp.where(t < nt - 1, hl_zhi[0, 0], 0.0).astype(dt)
            gzlo = jnp.where(t > 0, hh_zlo[0, 0], 0.0).astype(dt)
            gzhi = jnp.where(t < nt - 1, hh_zhi[0, 0], 0.0).astype(dt)

            def tap_hlo(k, hzlo=hzlo, hzhi=hzhi, h_lo=h_lo):
                if k == 0:
                    return hzlo
                if k == ALPHA - 1:
                    return hzhi
                return h_lo[k - 1, 0]

            def tap_hhi(k, gzlo=gzlo, gzhi=gzhi, h_hi=h_hi):
                if k == 0:
                    return gzlo
                if k == ALPHA - 1:
                    return gzhi
                return h_hi[k - 1, 0]

            # input transform on the VPU: V_p = sum_k BT[p, k] slab[k]
            vp = vlo = vhi = None
            for k in range(ALPHA):
                c = bt_ref[pp, k].astype(dt)
                tm, tl, th = tap(k) * c, tap_hlo(k) * c, tap_hhi(k) * c
                vp = tm if vp is None else vp + tm
                vlo = tl if vlo is None else vlo + tl
                vhi = th if vhi is None else vhi + th
            # SAME zero padding in y: halo rows masked at volume edges
            vlo = jnp.where(hb > 0, vlo, 0.0).astype(vp.dtype)
            vhi = jnp.where(hb < nh - 1, vhi, 0.0).astype(vp.dtype)
            vpads.append(
                jnp.concatenate([vlo[None], vp, vhi[None]], axis=0))

        vpad = vpads[0] if n_inputs == 1 else jnp.concatenate(vpads, axis=-1)
        ci_tot = vpad.shape[-1]

        col = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) // b_sz) % w
        not_first_col = col != 0
        not_last_col = col != w - 1

        mp = jnp.zeros((n, co), jnp.float32)
        for dy in range(3):
            lhs = vpad[dy:dy + h_blk].reshape(n, ci_tot)
            wslice = wt_ref[dy]
            for dx in range(3):
                prod = jnp.dot(lhs, wslice[:, dx * co:(dx + 1) * co],
                               preferred_element_type=jnp.float32)
                # dx spatial offset on the f32 product: roll by B rows
                # (rows interleave (w, b) with b minor)
                if dx == 0:
                    prod = jnp.where(not_first_col,
                                     pltpu.roll(prod, b_sz, 0), 0.0)
                elif dx == 2:
                    prod = jnp.where(not_last_col,
                                     pltpu.roll(prod, n - b_sz, 0), 0.0)
                mp = mp + prod

        # inverse transform: fold this point into each output plane
        for j in range(M_TILE):
            acc_ref[j] += mp * at_ref[j, pp]

        @pl.when(pp == ALPHA - 1)
        def _emit():
            bias = bias_ref[0].astype(jnp.float32)
            if with_stats:
                # one-hot batch selector: row r of the flattened (h, w, b)
                # axis belongs to batch r % b — S @ oj sums each batch's
                # rows
                rows_mod = jax.lax.broadcasted_iota(
                    jnp.int32, (b_sz, n), 1) % b_sz
                bids = jax.lax.broadcasted_iota(jnp.int32, (b_sz, n), 0)
                sel = (rows_mod == bids).astype(jnp.float32)
                s1 = jnp.zeros((b_sz, co), jnp.float32)
                s2 = jnp.zeros((b_sz, co), jnp.float32)
            for j in range(M_TILE):
                oj = acc_ref[j] + bias
                if with_stats:
                    s1 = s1 + jnp.dot(sel, oj,
                                      preferred_element_type=jnp.float32)
                    s2 = s2 + jnp.dot(sel, oj * oj,
                                      preferred_element_type=jnp.float32)
                out_ref[j] = oj.reshape(h_blk, w * b_sz, co).astype(
                    out_ref.dtype)
            if with_stats:
                stats_ref[:, 0] += s1
                stats_ref[:, 1] += s2

    return kernel


def _transform_weights(kernel, dtype):
    """(3,3,3,Ci,Co) f32 -> (ALPHA*3, Ci, nco*3*CO_BLK) in the compute
    dtype: per transform point / dy, the 3 dx taps' kernels concatenated
    on lanes per co-block so the in-kernel dx slices are 128-aligned."""
    ci, co_total = kernel.shape[3], kernel.shape[4]
    nco = co_total // CO_BLK
    g = jnp.asarray(G4)  # (ALPHA, 3)
    wt = jnp.einsum("pz,zyxio->pyxio", g, kernel)  # (ALPHA,dy,dx,Ci,Co)
    wt = jnp.transpose(wt, (0, 1, 3, 2, 4))  # (ALPHA, dy, Ci, dx, Co)
    wt = wt.reshape(ALPHA * 3, ci, 3, nco, CO_BLK)
    wt = jnp.transpose(wt, (0, 1, 3, 2, 4)).reshape(
        ALPHA * 3, ci, nco * 3 * CO_BLK)
    return wt.astype(dtype)


def _wino_T(xs, wt, bias, w: int, b_sz: int, interpret: bool,
            with_stats: bool = True):
    """Core kernel on emitter-layout inputs.

    xs: list of (D, H, R, Ci_i) arrays (R = W*B, all same D/H/R);
    wt: transformed weights from ``_transform_weights``; bias (Co,) f32.
    Returns (out (D, H, R, Co) in x dtype, stats (B, 2, Co) f32) where
    stats are the per-(batch, channel) sums of out and out^2; with
    ``with_stats=False`` the stats matmuls are skipped and stats is
    ``None`` (the backward's dx conv needs no InstanceNorm statistics).
    """
    d, h, r, _ = xs[0].shape
    ci_tot = sum(x.shape[-1] for x in xs)
    co_total = wt.shape[-1] // 3
    assert d % M_TILE == 0 and co_total % CO_BLK == 0, (d, co_total)
    h_blk = H_BLK if h % H_BLK == 0 else 1
    assert h % h_blk == 0
    nt, nh, nco = d // M_TILE, h // h_blk, co_total // CO_BLK

    def in_specs_for(ci):
        def spec(zc, hc, zmap, hmap):
            return pl.BlockSpec(
                (zc, hc, r, ci),
                lambda t, hb, co, p, zm=zmap, hm=hmap: (zm(t), hm(hb), 0, 0),
                memory_space=pltpu.VMEM)

        z_of_t = lambda t: t
        zlo = lambda t: jnp.clip(t * M_TILE - 1, 0, d - 1)
        zhi = lambda t: jnp.clip(t * M_TILE + M_TILE, 0, d - 1)
        h_of = lambda hb: hb
        hlo = lambda hb: jnp.clip(hb * h_blk - 1, 0, h - 1)
        hhi = lambda hb: jnp.clip((hb + 1) * h_blk, 0, h - 1)
        return [
            spec(1, h_blk, zlo, h_of),
            spec(M_TILE, h_blk, z_of_t, h_of),
            spec(1, h_blk, zhi, h_of),
            spec(M_TILE, 1, z_of_t, hlo),
            spec(1, 1, zlo, hlo),
            spec(1, 1, zhi, hlo),
            spec(M_TILE, 1, z_of_t, hhi),
            spec(1, 1, zlo, hhi),
            spec(1, 1, zhi, hhi),
        ]

    bt = jnp.asarray(BT4, jnp.float32)
    at = jnp.asarray(AT4, jnp.float32)
    smem = pltpu.SMEM
    in_specs = [
        pl.BlockSpec((ALPHA, ALPHA), lambda t, hb, co, p: (0, 0),
                     memory_space=smem),
        pl.BlockSpec((M_TILE, ALPHA), lambda t, hb, co, p: (0, 0),
                     memory_space=smem),
    ]
    args = [bt, at]
    for x in xs:
        in_specs.extend(in_specs_for(x.shape[-1]))
        args.extend([x] * 9)
    in_specs.extend([
        # one point's (3, Ci, 3*CO_BLK) slice of the transformed kernel
        # per grid step (the all-points block double-buffers 6x the VMEM)
        pl.BlockSpec((3, ci_tot, 3 * CO_BLK),
                     lambda t, hb, co, p: (p, 0, co),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CO_BLK), lambda t, hb, co, p: (0, co),
                     memory_space=pltpu.VMEM),
    ])
    args.extend([wt, bias.reshape(1, co_total).astype(jnp.float32)])

    n = h_blk * r
    out_specs = [
        pl.BlockSpec((M_TILE, h_blk, r, CO_BLK),
                     lambda t, hb, co, p: (t, hb, 0, co),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((d, h, r, co_total), xs[0].dtype)]
    if with_stats:
        out_specs.append(
            pl.BlockSpec((b_sz, 2, CO_BLK),
                         lambda t, hb, co, p: (0, 0, co),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((b_sz, 2, co_total), jnp.float32))
    res = pl.pallas_call(
        _make_kernel(len(xs), h_blk, w, b_sz, with_stats),
        # co INSIDE (t, hb): the x/halo blocks keep their index across
        # the (co, p) inner loops, so each input tile DMAs once per
        # (z, h) tile instead of once per co-block (halves input HBM
        # traffic at nco=2); stats/out write-back per co block is tiny
        grid=(nt, nh, nco, ALPHA),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((M_TILE, n, CO_BLK), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # stats/out/acc are revisited across grid dims: all sequential
            dimension_semantics=("arbitrary",) * 4,
            vmem_limit_bytes=100 << 20,
        ),
    )(*args)
    if with_stats:
        return res[0], res[1]
    return res[0], None


def _to_T(x):
    """(B, D, H, W, C) logical -> (D, H, W*B, C): byte-identical to the
    conv emitters' {4,0,3,2,1} layout, so both ops fold to bitcasts."""
    b, d, h, w, c = x.shape
    return jnp.transpose(x, (1, 2, 3, 0, 4)).reshape(d, h, w * b, c)


def _from_T(xt, b, w):
    d, h, r, c = xt.shape
    return jnp.transpose(xt.reshape(d, h, w, b, c), (3, 0, 1, 2, 4))


@functools.partial(jax.jit, static_argnames=("interpret",))
def wino_conv3d_pallas(x, kernel: jnp.ndarray, bias: jnp.ndarray,
                       interpret: bool = False):
    """3x3x3 SAME stride-1 conv + bias via in-VMEM Winograd F(4,3).

    x: (B, D, H, W, Ci) with D % 4 == 0 — or a sequence of such arrays
    differing only in Ci, treated as their channel concatenation without
    ever materializing it.  kernel (3, 3, 3, sum Ci, Co) f32; bias (Co,).
    Returns (out (B, D, H, W, Co) in x.dtype, stats (B, 2, Co) f32)
    where stats[:, 0]/stats[:, 1] are the per-(batch, channel) sums of
    out and out^2 over (D, H, W) — the InstanceNorm sufficient
    statistics, computed for free in-kernel.
    """
    xs = list(x) if isinstance(x, (list, tuple)) else [x]
    b, d, h, w, _ = xs[0].shape
    wt = _transform_weights(kernel, xs[0].dtype)
    out_t, stats = _wino_T([_to_T(xi) for xi in xs], wt, bias, w, b,
                           interpret)
    return _from_T(out_t, b, w), stats


def _apply_kernel(out_ref, ms_ref, y_ref):
    """y = relu((out - mean) * scale): a roofline elementwise pass (the
    equivalent XLA fusion measured ~100 GB/s — 21.6 ms per 512-ch apply
    — against the ~2.7 GB/s*ms HBM bound).  ``ms_ref`` carries the
    mean/scale pre-expanded along the flattened (w, b) row axis."""
    m = ms_ref[0].astype(out_ref.dtype)
    sc = ms_ref[1].astype(out_ref.dtype)
    y_ref[...] = jax.nn.relu((out_ref[...] - m[None]) * sc[None])


def _in_apply_T(out, ms_rows):
    """out (D, H, R, Co); ms_rows (2, R, Co) f32 row-expanded mean/scale."""
    d, h, r, co = out.shape
    return pl.pallas_call(
        _apply_kernel,
        grid=(co // CO_BLK, d),
        in_specs=[
            pl.BlockSpec((1, h, r, CO_BLK), lambda c, t: (t, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, r, CO_BLK), lambda c, t: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, r, CO_BLK), lambda c, t: (t, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
        # the conv output is dead after the apply: write y into its
        # buffer (saves one full-tensor HBM allocation per conv — the
        # wino path's +1 GB step-peak vs direct came from exactly this
        # out_t/y liveness overlap)
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # the surrounding model program compiles with the 32 MB
            # scoped-VMEM option; this kernel sizes its own arena
            vmem_limit_bytes=64 << 20),
    )(out, ms_rows)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def wino_conv3d_in_relu_pallas(x, kernel: jnp.ndarray, bias: jnp.ndarray,
                               eps: float = 1e-5,
                               interpret: bool = False) -> jnp.ndarray:
    """relu(instance_norm(conv3x3(x) + bias)) with the conv and the IN
    sufficient statistics computed in one Pallas pass, and the
    normalize-apply as a second roofline Pallas pass (XLA's equivalent
    elementwise fusion runs ~5x above the HBM bound here).  ``x`` may be
    a sequence of arrays (channel concatenation absorbed in-kernel).

    Matches models.mica's ``instance_norm`` math: f32 statistics in the
    E[x^2]-E[x]^2 form, variance clamped at 0, bf16 apply."""
    xs = list(x) if isinstance(x, (list, tuple)) else [x]
    b, d, h, w, _ = xs[0].shape
    wt = _transform_weights(kernel, xs[0].dtype)
    out_t, stats = _wino_T([_to_T(xi) for xi in xs], wt, bias, w, b,
                           interpret)
    n = float(d * h * w)
    mean = stats[:, 0] / n                    # (B, Co) f32
    var = jnp.maximum(stats[:, 1] / n - jax.lax.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    if not interpret and jax.default_backend() == "tpu":
        # expand (B, Co) stats along the flattened (w, b) row axis once
        # (tiny (2, R, Co) f32 tensor) so the apply kernel broadcasts
        # rows directly in the emitter layout
        ms = jnp.stack([mean, scale])         # (2, B, Co)
        ms_rows = jnp.broadcast_to(
            ms[:, None], (2, w, b, mean.shape[-1])).reshape(
                2, w * b, mean.shape[-1])
        return _from_T(_in_apply_T(out_t, ms_rows), b, w)
    out = _from_T(out_t, b, w)
    dt = out.dtype
    mean_c = mean.astype(dt)[:, None, None, None, :]
    scale_c = scale.astype(dt)[:, None, None, None, :]
    return jax.nn.relu((out - mean_c) * scale_c)


# ---------------------------------------------------------------------------
# Differentiable fused conv+IN+relu (round-5, VERDICT r4 #1): custom VJP
# around the emitter-layout kernel so TRAINING gets the Winograd MAC
# saving too.
#
# Math (c = conv(x, k) + b; xhat = (c - mean)*rsqrt(var + eps);
# y = relu(xhat), per-(batch, channel) statistics over spatial):
#   * db == 0 exactly — InstanceNorm subtracts the mean, so a constant
#     channel shift never reaches y (the reference's torch autodiff
#     produces the same zero, just numerically);
#   * dxhat = dy * [xhat > 0];
#   * dc = scale * (dxhat - mean(dxhat) - xhat * mean(dxhat * xhat));
#   * dx = conv_SAME(dc, flip_zyx(k) with Ci<->Co swapped) — ITSELF a
#     3x3x3 stride-1 conv whose swapped channel geometry stays inside
#     the measured-win set (512x256 <-> 256x512 etc.), so it runs on the
#     same Pallas kernel (stats pass skipped);
#   * dk = the standard weight-grad correlation, left to XLA
#     (``jax.linear_transpose`` of the direct conv — matmul-shaped, and
#     a Winograd weight-grad would need a different transform pair).
#
# Residuals: xhat (bf16, emitter layout — produced by the AD apply
# kernel together with y, no extra pass) + the (B, Co) f32 scale.  Under
# ``nn.remat`` the fwd recomputes in the backward, so the residuals cost
# no training-forward HBM.


def _apply_ad_kernel(out_ref, ms_ref, y_ref, xh_ref):
    """AD-mode normalize-apply: emits y = relu(xhat) AND xhat (the
    backward residual) in one roofline pass; y aliases the conv buffer.

    The relu max rides an f32 roundtrip: Mosaic on v5e rejects the bf16
    vector comparison this otherwise lowers to ("Target does not
    support this comparison", arith.cmpf on vector<8x128x2xbf16> —
    round-5 local AOT compile; the same bug is the credible cause of
    the remote helper's opaque 500 on the backward kernels)."""
    m = ms_ref[0].astype(out_ref.dtype)
    sc = ms_ref[1].astype(out_ref.dtype)
    xh = (out_ref[...] - m[None]) * sc[None]
    xh_ref[...] = xh
    y_ref[...] = jnp.maximum(xh.astype(jnp.float32), 0.0).astype(
        out_ref.dtype)


def _in_apply_ad_T(out, ms_rows):
    d, h, r, co = out.shape
    # h-blocked (unlike the single-output production apply): the extra
    # xh output buffer at full-h blocks puts the double-buffered VMEM
    # stack at 64.25 MB — 256 KB over the 64 MB scoped limit
    # (RESOURCE_EXHAUSTED from the v5e AOT compiler, round-5)
    h_blk = H_BLK if h % H_BLK == 0 else 1
    big = pl.BlockSpec((1, h_blk, r, CO_BLK),
                       lambda c, t, hb: (t, hb, 0, c),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _apply_ad_kernel,
        grid=(co // CO_BLK, d, h // h_blk),
        in_specs=[
            big,
            pl.BlockSpec((2, r, CO_BLK), lambda c, t, hb: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[big, big],
        out_shape=[
            jax.ShapeDtypeStruct(out.shape, out.dtype),
            jax.ShapeDtypeStruct(out.shape, out.dtype),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 3,
            vmem_limit_bytes=64 << 20),
    )(out, ms_rows)


def _make_bwd_stats_kernel(b_sz: int):
    def kernel(xh_ref, dy_ref, st_ref):
        t = pl.program_id(1)
        hb = pl.program_id(2)

        @pl.when((t == 0) & (hb == 0))
        def _init():
            st_ref[...] = jnp.zeros_like(st_ref)

        xh = xh_ref[0]                       # (h_blk, r, CO_BLK)
        # f32 comparison: bf16 vector cmpf is a Mosaic error on v5e
        g = jnp.where(xh.astype(jnp.float32) > 0,
                      dy_ref[0].astype(jnp.float32), 0.0)
        hb_, r, co = g.shape
        n = hb_ * r
        gf = g.reshape(n, co)
        gx = (g * xh.astype(jnp.float32)).reshape(n, co)
        # r is a multiple of b, so row % b == (flattened row) % b
        rows_mod = jax.lax.broadcasted_iota(jnp.int32, (b_sz, n), 1) % b_sz
        bids = jax.lax.broadcasted_iota(jnp.int32, (b_sz, n), 0)
        sel = (rows_mod == bids).astype(jnp.float32)
        st_ref[:, 0] += jnp.dot(sel, gf,
                                preferred_element_type=jnp.float32)
        st_ref[:, 1] += jnp.dot(sel, gx,
                                preferred_element_type=jnp.float32)

    return kernel


def _in_bwd_stats_T(xh, dy, b_sz: int):
    """Per-(batch, channel) sums of dxhat and dxhat*xhat: (B, 2, Co) f32."""
    d, h, r, co = xh.shape
    h_blk = H_BLK if h % H_BLK == 0 else 1
    return pl.pallas_call(
        _make_bwd_stats_kernel(b_sz),
        grid=(co // CO_BLK, d, h // h_blk),
        in_specs=[
            pl.BlockSpec((1, h_blk, r, CO_BLK),
                         lambda c, t, hb: (t, hb, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_blk, r, CO_BLK),
                         lambda c, t, hb: (t, hb, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_sz, 2, CO_BLK),
                               lambda c, t, hb: (0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_sz, 2, co), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3,
            vmem_limit_bytes=64 << 20),
    )(xh, dy)


def _bwd_apply_kernel(xh_ref, dy_ref, ms_ref, dc_ref):
    """dc = scale * (g - m1 - xhat * m2), row-broadcast stats.
    f32 comparison: bf16 vector cmpf is a Mosaic error on v5e."""
    dt = xh_ref.dtype
    xh = xh_ref[...]
    g = jnp.where(xh.astype(jnp.float32) > 0, dy_ref[...], 0).astype(dt)
    m1 = ms_ref[0].astype(dt)
    m2 = ms_ref[1].astype(dt)
    sc = ms_ref[2].astype(dt)
    dc_ref[...] = sc[None] * (g - m1[None] - xh * m2[None])


def _in_bwd_apply_T(xh, dy, ms_rows):
    d, h, r, co = xh.shape
    h_blk = H_BLK if h % H_BLK == 0 else 1
    return pl.pallas_call(
        _bwd_apply_kernel,
        grid=(co // CO_BLK, d, h // h_blk),
        in_specs=[
            pl.BlockSpec((1, h_blk, r, CO_BLK),
                         lambda c, t, hb: (t, hb, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_blk, r, CO_BLK),
                         lambda c, t, hb: (t, hb, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, r, CO_BLK), lambda c, t, hb: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_blk, r, CO_BLK),
                               lambda c, t, hb: (t, hb, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xh.shape, xh.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 3,
            vmem_limit_bytes=64 << 20),
    )(xh, dy, ms_rows)


def _rows_expand(stats_2d, w: int, b_sz: int):
    """(k, B, Co) f32 -> (k, W*B, Co): stats broadcast along the
    flattened (w, b) row axis (rows interleave (w, b) with b minor)."""
    k, b, co = stats_2d.shape
    return jnp.broadcast_to(stats_2d[:, None], (k, w, b, co)).reshape(
        k, w * b_sz, co)


def _use_pallas_elementwise(interpret: bool) -> bool:
    # MICA_WINO_AD_XLA_EW=1: XLA elementwise in the AD fwd/bwd instead of
    # the Pallas apply/stats kernels (compile-ceiling bisection)
    if os.environ.get("MICA_WINO_AD_XLA_EW") == "1":
        return False
    return not interpret and jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def wino_conv3d_in_relu_pallas_ad(parts, kernel, bias,
                                  eps: float = 1e-5,
                                  interpret: bool = False):
    """Differentiable relu(instance_norm(conv3x3(concat(parts)) + bias))
    on the emitter-layout Pallas Winograd kernel.  ``parts`` is a tuple
    of (B, D, H, W, Ci_i) arrays (the dense-connection concat, absorbed
    in-kernel); kernel (3, 3, 3, sum Ci, Co) f32; bias (Co,) f32.

    Same numerics as ``wino_conv3d_in_relu_pallas``; the custom VJP (see
    the design note above) keeps training on the Winograd roofline:
    dx is the swapped-geometry conv on this same kernel, the IN+relu
    backward runs as two roofline Pallas passes, dk stays an XLA
    weight-grad conv, and db is exactly zero (bias feeding InstanceNorm
    has no gradient).
    """
    y, _ = _wino_in_relu_ad_fwd(parts, kernel, bias, eps, interpret)
    return y


def _wino_in_relu_ad_fwd(parts, kernel, bias, eps, interpret):
    parts = tuple(parts)
    b_sz, d, h, w, _ = parts[0].shape
    xs_t = [_to_T(xi) for xi in parts]
    wt = _transform_weights(kernel, xs_t[0].dtype)
    c_t, stats = _wino_T(xs_t, wt, bias, w, b_sz, interpret)
    n = float(d * h * w)
    mean = stats[:, 0] / n
    var = jnp.maximum(stats[:, 1] / n - jax.lax.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    if _use_pallas_elementwise(interpret):
        ms_rows = _rows_expand(jnp.stack([mean, scale]), w, b_sz)
        y_t, xh_t = _in_apply_ad_T(c_t, ms_rows)
    else:
        dt = c_t.dtype
        mr = _rows_expand(mean[None], w, b_sz)[0].astype(dt)
        sr = _rows_expand(scale[None], w, b_sz)[0].astype(dt)
        xh_t = (c_t - mr[None, None]) * sr[None, None]
        y_t = jax.nn.relu(xh_t)
    return _from_T(y_t, b_sz, w), (parts, kernel, xh_t, scale)


def _wino_in_relu_ad_bwd(eps, interpret, res, dy):
    parts, kernel, xh_t, scale = res
    b_sz, d, h, w, _ = parts[0].shape
    n = float(d * h * w)
    dy_t = _to_T(dy.astype(xh_t.dtype))

    if _use_pallas_elementwise(interpret):
        gstats = _in_bwd_stats_T(xh_t, dy_t, b_sz)      # (B, 2, Co) f32
        m1 = gstats[:, 0] / n
        m2 = gstats[:, 1] / n
        ms_rows = _rows_expand(jnp.stack([m1, m2, scale]), w, b_sz)
        dc_t = _in_bwd_apply_T(xh_t, dy_t, ms_rows)
    else:
        g = jnp.where(xh_t > 0, dy_t, 0).astype(jnp.float32)
        xh_f = xh_t.astype(jnp.float32)
        # per-(batch, channel) means: rows of the R axis interleave
        # (w, b) with b minor
        g5 = g.reshape(d, h, w, b_sz, -1)
        m1 = jnp.mean(g5, axis=(0, 1, 2))
        m2 = jnp.mean((g * xh_f).reshape(d, h, w, b_sz, -1), axis=(0, 1, 2))
        dt = xh_t.dtype
        m1r = _rows_expand(m1[None], w, b_sz)[0].astype(dt)
        m2r = _rows_expand(m2[None], w, b_sz)[0].astype(dt)
        scr = _rows_expand(scale[None], w, b_sz)[0].astype(dt)
        dc_t = scr[None, None] * (
            g.astype(dt) - m1r[None, None] - xh_t * m2r[None, None])

    # dx: SAME stride-1 conv of dc with the zyx-flipped, channel-swapped
    # kernel — Winograd-shaped, same Pallas kernel, stats pass skipped
    ci_tot = kernel.shape[3]
    k_swap = jnp.flip(kernel, (0, 1, 2)).swapaxes(3, 4)  # (3,3,3,Co,Ci)
    # MICA_WINO_AD_XLA_DX=1: XLA direct conv for dx (ceiling bisection)
    if (ci_tot % CO_BLK == 0
            and os.environ.get("MICA_WINO_AD_XLA_DX") != "1"):
        wt_t = _transform_weights(k_swap, dc_t.dtype)
        dx_t, _ = _wino_T([dc_t], wt_t, jnp.zeros((ci_tot,), jnp.float32),
                          w, b_sz, interpret, with_stats=False)
        dx = _from_T(dx_t, b_sz, w)
    else:
        dx = jax.lax.conv_general_dilated(
            _from_T(dc_t, b_sz, w), k_swap.astype(dc_t.dtype), (1, 1, 1),
            "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    offs, dparts = 0, []
    for p in parts:
        ci = p.shape[-1]
        dparts.append(dx[..., offs:offs + ci].astype(p.dtype))
        offs += ci

    # dk: XLA weight-grad per part (avoids materializing the concat);
    # the conv is linear in k, so linear_transpose skips the primal.
    # The whole map runs in the compute dtype (the cast-to-compute-dtype
    # transposes back to f32, matching what autodiff of the flax conv
    # produces — XLA's weight-grad conv accumulates f32 internally).
    dc = _from_T(dc_t, b_sz, w)
    dks = []
    for p in parts:
        def conv_k(kk, p=p):
            return jax.lax.conv_general_dilated(
                p, kk.astype(p.dtype), (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        spec = jax.ShapeDtypeStruct((3, 3, 3, p.shape[-1], kernel.shape[4]),
                                    jnp.float32)
        dk_i, = jax.linear_transpose(conv_k, spec)(dc.astype(p.dtype))
        dks.append(dk_i)
    dk = jnp.concatenate(dks, axis=3).astype(kernel.dtype)

    db = jnp.zeros((kernel.shape[4],), jnp.float32)
    return tuple(dparts), dk, db


wino_conv3d_in_relu_pallas_ad.defvjp(
    lambda parts, kernel, bias, eps, interpret: _wino_in_relu_ad_fwd(
        parts, kernel, bias, eps, interpret),
    _wino_in_relu_ad_bwd,
)


@functools.partial(jax.jit, static_argnames=("interpret",))
def wino_conv3d_pallas_padded(parts, kernel: jnp.ndarray,
                              interpret: bool = False):
    """Plain conv3x3 + multi-operand concat absorption for Co NOT a
    multiple of 128: the kernel is zero-padded on the output-channel
    axis to the next CO_BLK multiple and the PADDED output returned —
    callers that consume channel slices (the cascaded heads read
    big[..., 0:64/64:128/128:192], models/mica.py FusedHeads) slice the
    padded tensor at identical cost, so the padding never materializes
    a copy.  No bias, no IN statistics (``with_stats=False``) — the
    heads add per-head biases after slicing.

    Round-5 target: the fused heads' 192->192 conv1 over the FPN
    concat (38.3 ms/dispatch as an XLA conv fusion, trace 2026-08-21)
    plus the 805 MB FPN concat materialization it reads.
    """
    parts = list(parts) if isinstance(parts, (list, tuple)) else [parts]
    b, d, h, w, _ = parts[0].shape
    co = kernel.shape[4]
    co_pad = -(-co // CO_BLK) * CO_BLK
    if co_pad != co:
        kernel = jnp.pad(kernel, ((0, 0),) * 4 + ((0, co_pad - co),))
    wt = _transform_weights(kernel, parts[0].dtype)
    out_t, _ = _wino_T([_to_T(p) for p in parts], wt,
                       jnp.zeros((co_pad,), jnp.float32), w, b, interpret,
                       with_stats=False)
    return _from_T(out_t, b, w)


def wino_heads_eligible(x_shapes, kernel_shape, dtype) -> bool:
    """Gate for the padded-Co heads conv1 path.  Structure rules are the
    kernel's; the default is the measured in-model verdict for this
    device kind (see ``_MEASURED_HEADS_WINS``); ``MICA_WINO_HEADS``
    force-overrides ("0" off, "1" on, "interpret" for CPU parity)."""
    env = os.environ.get("MICA_WINO_HEADS", "")
    if env == "0":
        return False
    shapes = (list(x_shapes) if x_shapes
              and isinstance(x_shapes[0], (tuple, list)) else [x_shapes])
    if len(kernel_shape) != 5 or tuple(kernel_shape[:3]) != (3, 3, 3):
        return False
    if any(len(s) != 5 for s in shapes):
        return False
    if any(tuple(s[:4]) != tuple(shapes[0][:4]) for s in shapes):
        return False
    if sum(s[4] for s in shapes) != kernel_shape[3]:
        return False
    b, d, h, w, _ = shapes[0]
    if d % M_TILE or d < 2 * M_TILE or h % H_BLK or (w * b) % 8 or w < 8:
        return False
    if env == "interpret":
        return True
    if jax.default_backend() != "tpu" or dtype != jnp.bfloat16:
        return False
    if w * b > 512:  # same validated row-size cap as the main gate
        return False
    if env == "1":
        return True
    ci, co = kernel_shape[3], kernel_shape[4]
    return (ci, co) in _MEASURED_HEADS_WINS.get(_device_kind(), ())


# Measured in-model verdicts for the padded-Co heads path (filled only
# after a live A/B records a win; scripts/bench_heads_wino.py under
# MICA_WINO_HEADS=1 measures a candidate platform).
_MEASURED_HEADS_WINS: dict = {}


# Per-device-kind measured IN-MODEL verdicts (scripts/bench_model_dispatch
# A/B, PERFORMANCE.md round-4): channel geometries where the emitter-layout
# kernel beats XLA's direct conv inside the full model step.  Unknown
# device kinds DECLINE in auto mode (same measured-verdict pattern as the
# depthwise registry); MICA_WINO_PALLAS=1 forces for experiments.
_MEASURED_MODEL_WINS = {
    # v5e (2026-08-20): 60.2 -> 57.2 ms/window with the two dominant
    # convs; 55.5 with all five co%128 geometries; adding (64, 128)
    # regressed to 55.9 — excluded.  scripts/bench_model_dispatch.py
    # under MICA_WINO_PALLAS=1 + MICA_WINO_PALLAS_MIN re-measures.
    "TPU v5 lite": ((512, 256), (256, 512), (256, 128), (384, 128),
                    (128, 256)),
}


def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind
    except Exception:  # noqa: BLE001
        return "unknown"


def wino_pallas_eligible(x_shape, kernel_shape, dtype) -> bool:
    """Gate for the production model path: measured per-platform default
    (``_MEASURED_MODEL_WINS``), with ``MICA_WINO_PALLAS`` as operator
    override ("0" force off, "1" force on, "interpret" for CPU parity
    tests).  ``x_shape`` may be a sequence of shapes (the concat-absorbed
    multi-operand form); structural rules below are the kernel's."""
    env = os.environ.get("MICA_WINO_PALLAS", "")
    if env == "0":
        return False
    if env not in ("1", "interpret") and jax.default_backend() != "tpu":
        return False
    shapes = (list(x_shape) if x_shape and isinstance(x_shape[0], (tuple, list))
              else [x_shape])
    if len(kernel_shape) != 5 or tuple(kernel_shape[:3]) != (3, 3, 3):
        return False
    if any(len(s) != 5 for s in shapes):
        return False
    if any(tuple(s[:4]) != tuple(shapes[0][:4]) for s in shapes):
        return False
    if sum(s[4] for s in shapes) != kernel_shape[3]:
        return False
    b, d, h, w, _ = shapes[0]
    ci, co = kernel_shape[3], kernel_shape[4]
    if d % M_TILE or d < 2 * M_TILE or co % CO_BLK:
        return False
    if h % H_BLK or (w * b) % 8 or w < 8:
        return False
    if env != "interpret" and jax.default_backend() != "tpu":
        return False
    if env != "interpret" and dtype != jnp.bfloat16:
        return False
    if env in ("1", "interpret"):
        # forced mode: MICA_WINO_PALLAS_MIN selects geometries for
        # experiments / new-platform measurement.  The R = W*B > 512
        # guard applies here too — R=768 is a hard XLA TPU
        # compile-helper crash (scripts/bisect_batch12.py), not a perf
        # regression, so forcing must not re-expose it.  Interpret mode
        # (CPU parity tests) has no such compiler and stays open.
        if env == "interpret":
            return True
        max_r = int(os.environ.get("MICA_WINO_PALLAS_MAX_R", 512))
        if w * b > max_r:
            warnings.warn(
                f"MICA_WINO_PALLAS=1 declined at row size R={w * b} > "
                f"{max_r}: R=768 crashes the XLA TPU compile helper "
                "(scripts/bisect_batch12.py); falling back to direct conv. "
                "Set MICA_WINO_PALLAS_MAX_R to raise the cap for "
                "new-platform validation.")
            return False
        min_cico = int(os.environ.get("MICA_WINO_PALLAS_MIN", 512 * 256))
        return ci * co >= min_cico
    # auto mode: only measured in-model wins for THIS device kind, and
    # only at the validated row-axis size — the kernel's VMEM working
    # set scales with R = W*B, and R=768 (batch 12) was measured to
    # CRASH the XLA TPU compile helper (scripts/bisect_batch12.py);
    # larger batches silently fall back to the direct conv
    if w * b > 512:
        return False
    return (ci, co) in _MEASURED_MODEL_WINS.get(_device_kind(), ())
