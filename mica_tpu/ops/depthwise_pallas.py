"""Pallas depthwise 3x3x3 conv — a VPU-native kernel for DualAttention.

The network's "local attention" convs (reference model.py:80; one per
encoder stage at C = 64/128/256) are depthwise: 27 multiply-adds per
voxel-channel, no contraction — an MXU-free, bandwidth-class op that XLA's
grouped-conv lowering runs far above its VPU/HBM roofline (measured
25.4 ms at C=64 / batch 8 / 64-cubes on v5e, vs a ~1.5 ms HBM bound).

Kernel design (why this one works where two earlier formulations didn't —
see PERFORMANCE.md "Pallas post-mortem"):

  * layout (B, D, H, W, C): C on the 128-lane axis, W on sublanes, D/H
    untiled.  The dz/dy taps become *row offset* reads on untiled axes
    (free); only the dx taps touch a tiled axis, and those use
    ``pltpu.roll`` on the sublane dim (a hardware rotate) plus a one-column
    edge mask — no misaligned-slice relayouts, no lane-axis competition
    between taps and channels (the failure mode of the tap-packed MXU
    formulation).
  * grid over (B, D/blk); the z-halo arrives through two SINGLE-ROW views
    of the input (the row below / above the block, clamped at the volume
    edge and masked there), so HBM traffic is (blk+2)/blk of the input —
    not the 3x a full-neighbour-block scheme pays.  Pallas double-buffers
    every BlockSpec input across grid steps, overlapping DMA with compute.
  * f32 accumulation in VMEM; one fused bias add; output written in the
    compute dtype.  The z-block size adapts to keep the working set well
    under VMEM across C = 64..256.

SAME zero-padding semantics match ``nn.Conv(feature_group_count=C)``
exactly; the result is bit-identical up to float reassociation (the tap
order differs from XLA's reduction order).
"""

from __future__ import annotations

import functools
import json
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(prev_ref, cur_ref, next_ref, k_ref, b_ref, out_ref):
    """One (1, Dblk, H, W, C) output block.

    ``prev_ref``/``next_ref`` are (1, 1, H, W, C) single-row views of the
    z-halo (clamped at the volume edge; masked to zero there), ``k_ref``
    the (27, C) tap table in f32, ``b_ref`` the (1, C) bias.
    """
    zi = pl.program_id(1)
    nz = pl.num_programs(1)
    _, dblk, h, w, c = out_ref.shape

    # extended z-slab: [row below | block | row above], zero rows where
    # the volume ends (SAME padding in z).  The slab stays in the input
    # dtype; each (dz,dy) row set is cast to f32 at use — Mosaic's sublane
    # rotate only lowers for 32-bit data ("Rotate with non-32-bit data",
    # caught by the AOT-compile test), but a bf16 slab halves the
    # persistent VMEM so z-blocks can be twice as deep (less halo traffic).
    top = jnp.where(zi > 0, prev_ref[0, 0], 0.0)[None]
    bot = jnp.where(zi < nz - 1, next_ref[0, 0], 0.0)[None]
    slab = jnp.concatenate([top, cur_ref[0], bot], axis=0)
    # zero-pad H (untiled axis: a cheap row-granularity copy)
    slab = jnp.concatenate(
        [jnp.zeros((dblk + 2, 1, w, c), slab.dtype), slab,
         jnp.zeros((dblk + 2, 1, w, c), slab.dtype)], axis=1
    )

    # dx taps: sublane rotates + one-column edge masks (SAME padding in x).
    # out[x] = in[x-1]*k0 + in[x]*k1 + in[x+1]*k2
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    first = (col == 0)
    last = (col == w - 1)

    acc = jnp.broadcast_to(b_ref[0].astype(jnp.float32), out_ref.shape[1:])
    for dz in range(3):
        for dy in range(3):
            rows = slab[dz:dz + dblk, dy:dy + h].astype(jnp.float32)
            t0, t1, t2 = (k_ref[dz * 9 + dy * 3 + dx] for dx in range(3))
            acc += rows * t1
            left = jnp.where(first, 0.0, pltpu.roll(rows, 1, 2))
            acc += left * t0
            right = jnp.where(last, 0.0, pltpu.roll(rows, w - 1, 2))
            acc += right * t2
    out_ref[0] = acc.astype(out_ref.dtype)


def _z_blocking(shape, dtype, d_block: int = 0):
    """Adaptive z-block size plus the shared BlockSpecs: the main
    (1, d_block, H, W, C) block and the two clamped single-row z-halo
    views (kernel-masked at the volume edges).

    ``d_block`` 0 adapts to Mosaic's scoped-VMEM stack, which the
    AOT-compile bisect shows is dominated by the f32 roll/mask
    temporaries of the unrolled 9-tap loop (~29x the input block) — and
    those pay 2x lane padding when C < 128 (a (.., W, C<128) f32 tile
    pads lanes to 128).  Hence the largest divisor of D keeping one
    input block <= 2 MB for C < 128, <= 4 MB otherwise: both land the
    stack just under the 100 MB limit requested in CompilerParams, and
    bigger blocks mean fewer z-halo re-reads for this HBM-bound kernel."""
    _, d, h, w, c = shape
    if d_block <= 0:
        row_bytes = h * w * c * dtype.itemsize
        target = (4 << 20) if c >= 128 else (2 << 20)
        d_block = max(1, target // row_bytes)
    while d % d_block:
        d_block -= 1
    nz = d // d_block

    blk = (1, d_block, h, w, c)
    row = (1, 1, h, w, c)
    # halo index_maps are in units of the spec's own block shape (one row)
    prev_spec = pl.BlockSpec(
        row, lambda bi, zi: (bi, jnp.clip(zi * d_block - 1, 0, d - 1),
                             0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    next_spec = pl.BlockSpec(
        row, lambda bi, zi: (bi, jnp.clip(zi * d_block + d_block, 0, d - 1),
                             0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return d_block, nz, blk, prev_spec, next_spec


@functools.partial(jax.jit, static_argnames=("d_block", "interpret"))
def depthwise_conv3_pallas(x: jnp.ndarray, kernel: jnp.ndarray,
                           bias: jnp.ndarray, d_block: int = 0,
                           interpret: bool = False) -> jnp.ndarray:
    """Depthwise 3x3x3 SAME conv: x (B,D,H,W,C), kernel (3,3,3,1,C) flax
    grouped layout, bias (C,).  Returns x.dtype.

    ``d_block`` 0 = adaptive: the largest divisor of D that keeps one
    input block at <= ~4 MB (double-buffered in/out plus the f32
    accumulator then stay well inside v5e's VMEM at every stage width).
    """
    b, d, h, w, c = x.shape
    assert kernel.shape == (3, 3, 3, 1, c), kernel.shape
    d_block, nz, blk, prev_spec, next_spec = _z_blocking(x.shape, x.dtype,
                                                         d_block)

    taps = kernel[:, :, :, 0, :].reshape(27, c).astype(jnp.float32)
    bias2 = bias.reshape(1, c).astype(jnp.float32)

    return pl.pallas_call(
        _kernel,
        grid=(b, nz),
        in_specs=[
            prev_spec,
            pl.BlockSpec(blk, lambda bi, zi: (bi, zi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            next_spec,
            pl.BlockSpec((27, c), lambda bi, zi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, zi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(blk, lambda bi, zi: (bi, zi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the f32 slab + accumulator exceed the default 16 MB scoped
            # limit at the production block sizes (AOT-compile test)
            vmem_limit_bytes=100 << 20,
        ),
    )(x, x, x, taps, bias2)


# ---------------------------------------------------------------------------
# gradients
# ---------------------------------------------------------------------------


def _grad_kernel(prevx_ref, x_ref, nextx_ref, g_ref, out_ref):
    """Accumulates d(kernel) (rows 0..26) and d(bias) (row 27) into a
    (28, C) f32 block revisited across every grid step (sequential TPU
    grid).  Same z-slab construction as the forward kernel; the tap
    offsets index the padded INPUT slab against the un-shifted output
    gradient block, which realizes the zero-padding of SAME semantics."""
    bi = pl.program_id(0)
    zi = pl.program_id(1)
    nz = pl.num_programs(1)
    _, dblk, h, w, c = g_ref.shape

    @pl.when((bi == 0) & (zi == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    # bf16 slab + per-use f32 cast, same tradeoff as the forward kernel
    top = jnp.where(zi > 0, prevx_ref[0, 0], 0.0)[None]
    bot = jnp.where(zi < nz - 1, nextx_ref[0, 0], 0.0)[None]
    slab = jnp.concatenate([top, x_ref[0], bot], axis=0)
    slab = jnp.concatenate(
        [jnp.zeros((dblk + 2, 1, w, c), slab.dtype), slab,
         jnp.zeros((dblk + 2, 1, w, c), slab.dtype)], axis=1
    )

    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    first = (col == 0)
    last = (col == w - 1)

    g = g_ref[0].astype(jnp.float32)
    sums = [None] * 28
    sums[27] = jnp.sum(g, axis=(0, 1, 2))
    for dz in range(3):
        for dy in range(3):
            rows = slab[dz:dz + dblk, dy:dy + h].astype(jnp.float32)
            # dk[tap] = sum_p x[p + tap - 1] * g[p]; the dx-direction
            # shifts mirror the forward kernel's rotate-and-mask scheme
            sums[dz * 9 + dy * 3 + 1] = jnp.sum(rows * g, axis=(0, 1, 2))
            left = jnp.where(first, 0.0, pltpu.roll(rows, 1, 2))
            sums[dz * 9 + dy * 3 + 0] = jnp.sum(left * g, axis=(0, 1, 2))
            right = jnp.where(last, 0.0, pltpu.roll(rows, w - 1, 2))
            sums[dz * 9 + dy * 3 + 2] = jnp.sum(right * g, axis=(0, 1, 2))
    out_ref[...] += jnp.stack(sums)


@functools.partial(jax.jit, static_argnames=("d_block", "interpret"))
def _depthwise_conv3_grads(x: jnp.ndarray, g: jnp.ndarray,
                           d_block: int = 0,
                           interpret: bool = False):
    """(dk, db) for the depthwise 3x3x3 SAME conv: one pass over x and g
    (HBM-bound), vs 27 shifted multiply-reduces (27 passes) if left to
    XLA.  Returns dk (3,3,3,1,C) f32 and db (C,) f32."""
    b, d, h, w, c = x.shape
    d_block, nz, blk, prev_spec, next_spec = _z_blocking(x.shape, x.dtype,
                                                         d_block)

    out = pl.pallas_call(
        _grad_kernel,
        grid=(b, nz),
        in_specs=[
            prev_spec,
            pl.BlockSpec(blk, lambda bi, zi: (bi, zi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            next_spec,
            pl.BlockSpec(blk, lambda bi, zi: (bi, zi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((28, c), lambda bi, zi: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((28, c), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the accumulator output is revisited across EVERY grid step:
            # both dims must stay sequential
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 << 20,
        ),
    )(x, x, x, g)
    return out[:27].reshape(3, 3, 3, 1, c), out[27]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def depthwise_conv3_pallas_ad(x: jnp.ndarray, kernel: jnp.ndarray,
                              bias: jnp.ndarray, interpret: bool = False,
                              d_block: int = 0) -> jnp.ndarray:
    """Differentiable wrapper: identical forward, Pallas backward
    (dx = SAME conv of the cotangent with the spatially flipped kernel;
    dk/db in one fused accumulation pass)."""
    return depthwise_conv3_pallas(x, kernel, bias, d_block=d_block,
                                  interpret=interpret)


def _ad_fwd(x, kernel, bias, interpret, d_block):
    return depthwise_conv3_pallas(x, kernel, bias, d_block=d_block,
                                  interpret=interpret), (x, kernel, bias)


def _ad_bwd(interpret, d_block, res, g):
    x, kernel, bias = res
    c = kernel.shape[-1]
    k_flip = kernel[::-1, ::-1, ::-1]
    dx = depthwise_conv3_pallas(g, k_flip, jnp.zeros((c,), jnp.float32),
                                d_block=d_block,
                                interpret=interpret).astype(x.dtype)
    dk, db = _depthwise_conv3_grads(x, g, d_block=d_block,
                                    interpret=interpret)
    return dx, dk.astype(kernel.dtype), db.astype(bias.dtype)


depthwise_conv3_pallas_ad.defvjp(_ad_fwd, _ad_bwd)


# ---------------------------------------------------------------------------
# runtime path selection
# ---------------------------------------------------------------------------

_AUTOTUNE_MEMO: dict = {}
# Channel widths whose Pallas formulation has been PROVEN on this platform
# in this process: full-tensor forward parity, grad parity (the custom VJP
# compiles and matches XLA autodiff), and measured faster than the grouped
# conv at that width.  The DualAttention gate consults this per width, so
# a decision can never leak to an unvalidated configuration (a process-
# global "on" bit could not express what it was validated for).
_VALIDATED_WIDTHS: dict = {}
_CACHE_FILE = os.path.join(os.path.expanduser("~"), ".cache", "mica_tpu",
                           "dw_autotune.json")
# Device kinds with a RECORDED silicon A/B verdict: widths where the Pallas
# kernel won (empty = XLA grouped conv won everywhere) plus the code
# fingerprint the verdict was measured at.  v5e measured 2026-08-19
# (PERFORMANCE.md "Depthwise verdict on silicon"): XLA 7.6 ms vs Pallas
# 16.5 ms at C=64 and XLA ahead at 128/256 too — nothing enabled.
# An EMPTY verdict is safe at any fingerprint (it only declines the
# optional kernel); a non-empty verdict would enable Pallas widths without
# the registry's in-process parity/grad gates, so it is honored only while
# the module fingerprint still matches the one the measurement was taken
# at — otherwise selection falls through to the live autotune (which runs
# the full per-width validation).
_MEASURED_PLATFORM_DEFAULTS: dict = {
    "TPU v5 lite": {"widths": (), "fingerprint": None},
}


def depthwise_active(channels: int) -> bool:
    """Trace-time gate: should a depthwise conv of this width take the
    Pallas kernel?  ``MICA_PALLAS_DW`` is an operator override ("0" force
    off, "1" force on); otherwise only widths validated by
    ``pick_depthwise_path`` on this platform qualify."""
    env = os.environ.get("MICA_PALLAS_DW", "")
    if env == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    if env == "1":
        return True
    return bool(_VALIDATED_WIDTHS.get(int(channels)))


def _code_fingerprint() -> str:
    """Hash of this module's source + jax version: cached decisions must
    not outlive the code that earned them (a later kernel fix would never
    re-measure; a later kernel bug would skip the parity gate)."""
    import hashlib

    try:
        with open(__file__, "rb") as f:
            src = f.read()
    except OSError:
        src = b""
    return hashlib.sha1(src + jax.__version__.encode()).hexdigest()[:10]


def pick_depthwise_path(widths=(64, 128, 256), spatial: int = 64) -> dict:
    """Validate + A/B this kernel against XLA's grouped conv on the live
    backend, PER channel width, and register the winners in
    ``_VALIDATED_WIDTHS`` (consulted by the DualAttention gate at trace
    time via ``depthwise_active``).

    A width is enabled only if, at the REAL traced spatial size, the full
    forward output matches XLA to bf16 tolerance (on-device max-abs-diff
    — covers every z-block seam), the custom-VJP backward compiles and
    matches XLA autodiff (enabling a width flips training onto the
    backward programs too), and the Pallas forward measures faster.
    Failures are per-width: a VMEM overflow at C=256 cannot cost the
    C=64 win.  The measurement batch shrinks with spatial*width to bound
    host/device memory (~2^27 elements per tensor).  Decisions are
    memoized per process and disk-cached per device kind + shape + code
    fingerprint.  Never raises; never mutates the environment.
    """
    import time

    import numpy as np

    spatial = int(spatial)
    try:
        if jax.default_backend() != "tpu":
            return {"path": "xla", "autotuned": False, "why": "not on tpu"}
        env = os.environ.get("MICA_PALLAS_DW")
        if env is not None:
            return {"path": {"1": "pallas", "interpret": "interpret"}.get(
                        env, "xla"),
                    "autotuned": False, "why": f"env override ({env!r})"}
        if jax.process_count() > 1:
            # Per-host timing could diverge, and hosts compiling DIFFERENT
            # programs for one SPMD computation deadlocks the collectives.
            # Multi-host runs must opt in uniformly via MICA_PALLAS_DW=1.
            return {"path": "xla", "autotuned": False, "why": "multi-host"}

        kind = getattr(jax.devices()[0], "device_kind", "tpu")
        fp = _code_fingerprint()
        key = f"{kind}|s{spatial}|w{','.join(map(str, widths))}|{fp}"
    except Exception as e:  # noqa: BLE001 - selection must never fail
        return {"path": "xla", "autotuned": False,
                "error": f"{type(e).__name__}: {e}"[:200]}

    # A fresher measurement (a MICA_DW_AUTOTUNE=1 run wrote the disk cache,
    # keyed with the CURRENT code fingerprint + widths + spatial) takes
    # precedence over the baked platform default below.
    cached = _AUTOTUNE_MEMO.get(key)
    if cached is None:
        try:
            with open(_CACHE_FILE) as f:
                cached = json.load(f).get(key)
        except (OSError, ValueError):
            cached = None
    if cached is not None:
        _AUTOTUNE_MEMO[key] = cached
        for c in cached.get("enabled", ()):
            _VALIDATED_WIDTHS[int(c)] = True
        return dict(cached, cache_hit=True)

    baked = _MEASURED_PLATFORM_DEFAULTS.get(kind)
    if (baked is not None and os.environ.get("MICA_DW_AUTOTUNE") != "1"
            and (not baked["widths"] or baked["fingerprint"] == fp)):
        # The live A/B costs ~10 min of remote compiles in a fresh
        # container (5 programs/width through the tunnel) and its
        # outcome on this device kind is already known from a recorded
        # silicon measurement (PERFORMANCE.md, 2026-08-19: XLA's
        # grouped conv beats the Pallas kernel at every width on v5e).
        # Skipping is the SAFE direction when the verdict is empty — it
        # only declines the optional kernel; a non-empty verdict is
        # honored only at its recorded code fingerprint (gate above).
        # A future kernel change re-measures via MICA_DW_AUTOTUNE=1 or
        # forces the kernel via MICA_PALLAS_DW=1.
        for c in baked["widths"]:
            _VALIDATED_WIDTHS[int(c)] = True
        return {"path": "pallas" if baked["widths"] else "xla",
                "autotuned": False,
                "enabled": list(baked["widths"]),
                "why": f"measured platform default for {kind!r} "
                       "(MICA_DW_AUTOTUNE=1 re-measures)"}

    import flax.linen as nn

    rng = np.random.default_rng(1)
    detail: dict = {"autotuned": True, "spatial": spatial, "enabled": []}
    saved_ms = 0.0

    @jax.jit
    def _maxdiff(a, bb):
        return jnp.max(jnp.abs(a.astype(jnp.float32)
                               - bb.astype(jnp.float32)))

    def _t(fn, xx, chain=8, reps=3):
        # Chain `chain` dependent applications inside ONE jitted program:
        # on tunneled backends (axon) a single dispatch costs ~10-16 ms,
        # which swamps per-call timing and once made a 7.6 ms XLA conv and
        # a 16 ms Pallas kernel look like a tie.  Amortizing the dispatch
        # over the chain measures device time.
        loop = jax.jit(lambda x0: jax.lax.fori_loop(
            0, chain, lambda _, acc: fn(acc), x0))
        out = loop(xx)
        _ = np.asarray(out[0, 0, 0, 0, 0])  # forced readback
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(xx)
            _ = np.asarray(out[0, 0, 0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        return best / chain

    for c in widths:
        try:
            batch = max(1, min(8, (1 << 27) // (spatial ** 3 * c)))
            shape = (batch, spatial, spatial, spatial, c)
            x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32),
                            jnp.bfloat16)
            k = jnp.asarray(
                rng.standard_normal((3, 3, 3, 1, c), dtype=np.float32))
            b = jnp.asarray(rng.standard_normal((c,), dtype=np.float32))
            conv = nn.Conv(features=c, kernel_size=(3,) * 3, padding="SAME",
                           feature_group_count=c, dtype=jnp.bfloat16,
                           param_dtype=jnp.float32)
            variables = {"params": {"kernel": k, "bias": b}}
            xla_fn = jax.jit(
                lambda xx, _c=conv, _v=variables: _c.apply(_v, xx))
            pl_fn = jax.jit(
                lambda xx, _k=k, _b=b: depthwise_conv3_pallas(xx, _k, _b))

            ref = xla_fn(x)
            err = float(_maxdiff(ref, pl_fn(x)))
            scale = float(jnp.max(jnp.abs(ref)).astype(jnp.float32)) + 1e-6
            if err > 0.1 * scale:
                detail[f"c{c}_reject"] = f"parity err={err:.3f}"
                continue

            # the backward must also compile and agree before training can
            # be flipped onto this width.  The cotangent is an ARGUMENT,
            # not a closure: a closed-over device array is baked into the
            # HLO as a constant, and on tunneled platforms (axon) the
            # remote-compile request then exceeds the body-size limit
            # (HTTP 413) for batch-scale tensors.
            cot = jnp.asarray(rng.standard_normal(shape, dtype=np.float32),
                              jnp.bfloat16)
            gx = jax.jit(jax.grad(
                lambda xx, ct, _c=conv, _v=variables: jnp.sum(
                    _c.apply(_v, xx).astype(jnp.float32) * ct)))
            gp = jax.jit(jax.grad(
                lambda xx, ct, _k=k, _b=b: jnp.sum(
                    depthwise_conv3_pallas_ad(xx, _k, _b).astype(jnp.float32)
                    * ct)))
            dref = gx(x, cot)
            derr = float(_maxdiff(dref, gp(x, cot)))
            dscale = float(jnp.max(jnp.abs(dref)).astype(jnp.float32)) + 1e-6
            if derr > 0.1 * dscale:
                detail[f"c{c}_reject"] = f"grad parity err={derr:.3f}"
                continue

            t_x, t_p = _t(xla_fn, x), _t(pl_fn, x)
            detail[f"c{c}_xla_ms"] = round(t_x * 1e3, 2)
            detail[f"c{c}_pallas_ms"] = round(t_p * 1e3, 2)
            if t_p < t_x:
                detail["enabled"].append(int(c))
                _VALIDATED_WIDTHS[int(c)] = True
                saved_ms += (t_x - t_p) * 1e3
        except Exception as e:  # noqa: BLE001 - per-width isolation
            detail[f"c{c}_error"] = f"{type(e).__name__}: {e}"[:160]

    detail["path"] = "pallas" if detail["enabled"] else "xla"
    if detail["enabled"]:
        detail["saved_ms_per_step"] = round(saved_ms, 1)

    _AUTOTUNE_MEMO[key] = detail
    # persist only fully-resolved decisions: a width that ERRORED (vs a
    # deterministic parity rejection) may be a transient condition (HBM
    # pressure during autotune) that should re-measure in a fresh process
    if not any(k2.endswith("_error") for k2 in detail):
        try:
            os.makedirs(os.path.dirname(_CACHE_FILE), exist_ok=True)
            try:
                with open(_CACHE_FILE) as f:
                    all_entries = json.load(f)
            except (OSError, ValueError):
                all_entries = {}
            all_entries[key] = detail
            tmp = _CACHE_FILE + ".tmp"
            with open(tmp, "w") as f:
                json.dump(all_entries, f, indent=1)
            os.replace(tmp, _CACHE_FILE)
        except OSError:
            pass
    return detail
