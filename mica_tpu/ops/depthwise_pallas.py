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
    # the volume ends (SAME padding in z)
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
            rows = slab[dz:dz + dblk, dy:dy + h]
            t0, t1, t2 = (k_ref[dz * 9 + dy * 3 + dx] for dx in range(3))
            acc += rows.astype(jnp.float32) * t1
            left = jnp.where(first, 0.0,
                             pltpu.roll(rows, 1, 2).astype(jnp.float32))
            acc += left * t0
            right = jnp.where(last, 0.0,
                              pltpu.roll(rows, w - 1, 2).astype(jnp.float32))
            acc += right * t2
    out_ref[0] = acc.astype(out_ref.dtype)


def _z_blocking(shape, dtype, d_block: int = 0):
    """Adaptive z-block size plus the shared BlockSpecs: the main
    (1, d_block, H, W, C) block and the two clamped single-row z-halo
    views (kernel-masked at the volume edges).  ``d_block`` 0 picks the
    largest divisor of D keeping one input block <= ~4 MB, so the
    double-buffered in/out blocks + the f32 accumulator stay well inside
    v5e's VMEM at every stage width."""
    _, d, h, w, c = shape
    if d_block <= 0:
        row_bytes = h * w * c * dtype.itemsize
        d_block = max(1, (4 << 20) // row_bytes)
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
_CACHE_FILE = os.path.join(os.path.expanduser("~"), ".cache", "mica_tpu",
                           "dw_autotune.json")


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


def pick_depthwise_path(widths=(64, 128, 256), batch: int = 8,
                        spatial: int = 64, set_env: bool = True) -> dict:
    """A/B this kernel against XLA's grouped conv on the live backend and
    (by default) publish the decision via ``MICA_PALLAS_DW`` — the env var
    the model gate (models/mica.py DualAttention) reads at trace time.

    The Pallas path is chosen only if the forward is faster in aggregate
    over the given channel widths AND the full output tensor matches XLA
    to bf16 tolerance at each one AND the custom-VJP backward compiles
    and matches XLA autodiff (publishing the env var flips training onto
    the backward programs too, so they must be proven on this platform).
    Decisions are memoized per process and cached on disk keyed by device
    kind + shape + a code fingerprint, so a CLI run pays the measurement
    once per platform.  Exception-safe: any compile/runtime failure
    selects the XLA path.  Measurement shapes are capped at batch 8 /
    64-cubes: decision-grade and bounded host memory.
    """
    import time

    import numpy as np

    batch = min(int(batch), 8)
    spatial = min(int(spatial), 64)
    key = None
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
        key = (f"{kind}|b{batch}|s{spatial}|w{','.join(map(str, widths))}"
               f"|{_code_fingerprint()}")
        cached = _AUTOTUNE_MEMO.get(key)
        if cached is None:
            try:
                with open(_CACHE_FILE) as f:
                    cached = json.load(f).get(key)
            except (OSError, ValueError):
                cached = None
        if cached is not None:
            _AUTOTUNE_MEMO[key] = cached
            if set_env and cached.get("path") == "pallas":
                os.environ["MICA_PALLAS_DW"] = "1"
            return dict(cached, cache_hit=True)

        import flax.linen as nn

        rng = np.random.default_rng(1)
        detail: dict = {"autotuned": True}
        total_xla = total_pallas = 0.0
        shape = (batch, spatial, spatial, spatial)

        @jax.jit
        def _maxdiff(a, bb):  # full-tensor parity on device (covers every
            return jnp.max(jnp.abs(a.astype(jnp.float32)  # z-block seam)
                                   - bb.astype(jnp.float32)))

        for c in widths:
            x = jnp.asarray(
                rng.standard_normal(shape + (c,), dtype=np.float32),
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
                detail.update(path="xla", reject=f"parity C={c} err={err:.3f}")
                break

            # the backward must also compile and agree before training can
            # be flipped onto it (publishing env=1 gates train paths too)
            cot = jnp.asarray(
                rng.standard_normal(shape + (c,), dtype=np.float32),
                jnp.bfloat16)
            gx = jax.jit(jax.grad(
                lambda xx, _c=conv, _v=variables: jnp.sum(
                    _c.apply(_v, xx).astype(jnp.float32) * cot)))
            gp = jax.jit(jax.grad(
                lambda xx, _k=k, _b=b: jnp.sum(
                    depthwise_conv3_pallas_ad(xx, _k, _b).astype(jnp.float32)
                    * cot)))
            dref = gx(x)
            derr = float(_maxdiff(dref, gp(x)))
            dscale = float(jnp.max(jnp.abs(dref)).astype(jnp.float32)) + 1e-6
            if derr > 0.1 * dscale:
                detail.update(path="xla",
                              reject=f"grad parity C={c} err={derr:.3f}")
                break

            def _t(fn, xx, reps=6):
                out = fn(xx)
                _ = np.asarray(out[0, 0, 0, 0, 0])  # forced readback
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = fn(xx)
                _ = np.asarray(out[0, 0, 0, 0, 0])
                return (time.perf_counter() - t0) / reps

            t_x, t_p = _t(xla_fn, x), _t(pl_fn, x)
            detail[f"c{c}_xla_ms"] = round(t_x * 1e3, 2)
            detail[f"c{c}_pallas_ms"] = round(t_p * 1e3, 2)
            total_xla += t_x
            total_pallas += t_p
        else:
            if total_pallas < total_xla:
                detail["path"] = "pallas"
                detail["saved_ms_per_step"] = round(
                    (total_xla - total_pallas) * 1e3, 1)
            else:
                detail["path"] = "xla"
    except Exception as e:  # noqa: BLE001 - selection must never fail
        detail = {"path": "xla", "autotuned": True,
                  "error": f"{type(e).__name__}: {e}"[:200]}
        if key is not None:  # don't re-pay a failing compile per predictor,
            _AUTOTUNE_MEMO[key] = detail  # but keep errors off the disk cache
        return detail

    _AUTOTUNE_MEMO[key] = detail
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
    if set_env and detail.get("path") == "pallas":
        os.environ["MICA_PALLAS_DW"] = "1"
    return detail
