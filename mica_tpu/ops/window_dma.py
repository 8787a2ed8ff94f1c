"""DMA window gather/scatter kernels for the sliding-window engine.

The engine's three-program loop (gather -> model -> scatter,
infer/engine.py) serializes on the single TPU core: programs never
overlap, so the gather and scatter device time is pure addition to the
model time.  Measured on v5e (scripts/bench_gather_scatter.py,
scripts/bench_scatter_variants.py), the XLA formulations cost ~51 ms
(gather: 128 unrolled ``dynamic_slice``s) and ~106-123 ms (scatter: a
64-step ``lax.scan`` of read-modify-write ``dynamic_update_slice``s)
per 64-window dispatch as fenced micro-timings.  (Later diagnosis
showed those fenced numbers carry a ~46 ms tunnel round-trip floor —
PERFORMANCE.md "final hardware A/Bs" — so the true device cost is the
smaller loop-minus-model-chain residual, ~0.15-0.3 s per dense map.)
Every XLA-level reformulation measured (staged contiguous slicing,
block-layout staging, fused 22-channel updates, bitcast-packed
volumes) was flat or worse.

These kernels instead drive the DMA engines directly: window starts are
scalar-prefetched into SMEM, and each grid step issues async HBM->HBM
copies of one window (strided 3-D slices at dynamic offsets — exactly
what the DMA hardware does at line rate).  No compute, no VMEM staging,
no masking reads:

  * gather: window i copies ``padded[s_i : s_i+64]^3`` (density f32 and
    bit-packed AF uint32) into row i of the stacked output.
  * scatter: window i copies its three core blocks into the accumulator
    volumes at ``s_i`` (in-place via input/output aliasing).  Tail
    padding and uncomputed batches are skipped with ``pl.when`` on a
    scalar-prefetched ``n_valid`` — windows are only ever written with
    real data, so no read-modify-write masking is needed (replacing the
    reference's host-side paste loop, predict.py:496-501).

Cores never overlap (48-voxel stride tiles the volume exactly) and
duplicate tail starts are skipped, so the copies are race-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_windows_dma", "scatter_cores_dma"]


def gather_windows_dma(padded_map, padded_af, starts, *, window: int,
                       interpret: bool = False):
    """Gather ``n`` density (+ optional packed-AF) windows by DMA.

    padded_map: (X, Y, Z) f32; padded_af: (X, Y, Z) uint32 or None;
    starts: (n, 3) int32 window origins (in the padded frame).
    Returns (n, w, w, w) f32 [, (n, w, w, w) uint32].
    """
    n = starts.shape[0]
    w = int(window)
    with_af = padded_af is not None

    def kernel(starts_ref, *refs):
        if with_af:
            map_ref, af_ref, wins_ref, afs_ref, sem = refs
        else:
            map_ref, wins_ref, sem = refs
            af_ref = afs_ref = None
        i = pl.program_id(0)
        x0 = starts_ref[i, 0]
        y0 = starts_ref[i, 1]
        z0 = starts_ref[i, 2]
        sl = (pl.ds(x0, w), pl.ds(y0, w), pl.ds(z0, w))
        cp = pltpu.make_async_copy(map_ref.at[sl], wins_ref.at[i],
                                   sem.at[0])
        cp.start()
        if with_af:
            cpa = pltpu.make_async_copy(af_ref.at[sl], afs_ref.at[i],
                                        sem.at[1])
            cpa.start()
            cpa.wait()
        cp.wait()

    out_shape = [jax.ShapeDtypeStruct((n, w, w, w), padded_map.dtype)]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if with_af:
        out_shape.append(jax.ShapeDtypeStruct((n, w, w, w),
                                              padded_af.dtype))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(out_shape),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    fn = pl.pallas_call(kernel, grid_spec=grid_spec,
                        out_shape=out_shape, interpret=interpret)
    if with_af:
        wins, afs = fn(starts, padded_map, padded_af)
        return wins, afs
    (wins,) = fn(starts, padded_map)
    return wins


def scatter_cores_dma(vols, cores, starts, n_valid, *, core: int,
                      interpret: bool = False):
    """Paste ``n`` core blocks into the accumulator volumes by DMA.

    vols: (bb (X,Y,Z) f32, ca (X,Y,Z) f32, aa (X,Y,Z,A) f32) — updated
    in place (input/output aliased; pass donated buffers).
    cores: (bb (n,c,c,c), ca (n,c,c,c), aa (n,c,c,c,A)) f32.
    starts: (n, 3) int32 core origins; entries at index >= n_valid are
    skipped entirely (tail padding / uncomputed batches).
    """
    bb_v, ca_v, aa_v = vols
    bb_c, ca_c, aa_c = cores
    n = starts.shape[0]
    c = int(core)
    n_aa = aa_v.shape[-1]
    nv = jnp.full((1,), n_valid, jnp.int32)

    def kernel(starts_ref, nv_ref, bb_ci, ca_ci, aa_ci,
               bb_vi, ca_vi, aa_vi, bb_vo, ca_vo, aa_vo, sem):
        del bb_vi, ca_vi, aa_vi  # aliased with the outputs
        i = pl.program_id(0)

        @pl.when(i < nv_ref[0])
        def _():
            x0 = starts_ref[i, 0]
            y0 = starts_ref[i, 1]
            z0 = starts_ref[i, 2]
            sl = (pl.ds(x0, c), pl.ds(y0, c), pl.ds(z0, c))
            cp0 = pltpu.make_async_copy(bb_ci.at[i], bb_vo.at[sl],
                                        sem.at[0])
            cp1 = pltpu.make_async_copy(ca_ci.at[i], ca_vo.at[sl],
                                        sem.at[1])
            cp2 = pltpu.make_async_copy(
                aa_ci.at[i], aa_vo.at[sl + (pl.ds(0, n_aa),)], sem.at[2])
            cp0.start()
            cp1.start()
            cp2.start()
            cp0.wait()
            cp1.wait()
            cp2.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        scratch_shapes=[pltpu.SemaphoreType.DMA((3,))],
    )
    # inputs (after the 2 scalar-prefetch args): bb_c ca_c aa_c bb_v ca_v
    # aa_v at flat indices 2..7; alias the volume inputs to the outputs
    fn = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(v.shape, v.dtype)
                   for v in (bb_v, ca_v, aa_v)],
        input_output_aliases={5: 0, 6: 1, 7: 2},
        interpret=interpret,
    )
    return fn(starts, nv, bb_c, ca_c, aa_c, bb_v, ca_v, aa_v)
