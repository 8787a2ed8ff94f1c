"""Pallas TPU kernel for the multi-scale input stem.

The stem is four Cin=1 convs (k = 3/5/7/9) over a 64-cube window
(reference model.py:9-14).  XLA's generic conv path runs this at ~1.4% MXU
(single-channel contraction starves the systolic array); the patch-matmul
reformulation in ops/conv_fast.py reaches ~4% but still streams ~6 GB of
patch tensors plus ~19 GB of f32 accumulator traffic through HBM per
batch-8 call (measured 104 ms).

This kernel fuses patch construction and the contraction in VMEM: each
grid program (one z-slab of one sample) DMAs its (9, H+8, W+8) input slab
from HBM once, builds the (H*W, 81) patch matrix per dz tap on-chip, and
accumulates nine (H*W, 81) x (81, C) MXU matmuls into a local f32
accumulator — HBM sees only the input slab once and the output block once.

Inference-only path (no custom VJP): the model falls back to the XLA
formulation under training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 9  # largest stem kernel; smaller kernels are zero-embedded into 9-cubes
HALF = K // 2


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _kernel(x_hbm, w_ref, b_ref, out_ref, *, h: int, w: int, w_pad: int):
    b = pl.program_id(0)
    d = pl.program_id(1)
    c = out_ref.shape[-1]

    def body(slab, sem):
        dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(d, K)], slab, sem)
        dma.start()
        dma.wait()

        acc = jnp.zeros((h * w, c), jnp.float32)
        for dz in range(K):
            # f32 slab: Mosaic's minor-dim insertion (the stack below) and
            # the 8-sublane tiling both require 32-bit here
            plane = slab[dz]  # (h + 8, w_pad)
            cols = []
            for dy in range(K):
                sub = plane[dy : dy + h]  # (h, w_pad)
                for dx in range(K):
                    cols.append(sub[:, dx : dx + w])
            patch = jnp.stack(cols, axis=-1).reshape(h * w, K * K)
            acc = acc + jnp.dot(
                patch.astype(w_ref.dtype), w_ref[dz],
                preferred_element_type=jnp.float32,
            )
        out_ref[0, 0] = (acc + b_ref[0].astype(jnp.float32)).astype(
            out_ref.dtype
        )

    pl.run_scoped(
        body,
        pltpu.VMEM((K, h + 2 * HALF, w_pad), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def stem_conv_pallas(
    x: jnp.ndarray,           # (B, D, H, W) single-channel input
    combined_w: jnp.ndarray,  # (9, 81, C) — all four kernels zero-embedded
    bias: jnp.ndarray,        # (C,)
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, D, H, W, C) — concatenated multi-scale stem features."""
    b, d, h, w = x.shape
    c = combined_w.shape[-1]
    # sliced HBM->VMEM DMA requires the last dim 128-aligned (and f32 for
    # the in-kernel minor-dim stack); the extra columns are never read
    w_pad = _round_up(w + 2 * HALF, 128)
    xp = jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (HALF, HALF), (HALF, HALF), (HALF, w_pad - w - HALF)),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, w_pad=w_pad),
        grid=(b, d),
        in_specs=[
            # keep the padded input in HBM (manual sliced DMA per program;
            # with ANY the compiler may place it in VMEM, where Mosaic
            # cannot lower the dynamic slice)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h * w, c), lambda bi, di: (bi, di, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, h * w, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(96 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * h * w * K * K * K * c,
            bytes_accessed=x.size * x.dtype.itemsize
            + b * d * h * w * c * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, combined_w, bias.reshape(1, c))
    return out.reshape(b, d, h, w, c)
