"""Distill the AD-elementwise Pallas kernel compile-helper crash (round-5).

bisect_train_wino.py found all three AD elementwise kernels
(_in_apply_ad_T, _in_bwd_stats_T, _in_bwd_apply_T) crash the remote
tpu_compile_helper standalone, while the structurally heavier wino conv
kernel compiles in both directions.  The production _in_apply_T (one
output, aliased, 2-dim grid) compiles and runs in the inference path.

This script compiles single-feature variants between the working and
crashing kernels to attribute the feature that kills the helper:

  base        _in_apply_T shape: 1 big input + (2,R,C) stats, ONE output,
              alias {0:0}, grid (C/128, D), full-h blocks     [expect OK]
  noalias     base without the alias
  twoout      base + a second big output (no alias)
  twoout_al   base + second output + alias {0:0}              [= applyad]
  ms3         base with a (3,R,C) stats operand               [~ bwdapply]
  twoin       base + a second big INPUT (dy), still one output
  hblk        base with a 3-dim grid (C/128, D, H/8), h_blk=8 blocks
  accum3      3-dim grid + revisited (B,2,C) accumulator      [~ bwdstats]

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/distill_ew_crash.py [variant...]
"""

import functools
import sys
import time

import numpy as np

D, H, R, C = 64, 64, 512, 128
B_SZ = 8


def build(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    big = pl.BlockSpec((1, H, R, C), lambda c, t: (t, 0, 0, c),
                       memory_space=pltpu.VMEM)
    ms2 = pl.BlockSpec((2, R, C), lambda c, t: (0, 0, c),
                       memory_space=pltpu.VMEM)
    out_sh = jax.ShapeDtypeStruct((D, H, R, C), jnp.bfloat16)
    cp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"),
        vmem_limit_bytes=64 << 20)

    def k1(x_ref, ms_ref, y_ref):
        m = ms_ref[0].astype(x_ref.dtype)
        s = ms_ref[1].astype(x_ref.dtype)
        y_ref[...] = jax.nn.relu((x_ref[...] - m[None]) * s[None])

    if variant in ("base", "noalias"):
        return pl.pallas_call(
            k1, grid=(1, D), in_specs=[big, ms2], out_specs=big,
            out_shape=out_sh,
            input_output_aliases={0: 0} if variant == "base" else {},
            compiler_params=cp)

    if variant in ("twoout", "twoout_al"):
        def k2(x_ref, ms_ref, y_ref, z_ref):
            m = ms_ref[0].astype(x_ref.dtype)
            s = ms_ref[1].astype(x_ref.dtype)
            xh = (x_ref[...] - m[None]) * s[None]
            z_ref[...] = xh
            y_ref[...] = jax.nn.relu(xh)

        return pl.pallas_call(
            k2, grid=(1, D), in_specs=[big, ms2], out_specs=[big, big],
            out_shape=[out_sh, out_sh],
            input_output_aliases={0: 0} if variant == "twoout_al" else {},
            compiler_params=cp)

    if variant == "ms3":
        ms3 = pl.BlockSpec((3, R, C), lambda c, t: (0, 0, c),
                           memory_space=pltpu.VMEM)

        def k3(x_ref, ms_ref, y_ref):
            m = ms_ref[0].astype(x_ref.dtype)
            s = ms_ref[1].astype(x_ref.dtype)
            t2 = ms_ref[2].astype(x_ref.dtype)
            y_ref[...] = (x_ref[...] - m[None]) * s[None] + t2[None]

        return pl.pallas_call(
            k3, grid=(1, D), in_specs=[big, ms3], out_specs=big,
            out_shape=out_sh, compiler_params=cp)

    if variant == "twoin":
        def k4(x_ref, dy_ref, ms_ref, y_ref):
            m = ms_ref[0].astype(x_ref.dtype)
            s = ms_ref[1].astype(x_ref.dtype)
            g = jnp.where(x_ref[...] > 0, dy_ref[...], 0)
            y_ref[...] = (g - m[None]) * s[None]

        return pl.pallas_call(
            k4, grid=(1, D), in_specs=[big, big, ms2], out_specs=big,
            out_shape=out_sh, compiler_params=cp)

    if variant in ("twoin_al", "twoin_hblk"):
        def k4b(x_ref, dy_ref, ms_ref, y_ref):
            m = ms_ref[0].astype(x_ref.dtype)
            s = ms_ref[1].astype(x_ref.dtype)
            g = jnp.where(x_ref[...] > 0, dy_ref[...], 0)
            y_ref[...] = (g - m[None]) * s[None]

        if variant == "twoin_al":
            return pl.pallas_call(
                k4b, grid=(1, D), in_specs=[big, big, ms2], out_specs=big,
                out_shape=out_sh, input_output_aliases={1: 0},
                compiler_params=cp)
        hb = 8
        bigb = pl.BlockSpec((1, hb, R, C), lambda c, t, h: (t, h, 0, c),
                            memory_space=pltpu.VMEM)
        msb = pl.BlockSpec((2, R, C), lambda c, t, h: (0, 0, c),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            k4b, grid=(1, D, H // hb), in_specs=[bigb, bigb, msb],
            out_specs=bigb, out_shape=out_sh,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) * 3,
                vmem_limit_bytes=64 << 20))

    if variant == "hblk":
        hb = 8
        bigb = pl.BlockSpec((1, hb, R, C), lambda c, t, h: (t, h, 0, c),
                            memory_space=pltpu.VMEM)
        msb = pl.BlockSpec((2, R, C), lambda c, t, h: (0, 0, c),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            k1, grid=(1, D, H // hb), in_specs=[bigb, msb],
            out_specs=bigb, out_shape=out_sh,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) * 3,
                vmem_limit_bytes=64 << 20))

    if variant == "accum3":
        hb = 8

        def k5(x_ref, dy_ref, st_ref):
            t = pl.program_id(1)
            h = pl.program_id(2)

            @pl.when((t == 0) & (h == 0))
            def _init():
                st_ref[...] = jnp.zeros_like(st_ref)

            g = jnp.where(x_ref[0] > 0, dy_ref[0], 0).astype(jnp.float32)
            n = hb * R
            gf = g.reshape(n, C)
            rows = jax.lax.broadcasted_iota(jnp.int32, (B_SZ, n), 1) % B_SZ
            bids = jax.lax.broadcasted_iota(jnp.int32, (B_SZ, n), 0)
            sel = (rows == bids).astype(jnp.float32)
            st_ref[:, 0] += jnp.dot(sel, gf,
                                    preferred_element_type=jnp.float32)
            st_ref[:, 1] += jnp.dot(sel, gf * gf,
                                    preferred_element_type=jnp.float32)

        bigb = pl.BlockSpec((1, hb, R, C), lambda c, t, h: (t, h, 0, c),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            k5, grid=(1, D, H // hb), in_specs=[bigb, bigb],
            out_specs=pl.BlockSpec((B_SZ, 2, C),
                                   lambda c, t, h: (0, 0, c),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B_SZ, 2, C), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * 3,
                vmem_limit_bytes=64 << 20))

    raise ValueError(variant)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((D, H, R, C)), jnp.bfloat16)
    ms2 = jnp.asarray(rng.standard_normal((2, R, C)), jnp.float32)
    ms3 = jnp.asarray(rng.standard_normal((3, R, C)), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((D, H, R, C)), jnp.bfloat16)

    variants = sys.argv[1:] or ["base", "noalias", "twoout", "twoout_al",
                                "ms3", "twoin", "twoin_al", "twoin_hblk",
                                "hblk", "accum3"]
    for v in variants:
        try:
            fn = jax.jit(build(v))
            args = {"ms3": (x, ms3), "twoin": (x, dy, ms2),
                    "twoin_al": (x, dy, ms2), "twoin_hblk": (x, dy, ms2),
                    "accum3": (x, dy)}.get(v, (x, ms2))
            t0 = time.time()
            out = fn(*args)
            jax.block_until_ready(out)
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = np.asarray(leaf.ravel()[0])
            print(f"{v:10s} OK  compile {time.time() - t0:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{v:10s} CRASH {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
