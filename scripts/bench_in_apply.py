"""Is the InstanceNorm apply (+relu) really 5x above the HBM floor?

The model-step trace shows multiply_maximum fusions (the bf16 IN apply:
``max((x - mean) * scale, 0)`` broadcast over spatial dims) at ~3.3 ms
for a (8,64,64,64,128) bf16 tensor whose in+out traffic floor is
~0.65 ms on v5e.  This measures, with the dispatch-amortized chained
loop: (a) XLA's standalone apply, (b) a minimal Pallas row-block apply.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_in_apply.py
"""

import functools
import time

import numpy as np


def chain_time(fn, x, m, s, iters=3, K=16):
    import jax
    from jax import lax

    def f(v):
        return lax.fori_loop(0, K, lambda i, a: fn(a, m, s), v)

    jf = jax.jit(f)
    out = jf(x)
    jax.block_until_ready(out)
    _ = np.asarray(out.ravel()[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = jf(x)
        jax.block_until_ready(out)
        _ = np.asarray(out.ravel()[0])
        best = min(best, time.time() - t0)
    return best / K * 1e3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)

    for C in (64, 128, 256, 512):
        B, S = 8, 64
        x = jnp.asarray(rng.standard_normal((B, S, S, S, C), np.float32),
                        jnp.bfloat16)
        m = jnp.asarray(rng.standard_normal((B, 1, 1, 1, C), np.float32),
                        jnp.bfloat16)
        s = jnp.asarray(rng.standard_normal((B, 1, 1, 1, C), np.float32),
                        jnp.bfloat16)

        def xla_apply(v, m, s):
            return jnp.maximum((v - m) * s, 0)

        t_x = chain_time(xla_apply, x, m, s)

        # Pallas: block over (B, D) rows; channel on lanes, W on sublanes
        from jax.experimental import pallas as pl

        def kernel(x_ref, m_ref, s_ref, o_ref):
            v = x_ref[...]
            mm = m_ref[...]
            ss = s_ref[...]
            o_ref[...] = jnp.maximum((v - mm) * ss, 0)

        blk_d = max(1, 128 // C)  # ~1 MB bf16 blocks (lane padding doubles C<128)

        @jax.jit
        def pallas_apply(v, m, s):
            return pl.pallas_call(
                kernel,
                grid=(B, S // blk_d),
                in_specs=[
                    pl.BlockSpec((1, blk_d, S, S, C),
                                 lambda b, d: (b, d, 0, 0, 0)),
                    pl.BlockSpec((1, 1, 1, 1, C), lambda b, d: (b, 0, 0, 0, 0)),
                    pl.BlockSpec((1, 1, 1, 1, C), lambda b, d: (b, 0, 0, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, blk_d, S, S, C),
                                       lambda b, d: (b, d, 0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, S, S, S, C), v.dtype),
            )(v, m, s)

        def pl_fn(v, m, s):
            return pallas_apply(v, m, s)

        d = float(jnp.max(jnp.abs(
            xla_apply(x, m, s).astype(jnp.float32)
            - pl_fn(x, m, s).astype(jnp.float32))))
        t_p = chain_time(pl_fn, x, m, s)
        floor = 2 * x.size * 2 / 819e9 * 1e3
        print(f"C={C:3d}  xla {t_x:6.3f} ms   pallas {t_p:6.3f} ms   "
              f"floor {floor:5.2f} ms   maxdiff {d}")


if __name__ == "__main__":
    main()
