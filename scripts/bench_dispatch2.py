"""Second-pass dispatch probe: per-op slope of async chains on axon.

bench_dispatch.py measured a bizarre ~1 s/op for async tiny-op chains;
this isolates whether that is a real per-op overhead (slope) or a fixed
confound, and whether it also applies to medium ops and realistic
gather/model/scatter-like sequences.
"""

import time

import numpy as np


def force(r):
    import jax

    jax.block_until_ready(r)
    return np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    x = jnp.ones((128, 128), jnp.float32)

    @jax.jit
    def tiny(a):
        return a + 1.0

    force(tiny(x))

    for n in (5, 20, 80):
        r = x
        t0 = time.time()
        for _ in range(n):
            r = tiny(r)
        force(r)
        dt = time.time() - t0
        print(f"tiny chain n={n:3d}: total {dt:7.3f} s  ({dt/n*1e3:7.2f} ms/op)")

    # medium op: 128 MB bf16 matmul-ish, ~2 ms device time
    m = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def med(a):
        return a @ a

    force(med(m))
    for n in (3, 10, 30):
        r = m
        t0 = time.time()
        for _ in range(n):
            r = med(r)
        force(r)
        dt = time.time() - t0
        print(f"med  chain n={n:3d}: total {dt:7.3f} s  ({dt/n*1e3:7.2f} ms/op)")

    # independent (non-chained) dispatches: does dependency matter?
    t0 = time.time()
    outs = [tiny(x) for _ in range(80)]
    force(outs[-1])
    jax.block_until_ready(outs)
    _ = np.asarray(outs[0].ravel()[0])
    dt = time.time() - t0
    print(f"tiny indep n=80: total {dt:7.3f} s  ({dt/80*1e3:7.2f} ms/op)")


if __name__ == "__main__":
    main()
