"""Probe the per-dispatch / per-transfer overhead on the tunneled TPU.

The engine loop at batch 8 over a 256-cube map issues ~27 x (2 scalar
uploads + 3 program dispatches); BENCH_r01 shows ~1.3 s/map of loop
overhead on top of device time.  This measures each suspect in isolation.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    x = jnp.ones((128, 128), jnp.float32)

    @jax.jit
    def tiny(a):
        return a + 1.0

    r = tiny(x)
    jax.block_until_ready(r)

    # (a) dispatch latency, fully serialized (block each call)
    t0 = time.time()
    for _ in range(50):
        r = tiny(r)
        jax.block_until_ready(r)
    t_sync = (time.time() - t0) / 50

    # (b) dispatch throughput, async chain (block once at the end)
    t0 = time.time()
    for _ in range(200):
        r = tiny(r)
    jax.block_until_ready(r)
    _ = np.asarray(r[0, 0])
    t_async = (time.time() - t0) / 200

    # (c) scalar host->device upload cost (the loop's jnp.int32(n_valid))
    t0 = time.time()
    for i in range(100):
        s = jnp.int32(i)
    jax.block_until_ready(s)
    t_scalar = (time.time() - t0) / 100

    # (d) python-int-arg dispatch (the loop's `ofs` argument)
    @jax.jit
    def tiny2(a, ofs):
        return a + ofs

    r = tiny2(x, 3)
    jax.block_until_ready(r)
    t0 = time.time()
    for i in range(100):
        r = tiny2(r, i)
    jax.block_until_ready(r)
    _ = np.asarray(r[0, 0])
    t_intarg = (time.time() - t0) / 100

    # (e) small (8,3) int32 upload (a per-chunk starts slice)
    t0 = time.time()
    for i in range(100):
        s = jnp.asarray(np.full((8, 3), i, np.int32))
    jax.block_until_ready(s)
    t_small = (time.time() - t0) / 100

    print(f"dispatch+sync        : {t_sync*1e3:8.3f} ms")
    print(f"dispatch async       : {t_async*1e3:8.3f} ms")
    print(f"scalar upload        : {t_scalar*1e3:8.3f} ms")
    print(f"python-int-arg call  : {t_intarg*1e3:8.3f} ms")
    print(f"(8,3) int32 upload   : {t_small*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
