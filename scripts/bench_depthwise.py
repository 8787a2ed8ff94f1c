"""A/B the depthwise 3x3x3 conv formulations on the real TPU.

Compares, at the network's three DualAttention shapes (batch 8, 64-cube,
bf16, C = 64/128/256):
  * XLA grouped conv (current production path)
  * Pallas VPU kernel (ops/depthwise_pallas.py)
  * dense diagonal-expanded conv (ops/conv_fast.depthwise_conv3_dense)

Forced-completion timings (1-element readback). Run:
    PYTHONPATH=/root/repo python -u scripts/bench_depthwise.py
"""

import time

import numpy as np


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _ = np.asarray(out[(0,) * out.ndim])  # force
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = np.asarray(out[(0,) * out.ndim])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    import sys

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import flax.linen as nn

    from mica_tpu.ops.conv_fast import depthwise_conv3_dense
    from mica_tpu.ops.depthwise_pallas import (depthwise_conv3_pallas,
                                               depthwise_conv3_pallas_ad)

    bench_grads = "--grads" in sys.argv
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    B, S = 8, 64
    for C in (64, 128, 256):
        x = jnp.asarray(rng.normal(size=(B, S, S, S, C)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, 3, 1, C)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(C,)), jnp.float32)

        conv = nn.Conv(features=C, kernel_size=(3,) * 3, padding="SAME",
                       feature_group_count=C, dtype=jnp.bfloat16,
                       param_dtype=jnp.float32)
        variables = {"params": {"kernel": k, "bias": b}}
        xla_grouped = jax.jit(lambda xx: conv.apply(variables, xx))

        pallas = jax.jit(lambda xx: depthwise_conv3_pallas(xx, k, b))
        dense = jax.jit(lambda xx: depthwise_conv3_dense(xx, k, b))

        t_x = timeit(xla_grouped, x)
        t_p = timeit(pallas, x)
        results = {"xla_grouped": t_x, "pallas": t_p}
        if C <= 128:  # dense burns C*flops; skip the 256 variant
            results["dense_diag"] = timeit(dense, x)

        # parity spot check (bf16 tolerance)
        ref = np.asarray(xla_grouped(x), np.float32)
        got = np.asarray(pallas(x), np.float32)
        err = float(np.max(np.abs(ref - got)))
        hbm_ms = (2 * x.size * 2) / 819e9 * 1e3  # in+out @ ~819 GB/s
        line = " ".join(f"{k2}={v * 1e3:7.2f}ms" for k2, v in results.items())
        print(f"C={C:4d} {line}  speedup={t_x / t_p:4.2f}x "
              f"hbm_floor={hbm_ms:5.2f}ms maxerr={err:.3f}")

        if bench_grads:
            # full VJP cost (dx + dk + db), both formulations
            def loss_xla(xx, vv):
                return jnp.sum(conv.apply(vv, xx).astype(jnp.float32) ** 2)

            def loss_pl(xx, kk, bb):
                return jnp.sum(depthwise_conv3_pallas_ad(
                    xx, kk, bb).astype(jnp.float32) ** 2)

            gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))
            gp = jax.jit(jax.grad(loss_pl, argnums=(0, 1, 2)))
            tg_x = timeit(lambda xx: gx(xx, variables)[0], x)
            tg_p = timeit(lambda xx: gp(xx, k, b)[0], x)
            print(f"C={C:4d} grads: xla={tg_x * 1e3:7.2f}ms "
                  f"pallas={tg_p * 1e3:7.2f}ms speedup={tg_x / tg_p:4.2f}x")


if __name__ == "__main__":
    main()
