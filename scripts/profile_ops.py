"""Per-op TPU microbenchmarks for the MICA hot path.

Times candidate formulations of the network's low-MXU ops (stem, depthwise,
task heads) with the forced-readback harness (PERFORMANCE.md).  Run on the
real chip:  python scripts/profile_ops.py [section ...]
"""

import sys
import time

import numpy as np


def timeit(fn, *args, iters=5, warmup=2):
    import jax

    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    leaf = jax.tree_util.tree_leaves(r)[0]
    _ = np.asarray(leaf.reshape(-1)[0])
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
    return (time.time() - t0) / iters


def main(sections):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mica_tpu.ops import conv_fast as cf

    rng = np.random.default_rng(0)
    B, D = 8, 64
    dt = jnp.bfloat16

    if "stem" in sections:
        x = jnp.asarray(rng.standard_normal((B, D, D, D, 1)), dt)
        kernels = [
            jnp.asarray(rng.standard_normal((k, k, k, 1, 32)) * 0.1, jnp.float32)
            for k in (3, 5, 7, 9)
        ]
        biases = [jnp.zeros(32, jnp.float32) for _ in range(4)]

        old = jax.jit(lambda x: cf.multiscale_stem_conv(x, kernels, biases,
                                                        allow_pallas=False))
        t = timeit(old, x)
        print(f"stem old (patch matmul): {t*1e3:.1f} ms")
        for s in (2, 4):
            f = jax.jit(lambda x, s=s: cf.multiscale_stem_conv_s2d(x, kernels, biases, s=s))
            t = timeit(f, x)
            print(f"stem s2d s={s}: {t*1e3:.1f} ms")
            ref = old(x)
            got = f(x)
            print(f"   maxdiff vs old: {float(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max()):.5f}")

    if "dw" in sections:
        for C in (64, 128, 256):
            xd = jnp.asarray(rng.standard_normal((B, D, D, D, C)), dt)
            k = jnp.asarray(rng.standard_normal((3, 3, 3, 1, C)) * 0.2, jnp.float32)
            bias = jnp.zeros(C, jnp.float32)

            def grouped(x):
                return jax.lax.conv_general_dilated(
                    x, jnp.repeat(k.astype(dt), 1, axis=3), (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    feature_group_count=C,
                    preferred_element_type=jnp.float32,
                ).astype(dt)

            t = timeit(jax.jit(grouped), xd)
            print(f"dw C={C} XLA grouped: {t*1e3:.1f} ms")
            t = timeit(jax.jit(lambda x: cf.depthwise_conv3_dense(x, k, bias)), xd)
            print(f"dw C={C} dense-expanded: {t*1e3:.1f} ms")
            t = timeit(jax.jit(lambda x: cf.depthwise_conv3(x, k, bias)), xd)
            print(f"dw C={C} shifted-FMA: {t*1e3:.1f} ms")

    if "head" in sections:
        # three 3^3 convs 192->64 separately vs one fused 192->192
        xin = jnp.asarray(rng.standard_normal((B, D, D, D, 192)), dt)
        ks = [jnp.asarray(rng.standard_normal((3, 3, 3, 192, 64)) * 0.05, dt)
              for _ in range(3)]
        kf = jnp.concatenate(ks, axis=-1)

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32).astype(dt)

        t = timeit(jax.jit(lambda x: [conv(x, k) for k in ks]), xin)
        print(f"head conv1 3 separate 192->64: {t*1e3:.1f} ms")
        t = timeit(jax.jit(lambda x: conv(x, kf)), xin)
        print(f"head conv1 fused 192->192: {t*1e3:.1f} ms")

        # conv2: 64->32 x3 separate vs batched-stack vs s2d
        x2 = jnp.asarray(rng.standard_normal((B, D, D, D, 64)), dt)
        k2 = [jnp.asarray(rng.standard_normal((3, 3, 3, 64, 32)) * 0.1, dt)
              for _ in range(3)]
        t = timeit(jax.jit(lambda x: [conv(x, k) for k in k2]), x2)
        print(f"head conv2 3 separate 64->32: {t*1e3:.1f} ms")

        # conv2 as ONE block-diagonal dense conv 192->96 (zeros off-block)
        x2cat = jnp.asarray(rng.standard_normal((B, D, D, D, 192)), dt)
        kbd = np.zeros((3, 3, 3, 192, 96), np.float32)
        for i in range(3):
            kbd[:, :, :, 64 * i : 64 * (i + 1), 32 * i : 32 * (i + 1)] = np.asarray(
                k2[i], np.float32
            )
        kbd = jnp.asarray(kbd, dt)
        t = timeit(jax.jit(lambda x: conv(x, kbd)), x2cat)
        print(f"head conv2 blockdiag 192->96: {t*1e3:.1f} ms")

        # conv2 batched across heads: (3B, ..., 64) -> (3B, ..., 32)
        x2s = jnp.asarray(rng.standard_normal((3 * B, D, D, D, 64)), dt)
        t = timeit(jax.jit(lambda x: conv(x, k2[0])), x2s)
        print(f"head conv2 stacked batch 24: {t*1e3:.1f} ms")

    if "fpn" in sections:
        # laterals: 1x1 convs from 128/256/512 -> 64 and smooth 64->64 x3
        for cin in (128, 256, 512):
            xl = jnp.asarray(rng.standard_normal((B, D, D, D, cin)), dt)
            kl = jnp.asarray(rng.standard_normal((1, 1, 1, cin, 64)) * 0.05, dt)
            def conv(x, k):
                return jax.lax.conv_general_dilated(
                    x, k, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    preferred_element_type=jnp.float32).astype(dt)
            t = timeit(jax.jit(lambda x: conv(x, kl)), xl)
            print(f"fpn lateral {cin}->64 1x1: {t*1e3:.1f} ms")
        xs = jnp.asarray(rng.standard_normal((B, D, D, D, 64)), dt)
        ks = jnp.asarray(rng.standard_normal((3, 3, 3, 64, 64)) * 0.1, dt)
        t = timeit(jax.jit(lambda x: conv(x, ks)), xs)
        print(f"fpn smooth 64->64 3x3: {t*1e3:.1f} ms")

        # lateral as flat einsum matmul (Cin=512)
        xl = jnp.asarray(rng.standard_normal((B, D, D, D, 512)), dt)
        kl = jnp.asarray(rng.standard_normal((512, 64)) * 0.05, dt)
        t = timeit(jax.jit(lambda x: jnp.einsum(
            "bdhwc,ce->bdhwe", x, kl,
            preferred_element_type=jnp.float32).astype(dt)), xl)
        print(f"fpn lateral 512->64 einsum: {t*1e3:.1f} ms")
        kl192 = jnp.asarray(rng.standard_normal((512, 192)) * 0.05, dt)
        t = timeit(jax.jit(lambda x: jnp.einsum(
            "bdhwc,ce->bdhwe", x, kl192,
            preferred_element_type=jnp.float32).astype(dt)), xl)
        print(f"fpn lateral 512->192 einsum: {t*1e3:.1f} ms")

        # all three laterals as one block-diag 896->192 1x1
        xcat = jnp.asarray(rng.standard_normal((B, D, D, D, 896)), dt)
        kbd = np.zeros((896, 192), np.float32)
        kbd[:128, :64] = rng.standard_normal((128, 64)) * 0.05
        kbd[128:384, 64:128] = rng.standard_normal((256, 64)) * 0.05
        kbd[384:, 128:] = rng.standard_normal((512, 64)) * 0.05
        kbd = jnp.asarray(kbd, dt)
        t = timeit(jax.jit(lambda x: jnp.einsum(
            "bdhwc,ce->bdhwe", x, kbd,
            preferred_element_type=jnp.float32).astype(dt)), xcat)
        print(f"fpn laterals blockdiag 896->192 einsum: {t*1e3:.1f} ms")

        # smooth: 3 stacked on batch
        xs3 = jnp.asarray(rng.standard_normal((3 * B, D, D, D, 64)), dt)
        t = timeit(jax.jit(lambda x: conv(x, ks)), xs3)
        print(f"fpn smooth stacked batch 24: {t*1e3:.1f} ms")
        # smooth blockdiag 192->192
        xsc = jnp.asarray(rng.standard_normal((B, D, D, D, 192)), dt)
        ksb = np.zeros((3, 3, 3, 192, 192), np.float32)
        for i in range(3):
            ksb[:, :, :, 64*i:64*(i+1), 64*i:64*(i+1)] = rng.standard_normal((3,3,3,64,64)) * 0.1
        ksb = jnp.asarray(ksb, dt)
        t = timeit(jax.jit(lambda x: conv(x, ksb)), xsc)
        print(f"fpn smooth blockdiag 192->192: {t*1e3:.1f} ms")

    if "model" in sections:
        from mica_tpu.models.init import init_params_fast
        from mica_tpu.models.mica import MICA

        model = MICA(base=64, dtype=dt)
        x0 = jnp.zeros((1, 64, 64, 64, 1), jnp.float32)
        af0 = jnp.zeros((1, 64, 64, 64, 24), jnp.float32)
        params = init_params_fast(model, (x0, af0))
        x = jnp.asarray(rng.standard_normal((B, D, D, D, 1)), jnp.float32)
        af = jnp.asarray((rng.random((B, D, D, D, 24)) < 0.01), jnp.float32)
        fwd = jax.jit(lambda p, x, af: model.apply({"params": p}, x, af))
        t = timeit(fwd, params, x, af, iters=3)
        print(f"full model step (batch {B}): {t*1e3:.1f} ms -> {B/t:.1f} win/s")


if __name__ == "__main__":
    sections = sys.argv[1:] or ["stem", "dw", "head", "fpn", "model"]
    main(sections)
