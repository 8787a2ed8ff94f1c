"""Dispatch-amortized A/B of the depthwise 3x3x3 conv formulations.

The per-call harness (scripts/bench_depthwise.py, pick_depthwise_path)
measured ~10-16 ms for ALL variants across a 4x data-volume range on the
tunneled axon host — the signature of a fixed per-dispatch latency floor,
not device time.  This harness chains K dependent conv applications
inside ONE jitted program (x -> conv(x) -> conv(conv(x)) ...), so a
single dispatch covers K kernel executions and the per-iteration time is
pure device time.  Run:

    PYTHONPATH=/root/repo python -u scripts/bench_depthwise_loop.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import flax.linen as nn

    from mica_tpu.ops.depthwise_pallas import depthwise_conv3_pallas

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    B, S, K = 8, 64, 16

    def force(o):
        jax.block_until_ready(o)
        return np.asarray(o.ravel()[0])

    for C in (64, 128, 256):
        x = jnp.asarray(rng.normal(size=(B, S, S, S, C)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, 3, 1, C)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(C,)), jnp.float32)

        conv = nn.Conv(features=C, kernel_size=(3,) * 3, padding="SAME",
                       feature_group_count=C, dtype=jnp.bfloat16,
                       param_dtype=jnp.float32)
        variables = {"params": {"kernel": k, "bias": b}}

        @jax.jit
        def loop_xla(xx, _c=conv, _v=variables):
            def body(_, acc):
                return _c.apply(_v, acc)
            return jax.lax.fori_loop(0, K, body, xx)

        @jax.jit
        def loop_pl(xx, _k=k, _b=b):
            def body(_, acc):
                return depthwise_conv3_pallas(acc, _k, _b)
            return jax.lax.fori_loop(0, K, body, xx)

        results = {}
        for name, fn in (("xla_grouped", loop_xla), ("pallas", loop_pl)):
            force(fn(x))  # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                force(fn(x))
                best = min(best, time.perf_counter() - t0)
            results[name] = best / K
        hbm_ms = (2 * x.size * 2) / 819e9 * 1e3
        line = " ".join(f"{n}={v * 1e3:7.2f}ms" for n, v in results.items())
        print(f"C={C:4d} {line}  "
              f"speedup={results['xla_grouped'] / results['pallas']:4.2f}x "
              f"hbm_floor={hbm_ms:5.2f}ms")


if __name__ == "__main__":
    main()
