"""Silicon A/B: Pallas Winograd-z (fused conv+IN+ReLU) vs XLA direct.

Chains K dependent applications of the conv+IN+ReLU pair
(512->256 -> 256->512, the model's two dominant convs at their real
in-model epilogue) in one jitted fori_loop (dispatch-amortized).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_wino_pallas.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mica_tpu.models.mica import instance_norm
    from mica_tpu.ops.wino_pallas import wino_conv3d_in_relu_pallas

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    B, S, K = 8, 64, 8
    k_ab = jnp.asarray((rng.standard_normal((3, 3, 3, 512, 256)) * 0.05)
                       .astype(np.float32))
    k_ba = jnp.asarray((rng.standard_normal((3, 3, 3, 256, 512)) * 0.05)
                       .astype(np.float32))
    b_ab = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    b_ba = jnp.asarray(rng.standard_normal(512).astype(np.float32))
    x0 = jnp.asarray(rng.standard_normal((B, S, S, S, 512)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def direct_in_relu(x, k, b):
        out = lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jax.nn.relu(instance_norm(out + b.astype(out.dtype)))

    # accuracy spot-check on device (one application)
    got = wino_conv3d_in_relu_pallas(x0[:1], k_ab, b_ab)
    want = direct_in_relu(x0[:1], k_ab, b_ab)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    print(f"on-device max abs diff (IN'd output, bf16): {err:.3e}")

    def fence(v):
        jax.block_until_ready(v)
        _ = np.asarray(v.ravel()[0])

    def timed(name, fn):
        f = jax.jit(fn)
        y = f(x0)
        fence(y)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            y = f(x0)
            fence(y)
            best = min(best, time.time() - t0)
        print(f"{name:12s}: {best * 1e3:7.1f} ms total, "
              f"{best / K * 1e3:6.2f} ms/pair", flush=True)
        return best / K * 1e3

    def chain_direct(x):
        def body(_, x):
            y = direct_in_relu(x, k_ab, b_ab)
            return direct_in_relu(y, k_ba, b_ba)
        return lax.fori_loop(0, K, body, x)

    def chain_pallas(x):
        def body(_, x):
            y = wino_conv3d_in_relu_pallas(x, k_ab, b_ab)
            return wino_conv3d_in_relu_pallas(y, k_ba, b_ba)
        return lax.fori_loop(0, K, body, x)

    base = timed("direct+IN", chain_direct)
    t = timed("pallas wino", chain_pallas)
    print(f"  -> speedup vs direct: {base / t:.3f}x")


if __name__ == "__main__":
    main()
