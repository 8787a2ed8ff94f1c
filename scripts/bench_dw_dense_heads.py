"""Dispatch-amortized A/B: (a) depthwise 3x3x3 as a block-diagonal DENSE
conv (diagonal-expanded kernel on the MXU) vs XLA's grouped conv;
(b) the fused-heads 192-out conv as a lane-packed P=2 conv vs direct.

The dense formulation burns C-times the depthwise FLOPs but runs on the
MXU at full lanes; at C=64 the dense cost (0.46 TF -> ~2.4 ms at peak)
is under the measured grouped-conv time (7.6 ms), so it should win
there and lose at larger C.  The packed 192-conv folds the Cout=192
lane split (128 full + 64 half) into 384 = 3x128 full-lane passes at
4/3 the FLOPs.

Timing: K dependent applications chained in one jitted fori_loop (one
dispatch covers K executions; per-call dispatch on the tunneled host is
~10-16 ms and swamps device time).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_dw_dense_heads.py
"""

import time

import numpy as np


def chain_time(fn, x, iters=3):
    import jax

    out = fn(x)
    jax.block_until_ready(out)
    _ = np.asarray(out.ravel()[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn(x)
        jax.block_until_ready(out)
        _ = np.asarray(out.ravel()[0])
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("backend:", jax.default_backend(), jax.devices())

    rng = np.random.default_rng(0)
    B, S, K = 8, 64, 16
    dn = ("NDHWC", "DHWIO", "NDHWC")

    # ---------------- depthwise: grouped vs block-diagonal dense ---------
    for C in (64, 128, 256):
        x = jnp.asarray(
            rng.standard_normal((B, S, S, S, C), np.float32), jnp.bfloat16
        )
        k = jnp.asarray(
            rng.standard_normal((3, 3, 3, 1, C), np.float32) * 0.1,
            jnp.bfloat16,
        )
        b = jnp.asarray(rng.standard_normal((C,), np.float32) * 0.1,
                        jnp.bfloat16)

        def grouped_one(v):
            y = lax.conv_general_dilated(
                v, k, (1, 1, 1), "SAME", dimension_numbers=dn,
                feature_group_count=C)
            return (y + b).astype(v.dtype)

        eye = jnp.eye(C, dtype=k.dtype)
        dense_k = k[:, :, :, 0, :][..., None, :] * eye[None, None, None]

        def dense_one(v):
            y = lax.conv_general_dilated(
                v, dense_k, (1, 1, 1), "SAME", dimension_numbers=dn)
            return (y + b).astype(v.dtype)

        # parity
        d = float(jnp.max(jnp.abs(
            grouped_one(x).astype(jnp.float32)
            - dense_one(x).astype(jnp.float32))))

        def chained(one):
            def f(v):
                return lax.fori_loop(0, K, lambda i, a: one(a), v)
            return jax.jit(f)

        tg = chain_time(chained(grouped_one), x) / K * 1e3
        td = chain_time(chained(dense_one), x) / K * 1e3
        print(f"C={C:3d}  grouped {tg:6.2f} ms   dense {td:6.2f} ms   "
              f"maxdiff {d:.4f}")

    # ---------------- heads 192-out conv: direct vs packed P=2 -----------
    from mica_tpu.ops.conv_fast import packed_conv3

    Cin, Cout = 192, 192
    x = jnp.asarray(
        rng.standard_normal((B, S, S, S, Cin), np.float32), jnp.bfloat16
    )
    k = jnp.asarray(
        rng.standard_normal((3, 3, 3, Cin, Cout), np.float32) * 0.02,
        jnp.bfloat16,
    )

    def direct_one(v):
        y = lax.conv_general_dilated(
            v, k, (1, 1, 1), "SAME", dimension_numbers=dn)
        return y.astype(v.dtype)

    def packed_one(v):
        return packed_conv3(v, k, None, dtype=jnp.bfloat16,
                            phases=2).astype(v.dtype)

    d = float(jnp.max(jnp.abs(
        direct_one(x).astype(jnp.float32)
        - packed_one(x).astype(jnp.float32))))

    # chain through a 192->192 shape-preserving loop
    def chained(one):
        def f(v):
            return lax.fori_loop(0, K, lambda i, a: one(a), v)
        return jax.jit(f)

    td = chain_time(chained(direct_one), x) / K * 1e3
    tp = chain_time(chained(packed_one), x) / K * 1e3
    print(f"heads 192->192  direct {td:6.2f} ms   packed(P=2) {tp:6.2f} ms"
          f"   maxdiff {d:.4f}")


if __name__ == "__main__":
    main()
