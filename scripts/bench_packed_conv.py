"""Microbenchmark: phase-packed small-Cout conv vs XLA's direct conv.

A stride-1 k=3 conv with Cout < 128 wastes MXU output lanes
(rate ~ peak * min(Cout,128)/128, PERFORMANCE.md).  Reformulation: pack P
adjacent x-positions ("phases") of the output into the channel dim by
running a stride-P-in-x conv with kernel x-extent (3 + P - 1) whose
weights hold P shifted copies of the original kernel (zeros elsewhere).
N = P*Cout fills the lanes; K grows by (3+P-1)/3 in zero-padded FLOPs.
Net predicted win: Cout=64 (P=2): 2/1.33 = 1.5x; Cout=32 (P=4): 4/2 = 2x.
The output (B,D,H,W/P,P*Cout) unpacks to (B,D,H,W,Cout) with one reshape.

Run: python scripts/bench_packed_conv.py
"""

import time

import numpy as np


def timeit(fn, *args, iters=10, warmup=3):
    import jax

    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
    return (time.time() - t0) / iters


def pack_kernel(k, phases):
    """(kd,kh,kw,ci,co) -> (kd,kh,kw+P-1,ci,P*co) phase-packed kernel."""
    import numpy as np

    kd, kh, kw, ci, co = k.shape
    k2 = np.zeros((kd, kh, kw + phases - 1, ci, phases * co), k.dtype)
    for ph in range(phases):
        k2[:, :, ph : ph + kw, :, ph * co : (ph + 1) * co] = k
    return k2


def main():
    import sys

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    only = int(sys.argv[1]) if len(sys.argv) > 1 else None  # filter by Cout

    rng = np.random.default_rng(0)
    B, D = 8, 64

    shapes = [
        # (Cin, Cout, phases) — the network's lane-limited k=3 convs
        (64, 32, 4),    # enc0 RDB conv1
        (96, 32, 4),    # enc0 RDB conv2
        (128, 64, 2),   # enc0 RDB conv3 / enc1 conv1
        (192, 64, 2),   # enc1 RDB conv2
        (64, 64, 2),    # FPN smooths
        (64, 32, 4),    # head conv2
        (192, 192, 2),  # fused heads conv1 (192-out: 1.5 lane tiles)
    ]

    dn = ("NDHWC", "DHWIO", "NDHWC")

    for ci, co, P in shapes:
        if only is not None and co != only:
            continue
        x = jnp.asarray(rng.standard_normal((B, D, D, D, ci)), jnp.bfloat16)
        k = rng.standard_normal((3, 3, 3, ci, co)).astype(np.float32)
        kj = jnp.asarray(k, jnp.bfloat16)
        k2 = jnp.asarray(pack_kernel(k, P), jnp.bfloat16)

        @jax.jit
        def direct(x, kj=kj):
            return jax.lax.conv_general_dilated(
                x, kj, (1, 1, 1), "SAME", dimension_numbers=dn
            )

        @jax.jit
        def packed(x, k2=k2, co=co, P=P):
            # x-padding: output index w = P*t + ph needs inputs
            # P*t + (ph + kw) - 1 for kw in 0..2 -> pad 1 left,
            # (P - 2 + 2) = P right... solve: max input idx at t=W/P-1,
            # u=P+1: W - P + P + 1 - 1 = W -> pad 1 right.
            y = jax.lax.conv_general_dilated(
                x, k2, (1, 1, P),
                [(1, 1), (1, 1), (1, 1)],
                dimension_numbers=dn,
            )
            b, d, h, w2, _ = y.shape
            return y.reshape(b, d, h, w2 * P, co)

        # correctness
        yd = np.asarray(direct(x), np.float32)
        yp = np.asarray(packed(x), np.float32)
        err = np.abs(yd - yp).max()
        td = timeit(direct, x) * 1e3
        tp = timeit(packed, x) * 1e3
        flops = 2 * B * D**3 * ci * 27 * co
        print(
            f"Cin={ci:4d} Cout={co:3d} P={P}: direct {td:7.2f} ms "
            f"({flops/td/1e9:6.1f} TF/s)  packed {tp:7.2f} ms "
            f"({flops/tp/1e9:6.1f} TF/s)  speedup {td/tp:4.2f}x  maxerr {err:.3g}"
        )


if __name__ == "__main__":
    main()
