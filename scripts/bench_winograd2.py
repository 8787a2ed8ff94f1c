"""Winograd-z round 2: where does the 0.83x go?

bench_winograd.py measured the z-axis F(4,3) formulation at 0.83x of the
direct conv3d (196 vs 162 ms per 512->256/256->512 pair) despite 2x
fewer MACs.  This harness separates the two suspects and tries a
cheaper transform:

  conv2d-only   chain the 6 per-point conv2ds on a PRE-BUILT V (the MACs
                alone, no transforms): the achievable conv2d rate.
  xform-only    transforms alone (V build + inverse on ones): bandwidth.
  wino_v2       tile-reshape transform: x reshaped to (B, Dt, m, ...)
                plus ONE +1-tile shifted view — no stride-m slices for
                XLA to relayout; inverse writes via plain reshape.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_winograd2.py
"""

import time

import numpy as np

from bench_winograd import MATS


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    B, S, K, m = 8, 64, 8, 4
    a = m + 2
    BT, G, AT = MATS[m]
    dn3 = ("NDHWC", "DHWIO", "NDHWC")
    dn2 = ("NHWC", "HWIO", "NHWC")
    def direct(x, k):
        return lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1, 1), "SAME", dimension_numbers=dn3)

    def kernel_xform(k):
        return [sum(float(G[p, dz]) * k[dz] for dz in range(3)
                    if G[p, dz] != 0) for p in range(a)]

    def v_build_v2(x, dtype, Dt):
        """Input transform via tile reshape + one shifted view.

        x (B, D, H, W, Ci) -> V list of a arrays (B, Dt, H, W, Ci).
        Tile t needs planes t*m - 1 .. t*m + m  (SAME pad 1).  In tile
        space: plane index q = t*m + (k-1) for tap k; k=0 is the last
        plane of tile t-1, k in 1..m are tile t's own, k=m+1 is the
        first plane of tile t+1 (alpha = m+2)."""
        xt = x.reshape(x.shape[0], Dt, m, *x.shape[2:])
        zero = jnp.zeros_like(xt[:, :1, :1])
        taps = []
        # k = 0: previous tile's last plane
        prev_last = jnp.concatenate(
            [zero, xt[:, :-1, m - 1 : m]], axis=1)[:, :, 0]
        taps.append(prev_last)
        for k in range(1, m + 1):
            taps.append(xt[:, :, k - 1])
        nxt_first = jnp.concatenate(
            [xt[:, 1:, 0:1], zero], axis=1)[:, :, 0]
        taps.append(nxt_first)
        V = []
        for p in range(a):
            acc = None
            for kk in range(a):
                c = float(BT[p, kk])
                if c == 0.0:
                    continue
                term = taps[kk].astype(dtype) * c
                acc = term if acc is None else acc + term
            V.append(acc.astype(x.dtype))
        return V

    def inv_xform(M, dtype, x_dtype):
        Dt = M[0].shape[1]
        outs = []
        for j in range(m):
            acc = None
            for p in range(a):
                c = float(AT[j, p])
                if c == 0.0:
                    continue
                term = M[p].astype(dtype) * c
                acc = term if acc is None else acc + term
            outs.append(acc.astype(x_dtype))
        out = jnp.stack(outs, axis=2)  # (B, Dt, m, H, W, Co)
        return out.reshape(out.shape[0], Dt * m, *out.shape[3:])

    def conv_points(V, Wt, dtype):
        Dt = V[0].shape[1]
        M = []
        for p in range(a):
            sp = V[p].shape[2]
            v2 = V[p].reshape(-1, sp, sp, V[p].shape[-1])
            mp = lax.conv_general_dilated(
                v2, Wt[p].astype(dtype), (1, 1), "SAME",
                dimension_numbers=dn2)
            M.append(mp.reshape(V[p].shape[0], Dt, sp, sp, mp.shape[-1]))
        return M

    def wino_v2(x, k, dtype=jnp.bfloat16):
        V = v_build_v2(x, dtype, x.shape[1] // m)
        M = conv_points(V, kernel_xform(k), x.dtype)
        return inv_xform(M, dtype, x.dtype)

    # parity check (f32, small-ish but real tiling)
    xs = jnp.asarray(rng.standard_normal((2, 16, 12, 12, 8)), jnp.float32)
    ks = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 4)) * 0.1, jnp.float32)
    ref = lax.conv_general_dilated(xs, ks, (1, 1, 1), "SAME",
                                   dimension_numbers=dn3,
                                   precision="highest")
    got = wino_v2(xs, ks, dtype=jnp.float32)
    print("v2 f32 parity:", float(jnp.max(jnp.abs(got - ref))))

    Dt = S // m

    # ---- timing -----------------------------------------------------------
    k_ab = jnp.asarray((rng.standard_normal((3, 3, 3, 512, 256)) * 0.05)
                       .astype(np.float32))
    k_ba = jnp.asarray((rng.standard_normal((3, 3, 3, 256, 512)) * 0.05)
                       .astype(np.float32))
    x0 = jnp.asarray(rng.standard_normal((B, S, S, S, 512)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def fence(v):
        jax.block_until_ready(v)
        _ = np.asarray(v.ravel()[0])

    def timed(name, fn, arg, denom=K):
        f = jax.jit(fn)
        y = f(arg)
        fence(y)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            y = f(arg)
            fence(y)
            best = min(best, time.time() - t0)
        print(f"{name:14s}: {best * 1e3:7.1f} ms total, "
              f"{best / denom * 1e3:6.2f} ms/unit")
        return best / denom * 1e3

    def chain_direct(x):
        def body(_, x):
            y = direct(x, k_ab)
            return direct(y, k_ba) * 0.1
        return lax.fori_loop(0, K, body, x)

    base = timed("direct pair", chain_direct, x0)

    def chain_v2(x):
        def body(_, x):
            y = wino_v2(x, k_ab)
            return wino_v2(y, k_ba) * 0.1
        return lax.fori_loop(0, K, body, x)

    t = timed("wino_v2 pair", chain_v2, x0)
    print(f"  -> speedup vs direct: {base / t:.3f}x")

    # conv2d-only: 6+6 point convs on persistent V buffers (the MAC floor)
    V0 = [jnp.asarray(rng.standard_normal((B, Dt, S, S, 512)))
          .astype(jnp.bfloat16) for _ in range(a)]

    def chain_convs(Vs):
        Wt_ab = kernel_xform(k_ab)
        Wt_ba = kernel_xform(k_ba)

        def body(_, Vs):
            M = conv_points(Vs, Wt_ab, jnp.bfloat16)     # 512 -> 256
            M2 = conv_points(M, Wt_ba, jnp.bfloat16)     # 256 -> 512
            return [v * 0.1 for v in M2]
        return lax.fori_loop(0, K, body, Vs)

    tc = timed("conv2d only", chain_convs, V0)
    print(f"  (MAC floor share: {tc / t * 100:.0f}% of wino_v2)")

    # transform-only: V build + inverse, conv replaced by slicing channels
    def chain_xform(x):
        def body(_, x):
            V = v_build_v2(x, jnp.bfloat16, x.shape[1] // m)
            M = [v[..., :256] for v in V]
            y = inv_xform(M, jnp.bfloat16, x.dtype)
            V = v_build_v2(y, jnp.bfloat16, y.shape[1] // m)
            M = [jnp.concatenate([v, v], axis=-1) for v in V]
            return inv_xform(M, jnp.bfloat16, x.dtype) * 0.1
        return lax.fori_loop(0, K, body, x)

    tx = timed("xform only", chain_xform, x0)
    print(f"  (transform share: {tx / t * 100:.0f}% of wino_v2)")


if __name__ == "__main__":
    main()
