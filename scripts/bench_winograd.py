"""Dispatch-amortized A/B: direct conv3d vs z-axis Winograd formulations.

The model's two dominant convs (encoder2's conv3 512->256 and transition
256->512, ~15 TF each per batch-8 step) run at 94% of v5e bf16 peak
through XLA's conv emitter — irreducible by scheduling.  Winograd is the
only formulation with FEWER multiplies.  Full-3D F(2,3)^3 was rejected in
round 2 (8x transform-domain expansion -> HBM-bound); this harness tries
the never-measured 1-AXIS variant: Winograd along z only, with the
per-transform-point work staying a dense 3x3 2D conv (XLA's best-tuned
path) over (y, x):

  m=2 (F(2,3), alpha=4): 2/3 the MACs, 2.0x z-expansion, transforms
      EXACT in binary float (coefficients 0, +-1, +-1/2);
  m=4 (F(4,3), alpha=6): 1/2 the MACs, 1.5x z-expansion, transform
      coefficients up to 8 and G entries 1/6, 1/12, 1/24 — small
      additional rounding, measured here against the bf16-direct error.

Timing chains K dependent applications of a 512->256 / 256->512 conv
PAIR inside one jitted fori_loop (one dispatch covers K executions; the
tunneled host's per-dispatch latency would otherwise swamp device time).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_winograd.py
"""

import time

import numpy as np

# F(2,3): points 0, 1, -1, inf
BT2 = np.array([[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]],
               np.float32)
G2 = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]],
              np.float32)
AT2 = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)

# F(4,3): points 0, 1, -1, 2, -2, inf (Lavin & Gray)
BT4 = np.array(
    [
        [4, 0, -5, 0, 1, 0],
        [0, -4, -4, 1, 1, 0],
        [0, 4, -4, -1, 1, 0],
        [0, -2, -1, 2, 1, 0],
        [0, 2, -1, -2, 1, 0],
        [0, 4, 0, -5, 0, 1],
    ],
    np.float32,
)
G4 = np.array(
    [
        [1 / 4, 0, 0],
        [-1 / 6, -1 / 6, -1 / 6],
        [-1 / 6, 1 / 6, -1 / 6],
        [1 / 24, 1 / 12, 1 / 6],
        [1 / 24, -1 / 12, 1 / 6],
        [0, 0, 1],
    ],
    np.float32,
)
AT4 = np.array(
    [
        [1, 1, 1, 1, 1, 0],
        [0, 1, -1, 2, -2, 0],
        [0, 1, 1, 4, 4, 0],
        [0, 1, -1, 8, -8, 1],
    ],
    np.float32,
)

MATS = {2: (BT2, G2, AT2), 4: (BT4, G4, AT4)}


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    B, S = 8, 64
    dn3 = ("NDHWC", "DHWIO", "NDHWC")
    dn2 = ("NHWC", "HWIO", "NHWC")

    def direct(x, k):
        return lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1, 1), "SAME", dimension_numbers=dn3)

    def wino_z(x, k, m, combine=jnp.float32):
        """z-axis Winograd F(m,3); k is (3,3,3,Ci,Co) f32.

        ``combine``: accumulation dtype of the input/inverse transforms.
        float32 is the accuracy-measurement default; bfloat16 halves the
        transform-domain footprint (BT/AT coefficients are small exact
        integers, so the extra rounding is one add-chain's worth)."""
        BT, G, AT = MATS[m]
        a = m + 2
        Bsz, D, H, W, Ci = x.shape
        Co = k.shape[-1]
        Dt = D // m
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        # strided z-tap slices: slice p covers plane t*m + p of tile t
        sl = [xp[:, p : p + (Dt - 1) * m + 1 : m] for p in range(a)]
        # input transform (f32 combine, cast back): V[p] = sum_k BT[p,k] x_k
        V = []
        for p in range(a):
            acc = None
            for kk in range(a):
                c = float(BT[p, kk])
                if c == 0.0:
                    continue
                term = sl[kk].astype(combine) * c
                acc = term if acc is None else acc + term
            V.append(acc.astype(x.dtype))
        # kernel transform in f32 (params are f32): Wt[p] = sum_dz G[p,dz] k[dz]
        Wt = [
            sum(float(G[p, dz]) * k[dz] for dz in range(3) if G[p, dz] != 0)
            for p in range(a)
        ]
        # per-point 2D conv over (y, x): batch (B*Dt), XLA's conv2d path
        M = []
        for p in range(a):
            v2 = V[p].reshape(Bsz * Dt, H, W, Ci)
            mp = lax.conv_general_dilated(
                v2, Wt[p].astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=dn2)
            M.append(mp.reshape(Bsz, Dt, H, W, Co))
        # inverse transform: out[:, t*m + j] = sum_p AT[j,p] M[p][:, t]
        outs = []
        for j in range(m):
            acc = None
            for p in range(a):
                c = float(AT[j, p])
                if c == 0.0:
                    continue
                term = M[p].astype(combine) * c
                acc = term if acc is None else acc + term
            outs.append(acc.astype(x.dtype))
        out = jnp.stack(outs, axis=2)  # (B, Dt, m, H, W, Co)
        return out.reshape(Bsz, D, H, W, Co)

    # ---- parity (f32, small) --------------------------------------------
    xs = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 16)), jnp.float32)
    ks = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)) * 0.1, jnp.float32)
    ref = direct(xs, ks)
    for m in (2, 4):
        got = wino_z(xs, ks, m)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"f32 parity m={m}: max abs err {err:.2e}")

    # ---- bf16 accuracy vs f32-direct oracle (real shape, one conv) ------
    x_big = rng.standard_normal((B, S, S, S, 512)).astype(np.float32)
    k_big = (rng.standard_normal((3, 3, 3, 512, 256)) * 0.03).astype(np.float32)
    xd = jnp.asarray(x_big)
    kd = jnp.asarray(k_big)
    oracle = np.asarray(direct(xd[:1], kd)[0, 2:-2, 2:-2, 2:-2])
    scale = np.abs(oracle).mean()
    d_bf = np.asarray(
        direct(xd[:1].astype(jnp.bfloat16), kd)[0, 2:-2, 2:-2, 2:-2],
        np.float32)
    print(f"bf16 direct : mean|err|/|y| {np.abs(d_bf - oracle).mean() / scale:.3e}  "
          f"max {np.abs(d_bf - oracle).max():.3e}")
    for m in (2, 4):
        w_bf = np.asarray(
            wino_z(xd[:1].astype(jnp.bfloat16), kd, m)[0, 2:-2, 2:-2, 2:-2],
            np.float32)
        print(f"bf16 wino{m} : mean|err|/|y| {np.abs(w_bf - oracle).mean() / scale:.3e}  "
              f"max {np.abs(w_bf - oracle).max():.3e}")

    # free the accuracy-section device buffers before timing (xd is a
    # 2.1 GB f32 volume; the chained wino programs need the HBM)
    del xd, kd, oracle, d_bf, w_bf
    import gc

    gc.collect()

    # ---- timing: chained pair 512->256 -> 256->512 ----------------------
    K = 8
    k_ab = jnp.asarray((rng.standard_normal((3, 3, 3, 512, 256)) * 0.05)
                       .astype(np.float32))
    k_ba = jnp.asarray((rng.standard_normal((3, 3, 3, 256, 512)) * 0.05)
                       .astype(np.float32))
    x0 = jnp.asarray(rng.standard_normal((B, S, S, S, 512)).astype(np.float32)
                     ).astype(jnp.bfloat16)

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
        per_pair = best / K * 1e3
        print(f"{name:14s}: {best * 1e3:7.1f} ms total, {per_pair:6.2f} ms/conv-pair")
        return per_pair

    def chain_direct(x):
        def body(_, x):
            y = direct(x, k_ab)
            return direct(y, k_ba) * 0.1
        return lax.fori_loop(0, K, body, x)

    def make_chain_wino(m):
        def chain(x):
            def body(_, x):
                y = wino_z(x, k_ab, m, combine=jnp.bfloat16)
                return wino_z(y, k_ba, m, combine=jnp.bfloat16) * 0.1
            return lax.fori_loop(0, K, body, x)
        return chain

    base = timed("direct", chain_direct)
    for m in (2, 4):
        t = timed(f"wino_z m={m}", make_chain_wino(m))
        print(f"  -> speedup vs direct: {base / t:.3f}x")


if __name__ == "__main__":
    main()
