"""Dispatch-amortized A/B of ALTERNATIVE depthwise 3x3x3 formulations.

The Pallas kernel lost to XLA's grouped conv on real v5e silicon
(scripts/bench_depthwise_loop.py: 16.3 vs 7.6 ms at C=64), but XLA's
grouped conv still sits 5-11x above the HBM floor.  This harness
measures XLA-expressible reformulations that keep the arithmetic on
hardware-friendly paths:

  xla_grouped   lax grouped conv, feature_group_count=C (the incumbent)
  gconv2d_z     grouped (1,3,3) conv with 3 features per group (one per
                dz tap), then a 3-term shifted add along z — the z taps
                leave the conv and become major-axis slices XLA can fuse
  shiftmm       x-axis taps as W-by-W shifted-identity matmuls (MXU),
                z/y taps as padded slices feeding one 27-term FMA fusion
  conv2d_3x     three (1,3,3) grouped convs (one per dz) + shifted add

All formulations are exact (max-abs-diff vs the incumbent is printed).
Timing chains K dependent applications inside one jitted fori_loop so a
single dispatch covers K executions (per-call dispatch on the tunneled
host is ~10-16 ms and swamps device time).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_depthwise_forms.py
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

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    B, S, K = 8, 64, 16
    dn = lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                    ("NDHWC", "DHWIO", "NDHWC"))

    def grouped(x, k, b, c):
        y = lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=dn, feature_group_count=c)
        return y + b.astype(x.dtype)

    def gconv2d_z(x, k, b, c):
        # one grouped (1,3,3) conv emitting the 3 dz-tap partials per
        # channel, interleaved (c-major, dz-minor) to match XLA's group
        # layout; then shifted adds along the untiled z axis
        k2 = jnp.transpose(k[:, :, :, 0, :], (1, 2, 3, 0))  # (3,3,C,3dz)
        k2 = k2.reshape(1, 3, 3, 1, 3 * c)
        u = lax.conv_general_dilated(
            x, k2.astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=dn, feature_group_count=c)
        u = u.reshape(x.shape[:4] + (c, 3))
        zero = jnp.zeros_like(u[:, :1, ..., 0])
        lo = jnp.concatenate([u[:, 1:, ..., 2], zero], axis=1)
        hi = jnp.concatenate([zero, u[:, :-1, ..., 0]], axis=1)
        return lo + u[..., 1] + hi + b.astype(x.dtype)

    def conv2d_3x(x, k, b, c):
        outs = []
        for dz in range(3):
            k2 = k[dz].reshape(1, 3, 3, 1, c)
            outs.append(lax.conv_general_dilated(
                x, k2.astype(x.dtype), (1, 1, 1), "SAME",
                dimension_numbers=dn, feature_group_count=c))
        zero = jnp.zeros_like(outs[0][:, :1])
        lo = jnp.concatenate([outs[2][:, 1:], zero], axis=1)
        hi = jnp.concatenate([zero, outs[0][:, :-1]], axis=1)
        return lo + outs[1] + hi + b.astype(x.dtype)

    def shiftmm(x, k, b, c):
        # x-axis taps via W x W shifted-identity matmuls (MXU work);
        # z/y taps as major-axis pad+slice feeding one FMA fusion
        eye = jnp.eye(S, dtype=x.dtype)
        s_m = jnp.concatenate([eye[1:], jnp.zeros((1, S), x.dtype)], 0)
        s_p = jnp.concatenate([jnp.zeros((1, S), x.dtype), eye[:-1]], 0)
        xm = jnp.einsum("bzyxc,xv->bzyvc", x, s_m)
        xp = jnp.einsum("bzyxc,xv->bzyvc", x, s_p)
        taps = {0: x, -1: xp, 1: xm}  # taps[dx][..., x, :] = x[..., x+dx, :]
        acc = jnp.zeros(x.shape, jnp.float32)
        kf = k[:, :, :, 0, :]
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    t = taps[dx - 1]
                    pz, py = dz - 1, dy - 1
                    t = jnp.pad(
                        t,
                        ((0, 0), (max(0, -pz), max(0, pz)),
                         (max(0, -py), max(0, py)), (0, 0), (0, 0)),
                    )
                    t = lax.slice_in_dim(t, max(0, pz), max(0, pz) + S, axis=1)
                    t = lax.slice_in_dim(t, max(0, py), max(0, py) + S, axis=2)
                    acc = acc + t.astype(jnp.float32) * kf[dz, dy, dx]
        return (acc + b).astype(x.dtype)

    for C in (64, 128, 256):
        x = jnp.asarray(rng.normal(size=(B, S, S, S, C)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, 3, 1, C)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(C,)), jnp.float32)

        forms = {
            "xla_grouped": lambda xx: grouped(xx, k, b, C),
            "gconv2d_z": lambda xx: gconv2d_z(xx, k, b, C),
            "conv2d_3x": lambda xx: conv2d_3x(xx, k, b, C),
            "shiftmm": lambda xx: shiftmm(xx, k, b, C),
        }

        ref = np.asarray(jax.jit(forms["xla_grouped"])(x), np.float32)
        scale = np.abs(ref).max()
        results, errs = {}, {}
        for name, fn in forms.items():
            try:
                out = jax.jit(fn)(x)
                errs[name] = float(
                    np.abs(np.asarray(out, np.float32) - ref).max() / scale)
                loop = jax.jit(lambda x0, _f=fn: lax.fori_loop(
                    0, K, lambda _, a: _f(a), x0))
                o = loop(x)
                _ = np.asarray(o.ravel()[0])
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    o = loop(x)
                    _ = np.asarray(o.ravel()[0])
                    best = min(best, time.perf_counter() - t0)
                results[name] = best / K
            except Exception as e:  # noqa: BLE001
                results[name] = float("nan")
                errs[name] = float("nan")
                print(f"C={C} {name} FAILED: {type(e).__name__}: {e}"[:300])

        hbm_ms = (2 * x.size * 2) / 819e9 * 1e3
        print(f"C={C:4d} hbm_floor={hbm_ms:5.2f}ms")
        for name in forms:
            print(f"    {name:12s} {results[name] * 1e3:7.2f}ms  "
                  f"relerr={errs[name]:.2e}")


if __name__ == "__main__":
    main()
