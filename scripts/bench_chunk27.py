"""A/B: chunk=8 (4 dispatches per dense 256-cube) vs chunk=27 (1 dispatch).

Chained-vs-fenced dispatch timing showed ~0.5 ms/window of dispatch
boundary cost (59.2 vs 59.7 ms/win); a 256-cube dense map at chunk 8
pays 4 boundaries, chunk 27 pays one.  The realistic map (104 computed
windows) fits one dispatch at chunk 27 via the n_chunks=13 tail
specialization.  Memory: the model program's accumulator grows to
(27, 8, 48^3, 22ch) f32 ~= 2.1 GB — checked here on hardware.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_chunk27.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mica_tpu.infer.engine import SlidingWindowPredictor
    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    rng = np.random.default_rng(0)
    map_shape = (256, 256, 256)
    volume_dense = rng.random(map_shape, dtype=np.float32)
    af_dense = (rng.random((24,) + map_shape) < 0.01).astype(np.int8)

    # realistic blob map (bench.py construction)
    grid = np.indices((64, 64, 64), dtype=np.float32) * 4.0
    coarse = np.zeros((64, 64, 64), np.float32)
    centers = rng.uniform(64, 192, size=(40, 3)).astype(np.float32)
    for c in centers:
        r2 = ((grid[0] - c[0]) ** 2 + (grid[1] - c[1]) ** 2
              + (grid[2] - c[2]) ** 2)
        coarse += np.exp(-r2 / (2 * 18.0 ** 2), dtype=np.float32)
    coarse /= max(coarse.max(), 1e-6)
    dense_region = np.kron(coarse > 0.05, np.ones((4, 4, 4), np.float32))
    volume_real = dense_region * rng.random(map_shape, dtype=np.float32)
    af_real = ((rng.random((24,) + map_shape) < 0.01)
               & (dense_region > 0)).astype(np.int8)

    model = MICA(base=64, dtype=jnp.bfloat16)
    params = init_params_fast(
        model,
        (jnp.zeros((1, 64, 64, 64, 1), jnp.float32),
         jnp.zeros((1, 64, 64, 64, 24), jnp.float32)),
    )

    for chunk in (14,):
        try:
            pred = SlidingWindowPredictor(params, batch_size=8,
                                          dtype=jnp.bfloat16, chunk=chunk)
            for label, vol, af in (("dense", volume_dense, af_dense),
                                   ("realistic", volume_real, af_real)):
                pred.predict_volume(vol, af, keep_on_device=True)  # warm
                best = best_inf = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    out = pred.predict_volume(vol, af, keep_on_device=True)
                    best = min(best, time.time() - t0)
                    best_inf = min(best_inf, pred.timing["inference"])
                print(f"chunk={chunk:2d} {label:9s}: inference "
                      f"{best_inf:6.3f} s  e2e {best:6.3f} s  "
                      f"(windows {pred.timing['n_windows']}, "
                      f"empty {pred.timing.get('n_empty', 0)})", flush=True)
                del out
            del pred
            jax.clear_caches()
            import gc

            gc.collect()
        except Exception as e:  # noqa: BLE001
            print(f"chunk={chunk}: FAILED {type(e).__name__}: {e}"[:300],
                  flush=True)


if __name__ == "__main__":
    main()
