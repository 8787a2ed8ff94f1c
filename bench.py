"""Headline benchmark: sliding-window inference throughput on real TPU.

Runs the full-size MICA network (base_filters=64, bfloat16) over a
256-cube synthetic density map with 24-channel AF3 encodings — the same
sliding-window workload as the reference's ``nnPred`` stage
(utils/predict.py:307-398) — and reports voxels/second/chip.

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
driver's north-star target is >= 5x A100 voxels/sec/chip.  The A100
estimate used for ``vs_baseline`` is derived from the reference workload's
~7.3 TFLOP/sample forward cost at the fp32/TF32 efficiency of torch-1.8-era
conv3d kernels: ~5 samples/s * 48^3 core voxels = 5.5e5 voxels/s.
"""

import json
import time

import numpy as np

A100_BASELINE_VOXELS_PER_SEC = 5.5e5


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the bench host has a single CPU, so the
    # first XLA compile of the full network is expensive — cache it on disk.
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mica_tpu.infer.engine import SlidingWindowPredictor
    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    rng = np.random.default_rng(0)
    map_shape = (256, 256, 256)
    volume = rng.random(map_shape, dtype=np.float32)
    af = (rng.random((24,) + map_shape) < 0.01).astype(np.int8)

    model = MICA(base=64, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 64, 64, 64, 1), jnp.float32)
    af0 = jnp.zeros((1, 64, 64, 64, 24), jnp.float32)
    params = init_params_fast(model, (x0, af0))

    batch_size = 8
    for attempt in range(3):
        try:
            pred = SlidingWindowPredictor(
                params, batch_size=batch_size, dtype=jnp.bfloat16
            )
            # Warm up on the EXACT bench shape so every jit program
            # (gather/model/scatter at 256-cube) compiles outside the timed
            # region; the warmup call's wall time is reported separately.
            t_w = time.time()
            pred.predict_volume(volume, af, keep_on_device=True)
            warmup_s = time.time() - t_w

            t0 = time.time()
            out = pred.predict_volume(volume, af, keep_on_device=True)
            elapsed = time.time() - t0
            break
        except Exception as e:  # OOM fallback
            if attempt == 2:
                raise
            batch_size //= 2

    n_voxels = int(np.prod(map_shape))
    vps = n_voxels / pred.timing["inference"]
    result = {
        "metric": "sliding_window_inference_throughput",
        "value": round(vps, 1),
        "unit": "voxels/sec/chip",
        "vs_baseline": round(vps / A100_BASELINE_VOXELS_PER_SEC, 3),
        "detail": {
            "map_shape": list(map_shape),
            "n_windows": int(pred.timing["n_windows"]),
            "batch_size": batch_size,
            "inference_s": round(pred.timing["inference"], 3),
            "end_to_end_s": round(elapsed, 3),
            "warmup_compile_s": round(warmup_s, 3),
            "windows_per_s": round(
                pred.timing["n_windows"] / pred.timing["inference"], 2
            ),
            "device": str(jax.devices()[0]),
            "finite": bool(
                np.isfinite(np.asarray(out["backbone_probability"][:8, :8, :8])).all()
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
