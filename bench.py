"""Headline benchmark: sliding-window inference throughput on real TPU.

Runs the full-size MICA network (base_filters=64, bfloat16) over a
256-cube synthetic density map with 24-channel AF3 encodings — the same
sliding-window workload as the reference's ``nnPred`` stage
(utils/predict.py:307-398) — and reports voxels/second/chip.

The headline map is REALISTIC: a protein-sized blob cluster in a mostly
empty box (~24% of voxels carry density, ~52% of windows are empty), the
regime actual cryo-EM maps live in.  The reference runs its network on
every window regardless; this engine computes one representative output
for the all-zero windows (bitwise-identical final volumes), which is an
algorithmic throughput win counted here.  A fully-dense map variant —
isolating raw model throughput — is also measured and reported under
``detail.dense_*``.

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
driver's north-star target is >= 5x A100 voxels/sec/chip.  The A100
estimate used for ``vs_baseline`` is derived from the reference workload's
~7.3 TFLOP/sample forward cost at the fp32/TF32 efficiency of torch-1.8-era
conv3d kernels: ~5 samples/s * 48^3 core voxels = 5.5e5 voxels/s.
"""

import json
import sys
import time

import numpy as np


def _stage(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

A100_BASELINE_VOXELS_PER_SEC = 5.5e5


def _train_bench(batch: int = 8, iters: int = 3):
    """Training step time / samples/s / FLOP rate.  If the depthwise
    autotune picked the Pallas kernel (from inference timings), A/B the
    training step too — its backward runs two more Pallas programs whose
    cost the inference A/B never saw — and report the better config."""
    import gc
    import os

    import jax

    from mica_tpu.ops.depthwise_pallas import _VALIDATED_WIDTHS

    detail = _train_one(batch, iters)
    pallas_on = (os.environ.get("MICA_PALLAS_DW") == "1"
                 or any(_VALIDATED_WIDTHS.values()))
    if pallas_on:
        detail["dw_path"] = "pallas"
        jax.clear_caches()
        gc.collect()
        prev = os.environ.get("MICA_PALLAS_DW")
        os.environ["MICA_PALLAS_DW"] = "0"  # force XLA for the B side
        try:
            d_xla = _train_one(batch, iters)
        except Exception:  # noqa: BLE001 - keep the measured config
            d_xla = None
        finally:
            if prev is None:
                del os.environ["MICA_PALLAS_DW"]
            else:
                os.environ["MICA_PALLAS_DW"] = prev
        if d_xla is not None:
            if d_xla["step_s"] < detail["step_s"]:
                d_xla["dw_path"] = "xla"
                d_xla["pallas_dw_step_s"] = detail["step_s"]
                detail = d_xla
            else:
                detail["xla_dw_step_s"] = d_xla["step_s"]
    return detail


def _train_one(batch: int = 8, iters: int = 3):
    """One jitted training step config: step time / samples/s / FLOP rate."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from mica_tpu.train.data import synthetic_batch
    from mica_tpu.train.loss import task_lambdas
    from mica_tpu.train.trainer import Trainer

    trainer = Trainer(base_filters=64, dtype=jnp.bfloat16, use_mesh=False,
                      use_augmentation=True, remat=True)
    state = trainer.init_state((1, 64, 64, 64, 1))
    batch_np = synthetic_batch(batch_size=batch, size=64)
    batch_dev = tuple(jnp.asarray(b) for b in batch_np)
    lambdas = jnp.asarray(task_lambdas(0), jnp.float32)
    step = trainer.train_step_for_epoch(0)
    key = jax.random.PRNGKey(0)

    t0 = _time.time()
    state, metrics = step(state, batch_dev, lambdas, key)
    jax.block_until_ready(metrics["total_loss"])
    _ = float(np.asarray(metrics["total_loss"]))
    compile_s = _time.time() - t0
    _stage(f'train compile done ({compile_s:.0f}s)')

    t0 = _time.time()
    for _ in range(iters):
        state, metrics = step(state, batch_dev, lambdas, key)
    jax.block_until_ready(metrics["total_loss"])
    loss = float(np.asarray(metrics["total_loss"]))
    dt = (_time.time() - t0) / iters

    fwd_tflop_per_sample = 7.35  # PERFORMANCE.md FLOP count, 64-cube window
    return {
        "batch": batch,
        "remat": True,
        "remat_scope": trainer.model.remat_scope,
        "step_s": round(dt, 3),
        "samples_per_s_chip": round(batch / dt, 2),
        "model_tflops_per_s": round(3 * fwd_tflop_per_sample * batch / dt, 1),
        "warmup_compile_s": round(compile_s, 1),
        "loss_finite": bool(np.isfinite(loss)),
    }


def measure_baseline(n_batches: int = 8, batch: int = 4):
    """Measure the REFERENCE torch model's own voxels/s on whatever
    accelerator torch sees (VERDICT r3 #7: anchor the denominator).

    Runs `/root/reference/models/model.py` MICA (imported as a black-box
    oracle, random weights — throughput only) over the reference's own
    sliding-window workload: batched 64-cube windows + 24-ch AF3 input,
    fp32, `torch.no_grad()`, exactly predict.py:307-398's inner loop
    shape.  On a CUDA host this REPLACES the derived 5.5e5 A100
    estimate; on CPU it is a smoke test of the path (tiny geometry) and
    the number is reported as `smoke=True`, not a baseline.

    TRUST BOUNDARY: this imports and executes code from
    `/root/reference` (retrieved third-party content) in-process.  It is
    opt-in only (`--measure-baseline`), never runs as part of the
    driver bench, and the `--measure-baseline` invocation prints its
    JSON and exits immediately — so it always runs in its own
    short-lived process, isolated from any bench measurement.
    """
    sys.path.insert(0, "/root/reference")
    import torch

    from models.model import MICA as TorchMICA

    cuda = torch.cuda.is_available()
    if not cuda:
        n_batches, batch, win = 1, 1, 16
    else:
        win = 64
    dev = "cuda" if cuda else "cpu"
    torch.manual_seed(0)
    model = TorchMICA(base_filters=64).to(dev).eval()
    x = torch.rand(batch, 1, win, win, win, device=dev)
    af = (torch.rand(batch, 24, win, win, win, device=dev) < 0.01).float()
    sm = torch.nn.Softmax(dim=1)
    core = 48 if cuda else win  # reference stitches 48^3 cores of 64-wins

    def run(n):
        with torch.no_grad():
            for _ in range(n):
                bb, ca, aa = model(x, af)
                _ = sm(torch.cat((bb[:, :1], bb[:, 2:]), dim=1))
                _ = sm(torch.cat((ca[:, :1], ca[:, 2:]), dim=1))
                s = sm(aa[:, 1:])
                _ = torch.max(s, 1)[1]
        if cuda:
            torch.cuda.synchronize()

    run(1)  # warmup
    t0 = time.time()
    run(n_batches)
    dt = time.time() - t0
    vps = n_batches * batch * core**3 / dt
    return {
        "metric": "reference_torch_voxels_per_s",
        "value": round(vps, 1),
        "unit": "core voxels/sec/device",
        "device": torch.cuda.get_device_name(0) if cuda else "cpu",
        "smoke": not cuda,
        "windows": n_batches * batch,
        "window": win,
        "elapsed_s": round(dt, 3),
        "estimate_in_use": A100_BASELINE_VOXELS_PER_SEC,
        "note": ("measured on CUDA: use this as vs_baseline denominator"
                 if cuda else
                 "CPU smoke only; vs_baseline keeps the documented "
                 "A100 estimate until a CUDA host runs this"),
    }


def main():
    import jax
    import jax.numpy as jnp

    if "--measure-baseline" in sys.argv:
        print(json.dumps(measure_baseline()))
        return

    # Persistent compilation cache: the bench host has a single CPU, so the
    # first XLA compile of the full network is expensive — cache it on disk.
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mica_tpu.infer.engine import SlidingWindowPredictor
    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    rng = np.random.default_rng(0)
    map_shape = (256, 256, 256)

    # Realistic workload: cryo-EM maps are mostly background — the particle
    # occupies a fraction of the box.  Build a protein-sized blob cluster
    # (~35-40% of windows carry density); the reference computes every
    # window regardless (predict.py:307-398), while this engine computes
    # one representative for the all-zero windows (output-identical).
    # A fully-dense variant is also measured and reported in `detail`.
    volume = np.zeros(map_shape, dtype=np.float32)
    grid = np.indices((64, 64, 64), dtype=np.float32) * 4.0  # coarse, then zoom
    coarse = np.zeros((64, 64, 64), np.float32)
    centers = rng.uniform(64, 192, size=(40, 3)).astype(np.float32)
    for c in centers:
        r2 = ((grid[0] - c[0]) ** 2 + (grid[1] - c[1]) ** 2
              + (grid[2] - c[2]) ** 2)
        coarse += np.exp(-r2 / (2 * 18.0 ** 2), dtype=np.float32)
    coarse /= max(coarse.max(), 1e-6)
    dense_region = np.kron(coarse > 0.05, np.ones((4, 4, 4), np.float32))
    volume = dense_region * rng.random(map_shape, dtype=np.float32)
    af = ((rng.random((24,) + map_shape) < 0.01) & (dense_region > 0)).astype(
        np.int8
    )

    volume_dense = rng.random(map_shape, dtype=np.float32)
    af_dense = (rng.random((24,) + map_shape) < 0.01).astype(np.int8)

    model = MICA(base=64, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 64, 64, 64, 1), jnp.float32)
    af0 = jnp.zeros((1, 64, 64, 64, 24), jnp.float32)
    params = init_params_fast(model, (x0, af0))

    # pick the faster depthwise-conv formulation on this hardware BEFORE the
    # engine traces its model program (the gate reads env at trace time);
    # the predictor would run this itself, but doing it here surfaces the
    # A/B timings in the bench JSON even on a disk-cache miss
    _stage('depthwise autotune')
    from mica_tpu.ops.depthwise_pallas import pick_depthwise_path

    dw_detail = pick_depthwise_path()
    _stage(f'depthwise path: {dw_detail.get("path")}')

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
            _stage('realistic warmup')
            pred.predict_volume(volume, af, keep_on_device=True)
            warmup_s = time.time() - t_w
            # phase split of the warmup (VERDICT r4 #8): `setup` is the
            # host->device volume/encoding upload + window planning —
            # through the tunneled TPU this phase alone has measured
            # 150+ s during degraded-network windows (~1.5 MB/s on a
            # ~0.5 GB upload) while compiles served from the seeded disk
            # cache in tens of seconds; splitting them keeps
            # warmup_compile_s from reading as compile time
            warmup_setup_s = float(pred.timing.get("setup", 0.0))
            warmup_upload_mb = (volume.nbytes + af.nbytes) / 1e6

            # best of three timed runs: host/tunnel jitter is a material
            # fraction of a ~7 s measurement
            elapsed = float("inf")
            inference_s = float("inf")
            for _ in range(3):
                t0 = time.time()
                out = pred.predict_volume(volume, af, keep_on_device=True)
                elapsed = min(elapsed, time.time() - t0)
                inference_s = min(inference_s, pred.timing["inference"])
            pred.timing["inference"] = inference_s

            # free the realistic predictor's on-device state (outputs,
            # volumes, accumulators) BEFORE the dense predictor builds:
            # two live predictors at batch 8 exceed HBM
            finite = bool(np.isfinite(
                np.asarray(out["backbone_probability"][:8, :8, :8])).all())
            inference_timing = dict(pred.timing)
            del out, pred
            import gc as _gc

            _gc.collect()

            # fully-dense variant (every window carries density): isolates
            # raw model throughput from the empty-window dedup win
            pred_dense = SlidingWindowPredictor(
                params, batch_size=batch_size, dtype=jnp.bfloat16
            )
            pred_dense.predict_volume(volume_dense, af_dense,
                                      keep_on_device=True)
            _stage('dense timed runs')
            dense_elapsed = float("inf")
            dense_inference = float("inf")
            for _ in range(3):
                t0 = time.time()
                pred_dense.predict_volume(volume_dense, af_dense,
                                          keep_on_device=True)
                dense_elapsed = min(dense_elapsed, time.time() - t0)
                dense_inference = min(dense_inference,
                                      pred_dense.timing["inference"])
            break
        except Exception as e:  # OOM fallback
            if attempt == 2:
                raise
            batch_size //= 2

    # free the dense predictor's on-device state BEFORE the training
    # bench — the training state + step temporaries need the HBM; the
    # realistic predictor was already freed before the dense phase.
    # Recompiles come from the persistent disk cache.
    dense_n_windows = int(pred_dense.timing["n_windows"])
    del pred_dense
    import gc

    gc.collect()
    jax.clear_caches()

    # Training throughput (driver-visible training bench, VERDICT r1 #5):
    # full-size network, bf16, on-device augmentation, adaptive clipping,
    # remat on encoders+heads.  Batch 8 is the measured-best config
    # (3.01 samples/s vs 1.00 at the reference-parity batch 2 —
    # scripts/bench_train.py).  The reference trains at ~0.5-1 samples/s
    # per A100-class GPU (batch 4 DataParallel over 2-4 GPUs, train.py).
    _stage('training bench')
    train_detail = {}
    try:
        train_detail = _train_bench()
    except Exception as e:  # noqa: BLE001 - never sink the headline metric
        train_detail = {"error": f"{type(e).__name__}: {e}"[:200]}

    n_voxels = int(np.prod(map_shape))
    vps = n_voxels / inference_timing["inference"]
    vps_dense = n_voxels / dense_inference
    result = {
        "metric": "sliding_window_inference_throughput",
        "value": round(vps, 1),
        "unit": "voxels/sec/chip",
        "vs_baseline": round(vps / A100_BASELINE_VOXELS_PER_SEC, 3),
        "detail": {
            "map": "realistic (protein blob cluster, mostly background)",
            "map_shape": list(map_shape),
            "n_windows": int(inference_timing["n_windows"]),
            "n_empty_windows": int(inference_timing.get("n_empty", 0)),
            "batch_size": batch_size,
            "inference_s": round(inference_timing["inference"], 3),
            "end_to_end_s": round(elapsed, 3),
            "warmup_compile_s": round(warmup_s, 3),
            # warmup phase split: setup = data upload + window planning
            # (tunnel-bandwidth-bound, 150+ s in degraded windows);
            # the remainder is compile-or-cache-serve + first inference.
            # warmup_compile_s is NOT pure compile time — see
            # PERFORMANCE.md "warmup caveat".
            "warmup_setup_s": round(warmup_setup_s, 3),
            "warmup_compile_serve_s": round(warmup_s - warmup_setup_s, 3),
            "warmup_upload_mb": round(warmup_upload_mb, 1),
            "windows_per_s": round(
                inference_timing["n_windows"] / inference_timing["inference"], 2
            ),
            "dense_map_voxels_per_s": round(vps_dense, 1),
            "dense_vs_baseline": round(
                vps_dense / A100_BASELINE_VOXELS_PER_SEC, 3
            ),
            "dense_inference_s": round(dense_inference, 3),
            "dense_windows_per_s": round(
                dense_n_windows / dense_inference, 2
            ),
            "device": str(jax.devices()[0]),
            "finite": finite,
            "depthwise": dw_detail,
            "train": train_detail,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
