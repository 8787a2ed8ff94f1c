"""Round-5 training-formulation A/B on silicon (VERDICT r4 #1).

Training throughput has been flat at 3.34 samples/s/chip (batch 8,
remat-blocks) for two rounds; the step is conv-bound with the convs near
bf16 peak, so only MAC-saving formulations can move it.  Two levers sit
in-tree unmeasured in the TRAIN step:

  (a) MICA_TRAIN_WINO=1 — the XLA z-axis Winograd formulation in the
      training forward; its VJP is jax-derived through the transform
      chain, so the backward's dx/dk convs inherit the point-conv MAC
      saving too (at the cost of transform-domain traffic in both
      directions).  Scoped by MICA_WINO_MIN_CICO to the measured-win
      channel geometries.
  (b) the Pallas wino VJP (ops/wino_pallas.py round-5) — custom_vjp
      around the emitter-layout kernel (MICA_TRAIN_WINO_PALLAS=1).

Run alone on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_train_wino.py
"""

import os
import sys
import time

import numpy as np

FWD_TFLOP_PER_SAMPLE = 7.35
BATCH = 8

# (label, env overrides)
CONFIGS = [
    ("baseline (direct convs)", {}),
    ("xla-wino big2 (512x256+256x512)",
     {"MICA_TRAIN_WINO": "1", "MICA_WINO": "1",
      "MICA_WINO_MIN_CICO": "131072"}),
    ("xla-wino all5 (>=256x128)",
     {"MICA_TRAIN_WINO": "1", "MICA_WINO": "1",
      "MICA_WINO_MIN_CICO": "32768"}),
    ("pallas-wino vjp (auto geometries)",
     {"MICA_TRAIN_WINO_PALLAS": "1"}),
    # round-5 bisect finding (scripts/bisect_train_wino.py on silicon):
    # the three AD elementwise Pallas kernels (_in_apply_ad_T,
    # _in_bwd_stats_T, _in_bwd_apply_T) each crash the remote
    # tpu_compile_helper STANDALONE, while the wino conv kernel compiles
    # and runs in both directions (fwd 120.6 ms, dx 111.8 ms at
    # 512<->256 batch 8).  XLA elementwise + Pallas wino convs is the
    # viable formulation on this platform.
    ("pallas-wino vjp, XLA elementwise",
     {"MICA_TRAIN_WINO_PALLAS": "1", "MICA_WINO_AD_XLA_EW": "1"}),
    # the memory-fit configuration (see scripts/aot_seed_train_step.py):
    # wino VJP on the two big stage-3 geometries only — each enabled
    # conv site adds its xh residual to the step's HLO-temp peak, and
    # the all-five set exceeds the 15.75 G HBM in the v5e AOT compile
    ("pallas-wino vjp big2, XLA elementwise",
     {"MICA_TRAIN_WINO_PALLAS": "1", "MICA_WINO_AD_XLA_EW": "1",
      "MICA_WINO_PALLAS": "1", "MICA_WINO_PALLAS_MIN": "131072"}),
]


def run_config(label, env):
    import jax
    import jax.numpy as jnp

    from mica_tpu.train.data import synthetic_batch
    from mica_tpu.train.loss import task_lambdas
    from mica_tpu.train.trainer import Trainer

    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        trainer = Trainer(base_filters=64, dtype=jnp.bfloat16,
                          use_mesh=False, use_augmentation=True,
                          remat=True, remat_scope="blocks")
        state = trainer.init_state((1, 64, 64, 64, 1))
        batch_dev = tuple(jnp.asarray(b) for b in
                          synthetic_batch(batch_size=BATCH, size=64))
        lambdas = jnp.asarray(task_lambdas(0), jnp.float32)
        step = trainer.train_step_for_epoch(0)
        key = jax.random.PRNGKey(0)

        def force(m):
            # np readback: block_until_ready does not synchronize through
            # the axon tunnel (bench_train.py's force())
            return float(np.asarray(m["total_loss"]))

        t0 = time.time()
        state, metrics = step(state, batch_dev, lambdas, key)
        force(metrics)
        compile_s = time.time() - t0
        iters = 4
        t0 = time.time()
        for _ in range(iters):
            state, metrics = step(state, batch_dev, lambdas, key)
        force(metrics)
        dt = (time.time() - t0) / iters
        tf = 3 * FWD_TFLOP_PER_SAMPLE * BATCH
        loss = force(metrics)
        print(f"{label:40s} {dt:7.3f} s/step  {BATCH/dt:5.2f} samples/s  "
              f"{tf/dt:6.1f} TF/s  compile {compile_s:6.1f}s  "
              f"loss {loss:.4f} finite={np.isfinite(loss)}", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{label:40s} FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    only = sys.argv[1:] or None
    for i, (label, env) in enumerate(CONFIGS):
        if only and str(i) not in only:
            continue
        run_config(label, env)


if __name__ == "__main__":
    main()
