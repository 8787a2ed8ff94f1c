"""Hardware A/B: training step with and without rematerialization.

Remat re-runs ~one forward in the backward pass (~33% of the step
FLOPs) to keep activations out of HBM.  The batch-8 remat step measures
2.66 s (3.01 samples/s/chip); if a no-remat configuration fits v5e's
15.75 GB at any batch, its samples/s may beat that.  Tries each
(remat, batch) on the device, catching OOM per config.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_train_remat.py
"""

import gc
import time

import numpy as np

# (remat, remat_scope, batch)
# Measured on v5e (2026-08-19): blocks/8 wins at 2.47 s/step
# (both/8 2.66, stages/8 2.64); blocks/12, stages/6 and no-remat die in
# the XLA compiler (live ranges / compile-helper failure).
CONFIGS = [
    (True, "blocks", 8),   # production default
]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mica_tpu.train.data import synthetic_batch
    from mica_tpu.train.loss import task_lambdas
    from mica_tpu.train.trainer import Trainer

    for remat, scope, batch in CONFIGS:
        try:
            trainer = Trainer(base_filters=64, dtype=jnp.bfloat16,
                              use_mesh=False, use_augmentation=True,
                              remat=remat, remat_scope=scope)
            state = trainer.init_state((1, 64, 64, 64, 1))
            batch_np = synthetic_batch(batch_size=batch, size=64)
            batch_dev = tuple(jnp.asarray(b) for b in batch_np)
            lambdas = jnp.asarray(task_lambdas(0), jnp.float32)
            step = trainer.train_step_for_epoch(0)
            key = jax.random.PRNGKey(0)

            t0 = time.time()
            state, metrics = step(state, batch_dev, lambdas, key)
            jax.block_until_ready(metrics["total_loss"])
            loss = float(np.asarray(metrics["total_loss"]))
            compile_s = time.time() - t0

            iters = 3
            t0 = time.time()
            for _ in range(iters):
                state, metrics = step(state, batch_dev, lambdas, key)
            jax.block_until_ready(metrics["total_loss"])
            _ = float(np.asarray(metrics["total_loss"]))
            dt = (time.time() - t0) / iters
            print(f"remat={remat!s:5s}/{scope:6s} batch={batch}: {dt:6.3f} s/step  "
                  f"{batch / dt:5.2f} samples/s  "
                  f"[compile {compile_s:.0f}s, loss {loss:.3f}]", flush=True)
        except Exception as e:  # noqa: BLE001 - OOM and friends per config
            print(f"remat={remat!s:5s}/{scope:6s} batch={batch}: FAILED "
                  f"{type(e).__name__}: {e}"[:300], flush=True)
        finally:
            state = batch_dev = metrics = step = trainer = None  # noqa: F841
            jax.clear_caches()
            gc.collect()


if __name__ == "__main__":
    main()
