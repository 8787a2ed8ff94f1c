"""Training-step batch sweep under the 32 MB scoped-VMEM option.

VERDICT r2 #5: the batch-12/16 "XLA compiler crash" predates the vmem32
default; retry with remat_scope='blocks' now that the trainer compiles
its step with the same option as the inference engine.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_train_batches.py [batches...]
"""

import sys
import time

import numpy as np


def run_one(batch: int, iters: int = 3):
    import jax
    import jax.numpy as jnp

    from mica_tpu.train.data import synthetic_batch
    from mica_tpu.train.loss import task_lambdas
    from mica_tpu.train.trainer import Trainer

    trainer = Trainer(base_filters=64, dtype=jnp.bfloat16, use_mesh=False,
                      use_augmentation=True, remat=True,
                      remat_scope="blocks")
    state = trainer.init_state((1, 64, 64, 64, 1))
    batch_np = synthetic_batch(batch_size=batch, size=64)
    batch_dev = tuple(jnp.asarray(b) for b in batch_np)
    lambdas = jnp.asarray(task_lambdas(0), jnp.float32)
    step = trainer.train_step_for_epoch(0)
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    state, metrics = step(state, batch_dev, lambdas, key)
    jax.block_until_ready(metrics["total_loss"])
    loss0 = float(np.asarray(metrics["total_loss"]))
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, batch_dev, lambdas, key)
    jax.block_until_ready(metrics["total_loss"])
    _ = float(np.asarray(metrics["total_loss"]))
    dt = (time.time() - t0) / iters
    print(f"batch {batch:2d}: {dt:.3f} s/step = {batch / dt:.2f} "
          f"samples/s/chip ({3 * 7.35 * batch / dt:.1f} model TFLOP/s, "
          f"compile {compile_s:.0f}s, loss0 {loss0:.3f})", flush=True)


def main():
    batches = [int(b) for b in sys.argv[1:]] or [8, 12, 16]
    import gc

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for b in batches:
        try:
            run_one(b)
        except Exception as e:  # noqa: BLE001
            print(f"batch {b:2d}: {type(e).__name__}: {e}"[:300], flush=True)
        jax.clear_caches()
        gc.collect()


if __name__ == "__main__":
    main()
