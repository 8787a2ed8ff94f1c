"""Training-step throughput experiments on the real chip (VERDICT #5).

Measures step time / samples/s / achieved model FLOP/s for the full-size
network at several (batch, remat, dtype) points to pick the production
configuration and quantify the cost of rematerialization.

Run alone on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
    python -u scripts/bench_train.py
"""

import time

import numpy as np

FWD_TFLOP_PER_SAMPLE = 7.35  # PERFORMANCE.md FLOP count, 64-cube window
V5E_BF16_PEAK_TFLOPS = 197.0


def force(r):
    import jax

    jax.block_until_ready(r)
    return np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def measure(batch, remat, dtype_name):
    import jax
    import jax.numpy as jnp

    from mica_tpu.train.data import synthetic_batch
    from mica_tpu.train.loss import task_lambdas
    from mica_tpu.train.trainer import Trainer

    dtype = jnp.bfloat16 if dtype_name == "bf16" else None
    trainer = Trainer(base_filters=64, dtype=dtype, use_mesh=False,
                      use_augmentation=True, remat=remat)
    state = trainer.init_state((1, 64, 64, 64, 1))
    batch_np = synthetic_batch(batch_size=batch, size=64)
    batch_dev = tuple(jnp.asarray(b) for b in batch_np)
    lambdas = jnp.asarray(task_lambdas(0), jnp.float32)
    step = trainer.train_step_for_epoch(0)
    key = jax.random.PRNGKey(0)

    try:
        t0 = time.time()
        state, metrics = step(state, batch_dev, lambdas, key)
        force(metrics["total_loss"])
        compile_s = time.time() - t0
        iters = 3
        t0 = time.time()
        for _ in range(iters):
            state, metrics = step(state, batch_dev, lambdas, key)
        force(metrics["total_loss"])
        dt = (time.time() - t0) / iters
    except Exception as e:
        print(f"batch={batch} remat={remat} {dtype_name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return
    tf = 3 * FWD_TFLOP_PER_SAMPLE * batch  # fwd + ~2x bwd
    print(
        f"batch={batch} remat={int(remat)} {dtype_name}: "
        f"{dt*1e3:7.1f} ms/step  {batch/dt:5.2f} samples/s  "
        f"~{tf/dt:6.1f} TF/s ({tf/dt/V5E_BF16_PEAK_TFLOPS*100:4.1f}% peak, "
        f"remat recompute excluded)  compile {compile_s:.0f}s  "
        f"loss {float(metrics['total_loss']):.3f}"
    )


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    for batch, remat, dt in [
        (2, True, "bf16"),
        (4, True, "bf16"),
        (8, True, "bf16"),
        (2, False, "bf16"),
        (4, False, "bf16"),
    ]:
        measure(batch, remat, dt)


if __name__ == "__main__":
    main()
