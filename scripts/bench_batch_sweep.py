"""Model-step ms/window vs batch size under the vmem32 compile option.

The round-2 batch-16 A/B (61.8 vs 62.9 ms/window, "not worth 2x memory")
predates the 32 MB scoped-VMEM default and the packed-conv/loop work; if
a larger batch now wins >1.5%, the engine's mixed-tail dispatch would be
worth building (VERDICT r2 asks for every remaining model-program lever
to be measured, not assumed).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_batch_sweep.py
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
    model = MICA(base=64, dtype=jnp.bfloat16)
    params = init_params_fast(
        model,
        (jnp.zeros((1, 64, 64, 64, 1), jnp.float32),
         jnp.zeros((1, 64, 64, 64, 24), jnp.float32)),
    )

    def fence(x):
        jax.block_until_ready(x)
        _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    for bsz, chunk in ((8, 8), (12, 5), (16, 4)):
        try:
            pred = SlidingWindowPredictor(params, batch_size=bsz,
                                          chunk=chunk, dtype=jnp.bfloat16)
            step = pred._build_model_step(True, full=False)
            n = chunk * bsz
            wins = jnp.asarray(
                rng.random((chunk, bsz, 64, 64, 64, 1), np.float32))
            afs = jnp.asarray(
                (rng.random((chunk, bsz, 64, 64, 64)) * 2**24)
                .astype(np.uint32))
            t0 = time.time()
            out = step(pred.params, wins, afs, chunk)
            fence(out)
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                out = step(pred.params, wins, afs, chunk)
                fence(out)
                best = min(best, time.time() - t0)
            print(f"batch {bsz:2d} chunk {chunk}: "
                  f"{best / n * 1e3:6.2f} ms/window "
                  f"({best * 1e3:7.1f} ms / {n} windows, "
                  f"compile {compile_s:.0f}s)", flush=True)
            del pred, step, wins, afs, out
            jax.clear_caches()
            import gc

            gc.collect()
        except Exception as e:  # noqa: BLE001
            print(f"batch {bsz:2d} chunk {chunk}: "
                  f"{type(e).__name__}: {e}"[:200], flush=True)


if __name__ == "__main__":
    main()
