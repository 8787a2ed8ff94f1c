"""Measure the batch>8 wino-fallback cliff (VERDICT r4 #3).

The Pallas Winograd gate declines row sizes R = W*B > 512 (batch 12 at
64-cube windows crashes the XLA TPU compile helper INSIDE the kernel,
scripts/bisect_batch12.py), so batches beyond 8 silently fall back to
direct convs.  Nobody had measured what that fallback costs: this
script times the raw model step at batch 8 (wino auto-on) vs batch 8
(wino forced off) vs batch 12/16 (direct by necessity), at a constant
total window count, and prints ms/window.  The result feeds the
auto-batch rule in infer/engine.py.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_batch_cliff.py
"""

import os
import time

import numpy as np

TOTAL_WINDOWS = 48


def fence(x):
    import jax

    jax.block_until_ready(x)
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def run_config(label, batch, wino_env):
    import jax
    import jax.numpy as jnp

    from mica_tpu.infer.engine import SlidingWindowPredictor
    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    saved = os.environ.get("MICA_WINO_PALLAS")
    if wino_env is None:
        os.environ.pop("MICA_WINO_PALLAS", None)
    else:
        os.environ["MICA_WINO_PALLAS"] = wino_env
    try:
        rng = np.random.default_rng(0)
        model = MICA(base=64, dtype=jnp.bfloat16)
        params = init_params_fast(
            model,
            (jnp.zeros((1, 64, 64, 64, 1), jnp.float32),
             jnp.zeros((1, 64, 64, 64, 24), jnp.float32)),
        )
        pred = SlidingWindowPredictor(params, batch_size=batch,
                                      dtype=jnp.bfloat16)
        step = pred._build_model_step(True, full=False)
        chunk = max(1, TOTAL_WINDOWS // batch)
        wins = jnp.asarray(
            rng.random((chunk, batch, 64, 64, 64, 1), np.float32))
        afs = jnp.asarray(
            (rng.random((chunk, batch, 64, 64, 64)) * 2**24).astype(
                np.uint32))
        t0 = time.time()
        out = step(pred.params, wins, afs, chunk)
        fence(out)
        compile_s = time.time() - t0
        n = chunk * batch
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            out = step(pred.params, wins, afs, chunk)
            fence(out)
            best = min(best, time.time() - t0)
        print(f"{label:34s} {best / n * 1e3:6.1f} ms/window "
              f"({n / best:5.1f} win/s)  compile {compile_s:6.1f}s",
              flush=True)
        return best / n
    except Exception as e:  # noqa: BLE001
        print(f"{label:34s} FAILED {type(e).__name__}: {str(e)[:250]}",
              flush=True)
        return None
    finally:
        if saved is None:
            os.environ.pop("MICA_WINO_PALLAS", None)
        else:
            os.environ["MICA_WINO_PALLAS"] = saved
        import gc

        import jax

        jax.clear_caches()
        gc.collect()


def main():
    import sys

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    configs = [
        ("batch 8, wino auto (production)", 8, None),
        ("batch 8, wino off (direct)", 8, "0"),
        ("batch 12, direct (R>512 gate)", 12, None),
        ("batch 16, direct (R>512 gate)", 16, None),
    ]
    only = sys.argv[1:] or None
    for i, (label, batch, env) in enumerate(configs):
        if only and str(i) not in only:
            continue
        run_config(label, batch, env)


if __name__ == "__main__":
    main()
