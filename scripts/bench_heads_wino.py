"""A/B the padded-Co heads conv1 path in the full model step (round-5).

The trace (scripts/trace_step.py, 2026-08-21) put the fused heads'
192->192 conv1 at 38.3 ms/dispatch (fusion.38) plus the 805 MB FPN
concat it reads (fusion.39).  ops/wino_pallas.wino_conv3d_pallas_padded
runs it as a 256-out emitter-layout Winograd kernel with the concat
absorbed as multi-operand reads; the pad channels are sliced away for
free by the cascade.  This script measures the full model step both
ways; a win goes into _MEASURED_HEADS_WINS.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_heads_wino.py
"""

import os
import time

import numpy as np

BATCH = 8
CHUNK = 6


def fence(x):
    import jax

    jax.block_until_ready(x)
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def run_config(label, heads_env):
    import jax
    import jax.numpy as jnp

    from mica_tpu.infer.engine import SlidingWindowPredictor
    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    saved = os.environ.get("MICA_WINO_HEADS")
    if heads_env is None:
        os.environ.pop("MICA_WINO_HEADS", None)
    else:
        os.environ["MICA_WINO_HEADS"] = heads_env
    try:
        rng = np.random.default_rng(0)
        model = MICA(base=64, dtype=jnp.bfloat16)
        params = init_params_fast(
            model,
            (jnp.zeros((1, 64, 64, 64, 1), jnp.float32),
             jnp.zeros((1, 64, 64, 64, 24), jnp.float32)),
        )
        pred = SlidingWindowPredictor(params, batch_size=BATCH,
                                      dtype=jnp.bfloat16)
        step = pred._build_model_step(True, full=False)
        wins = jnp.asarray(
            rng.random((CHUNK, BATCH, 64, 64, 64, 1), np.float32))
        afs = jnp.asarray(
            (rng.random((CHUNK, BATCH, 64, 64, 64)) * 2**24).astype(
                np.uint32))
        t0 = time.time()
        out = step(pred.params, wins, afs, CHUNK)
        fence(out)
        compile_s = time.time() - t0
        n = CHUNK * BATCH
        best = 1e30
        for _ in range(4):
            t0 = time.time()
            out = step(pred.params, wins, afs, CHUNK)
            fence(out)
            best = min(best, time.time() - t0)
        print(f"{label:28s} {best / n * 1e3:6.2f} ms/window "
              f"({n / best:5.1f} win/s)  compile {compile_s:6.1f}s",
              flush=True)
        return best / n
    except Exception as e:  # noqa: BLE001
        print(f"{label:28s} FAILED {type(e).__name__}: {str(e)[:250]}",
              flush=True)
        return None
    finally:
        if saved is None:
            os.environ.pop("MICA_WINO_HEADS", None)
        else:
            os.environ["MICA_WINO_HEADS"] = saved
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
    configs = [("heads direct (production)", "0"),
               ("heads wino padded-Co", "1")]
    only = sys.argv[1:] or None
    for i, (label, env) in enumerate(configs):
        if only and str(i) not in only:
            continue
        run_config(label, env)


if __name__ == "__main__":
    main()
