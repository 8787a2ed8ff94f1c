"""Ground-truth timing of ONE model_step dispatch (chunk 8 x batch 8),
fenced, repeated — to pin down ms/window without loop interactions.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_model_dispatch.py
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
    pred = SlidingWindowPredictor(params, batch_size=8, dtype=jnp.bfloat16)
    step = pred._build_model_step(True, full=False)

    wins = jnp.asarray(rng.random((8, 8, 64, 64, 64, 1), np.float32))
    afs = jnp.asarray((rng.random((8, 8, 64, 64, 64)) * 2**24).astype(np.uint32))

    def fence(x):
        jax.block_until_ready(x)
        _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    out = step(pred.params, wins, afs, 8)
    fence(out)
    for trial in range(4):
        t0 = time.time()
        out = step(pred.params, wins, afs, 8)
        fence(out)
        dt = time.time() - t0
        print(f"dispatch {trial}: {dt * 1e3:7.1f} ms "
              f"({dt / 64 * 1e3:5.1f} ms/window)")

    # back-to-back x3 without fencing in between
    t0 = time.time()
    for _ in range(3):
        out = step(pred.params, wins, afs, 8)
    fence(out)
    dt = (time.time() - t0) / 3
    print(f"chained x3  : {dt * 1e3:7.1f} ms ({dt / 64 * 1e3:5.1f} ms/window)")


if __name__ == "__main__":
    main()
