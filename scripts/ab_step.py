"""A/B timing of the inference model step under env-flag variants.

Times ONLY the jitted model step (chunk=1, batch 8, bf16, packed AF) —
the unit the dense-map bench is made of.  Run one variant per process
(the env flags are read at trace time):

    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/ab_step.py
    MICA_NO_PACKED=1      ... scripts/ab_step.py
    MICA_HEADS_BARRIER=1  ... scripts/ab_step.py
"""

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mica_tpu.infer.engine import SlidingWindowPredictor
    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    core = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    halo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    win = core + 2 * halo

    rng = np.random.default_rng(0)
    model = MICA(base=64, dtype=jnp.bfloat16)
    params = init_params_fast(
        model,
        (jnp.zeros((1, 64, 64, 64, 1), jnp.float32),
         jnp.zeros((1, 64, 64, 64, 24), jnp.float32)),
    )
    pred = SlidingWindowPredictor(params, batch_size=batch, dtype=jnp.bfloat16,
                                  chunk=chunk, core=core, halo=halo)
    step = pred._build_model_step(True)

    wins = jnp.asarray(rng.random((chunk, batch, win, win, win, 1), np.float32))
    afs = jnp.asarray((rng.random((chunk, batch, win, win, win)) * 2**24).astype(np.uint32))

    def force(o):
        # block_until_ready returns early under the tunneled axon backend;
        # a 1-element readback is the reliable device fence here
        jax.block_until_ready(o)
        return np.asarray(o[0].ravel()[0])

    t0 = time.time()
    out = step(pred.params, wins, afs, chunk)
    force(out)
    compile_s = time.time() - t0

    iters = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = step(pred.params, wins, afs, chunk)
        force(out)
        best = min(best, (time.time() - t0) / iters)

    flags = {k: v for k, v in os.environ.items() if k.startswith("MICA_")}
    core_vox = chunk * batch * core ** 3
    print(f"batch={batch} chunk={chunk} win={win} core={core} flags={flags or '{}'}  "
          f"step={best*1e3:.1f} ms  ({best*1e3/(chunk*batch):.1f} ms/win, "
          f"{core_vox/best/1e6:.2f} Mcorevox/s)  (compile {compile_s:.0f}s)  "
          f"checksum={float(np.asarray(out[0]).sum()):.4f}")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
