"""A/B XLA compiler options on the model step (chunk 8 x batch 8).

The conv emitter's tiling is constrained by the scoped-VMEM budget
(default 16 MB of v5e's 128 MB); other flags control fusion
aggressiveness.  Each option set compiles the same step and times a
fenced dispatch.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_compiler_options.py
"""

import time

import numpy as np

OPTION_SETS = [
    ("baseline", {}),
    ("vmem64", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem32", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem100", {"xla_tpu_scoped_vmem_limit_kib": "102400"}),
    # finer sweep around the 32 MB winner (the engine default since the
    # first four rows were measured)
    ("vmem24", {"xla_tpu_scoped_vmem_limit_kib": "24576"}),
    ("vmem40", {"xla_tpu_scoped_vmem_limit_kib": "40960"}),
    ("vmem48", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
]


def main():
    import jax
    import jax.numpy as jnp

    from mica_tpu.infer import engine as engine_mod
    from mica_tpu.infer.engine import SlidingWindowPredictor
    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    # the engine now sets the vmem32 option itself; neutralize it so the
    # OUTER jit below owns the compiler options (nested options are
    # rejected by jax)
    engine_mod._heavy_compile_options = lambda: None

    rng = np.random.default_rng(0)
    model = MICA(base=64, dtype=jnp.bfloat16)
    params = init_params_fast(
        model,
        (jnp.zeros((1, 64, 64, 64, 1), jnp.float32),
         jnp.zeros((1, 64, 64, 64, 24), jnp.float32)),
    )
    pred = SlidingWindowPredictor(params, batch_size=8, dtype=jnp.bfloat16)
    wins = jnp.asarray(rng.random((8, 8, 64, 64, 64, 1), np.float32))
    afs = jnp.asarray(
        (rng.random((8, 8, 64, 64, 64)) * 2**24).astype(np.uint32)
    )

    def fence(x):
        jax.block_until_ready(x)
        _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    # grab the raw (unjitted) step fn: rebuild via _build_model_step's
    # internals is private — instead just wrap the jitted one in a fresh
    # jit with options (jit-of-jit inlines)
    step = pred._build_model_step(True, full=False)

    for name, opts in OPTION_SETS:
        try:
            t0 = time.time()
            compiled = (
                jax.jit(lambda p, w, a, n: step(p, w, a, n))
                .lower(pred.params, wins, afs, 8)
                .compile(compiler_options=opts or None)
            )
            compile_s = time.time() - t0
            out = compiled(pred.params, wins, afs, 8)
            fence(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                out = compiled(pred.params, wins, afs, 8)
                fence(out)
                best = min(best, time.time() - t0)
            del out
            print(f"{name:10s} {best * 1e3:7.1f} ms/dispatch "
                  f"({best / 64 * 1e3:5.2f} ms/window)  "
                  f"[compile {compile_s:.0f}s]")
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()
