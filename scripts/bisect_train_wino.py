"""Bisect the wino-VJP training-step compile-helper crash (round-5).

The full batch-8 train step with ANY training-wino formulation (XLA
z-wino forced, Pallas custom VJP) dies in the remote tpu_compile_helper
(HTTP 500, no stderr) — the same service ceiling scripts/
bisect_batch12.py hit for batch!=8 graphs.  The AOT v5e *topology*
compiler accepts the AD op fwd+bwd at production geometry
(tests/test_wino_pallas.py::test_wino_pallas_ad_aot_compiles_for_v5e),
so the kernel is not the problem; this script walks up the graph-size
ladder on the LIVE device to find the ceiling and to salvage op-level
silicon measurements.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u \
         scripts/bisect_train_wino.py [probe...]
probes: op opgrad rdb stage step step_noaug step_norematheads
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("MICA_TRAIN_WINO_PALLAS", "1")


def fence(x):
    import jax

    jax.block_until_ready(x)
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args):
    t0 = time.time()
    out = fn(*args)
    fence(out)
    compile_s = time.time() - t0
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        fence(out)
        best = min(best, time.time() - t0)
    return compile_s, best


def probe_op(grad: bool):
    import jax
    import jax.numpy as jnp

    from mica_tpu.ops.wino_pallas import (wino_conv3d_in_relu_pallas,
                                          wino_conv3d_in_relu_pallas_ad)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 64, 64, 64, 512)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 512, 256)) * 0.05,
                    jnp.float32)
    b = jnp.zeros((256,), jnp.float32)

    if grad:
        def loss(x, k, b):
            y = wino_conv3d_in_relu_pallas_ad((x,), k, b, 1e-5, False)
            return jnp.sum(y.astype(jnp.float32))

        fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    else:
        fn = jax.jit(lambda x, k, b: wino_conv3d_in_relu_pallas(x, k, b))
    c, t = timeit(fn, x, k, b)
    print(f"op grad={grad}: compile {c:.1f}s  run {t * 1e3:.1f} ms",
          flush=True)


def probe_piece(which: str):
    """Compile each backward component alone (ceiling attribution)."""
    import jax
    import jax.numpy as jnp

    import mica_tpu.ops.wino_pallas as wp

    rng = np.random.default_rng(0)
    d = h = w = 64
    b_sz, co = 8, 256
    r = w * b_sz
    xh = jnp.asarray(rng.standard_normal((d, h, r, co)), jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal((d, h, r, co)), jnp.bfloat16)

    if which == "applyad":
        ms = jnp.asarray(rng.standard_normal((2, r, co)), jnp.float32)
        fn = jax.jit(wp._in_apply_ad_T)
        c, t = timeit(fn, xh, ms)
    elif which == "bwdstats":
        fn = jax.jit(lambda a, b: wp._in_bwd_stats_T(a, b, b_sz))
        c, t = timeit(fn, xh, dy)
    elif which == "bwdapply":
        ms = jnp.asarray(rng.standard_normal((3, r, co)), jnp.float32)
        fn = jax.jit(wp._in_bwd_apply_T)
        c, t = timeit(fn, xh, dy, ms)
    elif which == "dxwino":
        k = jnp.asarray(rng.standard_normal((3, 3, 3, co, 512)) * 0.05,
                        jnp.float32)

        def dx(dc):
            wt = wp._transform_weights(k, dc.dtype)
            out, _ = wp._wino_T([dc], wt, jnp.zeros((512,), jnp.float32),
                                w, b_sz, False, with_stats=False)
            return out

        fn = jax.jit(dx)
        c, t = timeit(fn, dy)
    else:
        raise ValueError(which)
    print(f"{which}: compile {c:.1f}s  run {t * 1e3:.1f} ms", flush=True)


def probe_module(which: str):
    import jax
    import jax.numpy as jnp

    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import EncoderStage, ResidualDenseBlock

    rng = np.random.default_rng(0)
    if which == "rdb":
        mod = ResidualDenseBlock(256, dtype=jnp.bfloat16)
    else:
        mod = EncoderStage(256, 512, dtype=jnp.bfloat16, remat=True)
    x = jnp.asarray(rng.standard_normal((8, 64, 64, 64, 256)) * 0.3,
                    jnp.bfloat16)
    params = init_params_fast(mod, (x, 0.0, True))

    def loss(p, x):
        out = mod.apply({"params": p}, x, 0.0, True,
                        rngs={"dropout": jax.random.PRNGKey(0)})
        return jnp.sum(out.astype(jnp.float32))

    fn = jax.jit(jax.grad(loss))
    c, t = timeit(fn, params, x)
    print(f"{which} grad: compile {c:.1f}s  run {t * 1e3:.1f} ms", flush=True)


def probe_step(aug: bool = True, remat_heads: bool = True):
    import jax
    import jax.numpy as jnp

    from mica_tpu.train.data import synthetic_batch
    from mica_tpu.train.loss import task_lambdas
    from mica_tpu.train.trainer import Trainer

    trainer = Trainer(base_filters=64, dtype=jnp.bfloat16, use_mesh=False,
                      use_augmentation=aug, remat=True,
                      remat_scope="blocks")
    state = trainer.init_state((1, 64, 64, 64, 1))
    batch_dev = tuple(jnp.asarray(b) for b in
                      synthetic_batch(batch_size=8, size=64))
    lambdas = jnp.asarray(task_lambdas(0), jnp.float32)
    step = trainer.train_step_for_epoch(0)
    c, t = timeit(lambda: step(state, batch_dev, lambdas,
                               jax.random.PRNGKey(0))[1]["total_loss"])
    print(f"step aug={aug}: compile {c:.1f}s  {t:.3f} s/step "
          f"({8 / t:.2f} samples/s)", flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    probes = sys.argv[1:] or ["op", "opgrad", "rdb", "stage", "step"]
    for p in probes:
        try:
            if p == "op":
                probe_op(False)
            elif p == "opgrad":
                probe_op(True)
            elif p.startswith("opgrad_"):
                # component-substitution probes: swap backward pieces
                # for XLA equivalents to find the crashing one
                env = {"opgrad_xla_ew": {"MICA_WINO_AD_XLA_EW": "1"},
                       "opgrad_xla_dx": {"MICA_WINO_AD_XLA_DX": "1"},
                       "opgrad_xla_both": {"MICA_WINO_AD_XLA_EW": "1",
                                           "MICA_WINO_AD_XLA_DX": "1"}}[p]
                saved = {k: os.environ.get(k) for k in env}
                os.environ.update(env)
                try:
                    probe_op(True)
                finally:
                    for k, v in saved.items():
                        if v is None:
                            os.environ.pop(k, None)
                        else:
                            os.environ[k] = v
            elif p in ("applyad", "bwdstats", "bwdapply", "dxwino"):
                probe_piece(p)
            elif p == "rdb":
                probe_module("rdb")
            elif p == "stage":
                probe_module("stage")
            elif p == "step":
                probe_step()
            elif p == "step_noaug":
                probe_step(aug=False)
        except Exception as e:  # noqa: BLE001
            print(f"{p}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
