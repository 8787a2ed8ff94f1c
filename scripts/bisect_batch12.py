"""Isolate the batch-12/16 training-step XLA TPU compiler crash.

VERDICT r3 #2: batch 12/16 training steps die inside the XLA TPU
compiler itself (tpu_compile_helper subprocess exit 1) under every
retry (vmem32, remat scopes).  This script bisects the step into
compile-only probes (``.lower().compile()``, no execution) so the crash
is pinned to a component, and times the in-step microbatch-accumulation
workaround (exact: the mean-of-means gradient over equal microbatches
equals the full-batch gradient; InstanceNorm/dropout/augmentation are
all per-sample).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bisect_batch12.py [probe ...]
Probes: fwd grad_conv grad_stage3 grad_heads grad_model step micro time_micro
"""

import sys
import time
import traceback

import numpy as np


def _compile(name, make):
    import jax

    t0 = time.time()
    try:
        fn, args = make()
        if not hasattr(fn, "lower"):
            fn = jax.jit(fn)
        fn.lower(*args).compile()
        print(f"  {name:28s}: COMPILES ({time.time() - t0:.0f}s)",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:180]
        print(f"  {name:28s}: FAILS after {time.time() - t0:.0f}s — "
              f"{type(e).__name__}: {msg}", flush=True)
        return False


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA, EncoderStage, instance_norm

    B = int(next((a for a in sys.argv[1:] if a.isdigit()), 12))
    probes = [a for a in sys.argv[1:] if not a.isdigit()] or [
        "fwd", "grad_conv", "grad_stage3", "grad_heads", "grad_model",
        "micro", "time_micro"]
    print(f"backend: {jax.default_backend()}  batch {B}  probes {probes}",
          flush=True)
    S = 64

    def model_and_params(remat=True):
        m = MICA(base=64, dtype=jnp.bfloat16, remat=remat,
                 remat_scope="blocks")
        p = init_params_fast(
            m, (jnp.zeros((1, S, S, S, 1), jnp.float32),
                jnp.zeros((1, S, S, S, 24), jnp.float32)))
        return m, p

    if "fwd" in probes:
        m, p = model_and_params()
        x = jax.ShapeDtypeStruct((B, S, S, S, 1), jnp.float32)
        af = jax.ShapeDtypeStruct((B, S, S, S, 24), jnp.float32)
        _compile("forward (inference)",
                 lambda: (lambda xx, aa: m.apply({"params": p}, xx, aa),
                          (x, af)))

    if "fwd_nowino" in probes:
        import os as _os

        _os.environ["MICA_WINO_PALLAS"] = "0"
        try:
            m, p = model_and_params()
            x = jax.ShapeDtypeStruct((B, S, S, S, 1), jnp.float32)
            af = jax.ShapeDtypeStruct((B, S, S, S, 24), jnp.float32)
            _compile("forward (inference, wino OFF)",
                     lambda: (lambda xx, aa: m.apply({"params": p}, xx, aa),
                              (x, af)))
        finally:
            del _os.environ["MICA_WINO_PALLAS"]

    if "fwd_train" in probes:
        # training-mode forward only (no grad): isolates forward-graph
        # constructs from autodiff
        m, p = model_and_params()
        x = jax.ShapeDtypeStruct((B, S, S, S, 1), jnp.float32)
        af = jax.ShapeDtypeStruct((B, S, S, S, 24), jnp.float32)
        _compile(
            "forward (train mode)",
            lambda: (lambda xx, aa: m.apply(
                {"params": p}, xx, aa, dropout_rate=0.1, train=True,
                rngs={"dropout": jax.random.PRNGKey(1)}), (x, af)))

    if "augment" in probes:
        from mica_tpu.train import augment as aug

        def make():
            d = jax.ShapeDtypeStruct((B, 1, S, S, S), jnp.float32)
            a = jax.ShapeDtypeStruct((B, 24, S, S, S), jnp.float32)
            t = jax.ShapeDtypeStruct((B, 3, S, S, S), jnp.int32)
            return (lambda dd, aa, tt: aug.augment_batch(
                jax.random.PRNGKey(0), dd, aa, tt), (d, a, t))

        _compile("augment_batch alone", make)

    if "grad_conv" in probes:
        # one 256->512 conv + IN + relu, the dominant training conv
        from jax import lax

        def make():
            k = jnp.zeros((3, 3, 3, 256, 512), jnp.float32)

            def f(x, k):
                out = lax.conv_general_dilated(
                    x, k.astype(x.dtype), (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                return jnp.sum(
                    jax.nn.relu(instance_norm(out)).astype(jnp.float32))

            g = jax.grad(f, argnums=(0, 1))
            x = jax.ShapeDtypeStruct((B, S, S, S, 256), jnp.bfloat16)
            return (lambda xx: g(xx, k), (x,))

        _compile("grad single 256->512 conv", make)

    if "grad_stage3" in probes:
        def make():
            st = EncoderStage(256, 512, dtype=jnp.bfloat16, remat=True)
            xin = jnp.zeros((1, S, S, S, 256), jnp.float32)
            pp = st.init(jax.random.PRNGKey(0), xin, 0.0, False)["params"]

            def f(xx):
                out = st.apply({"params": pp}, xx, 0.1, True,
                               rngs={"dropout": jax.random.PRNGKey(1)})
                return jnp.sum(out.astype(jnp.float32))

            x = jax.ShapeDtypeStruct((B, S, S, S, 256), jnp.bfloat16)
            return (jax.grad(f), (x,))

        _compile("grad encoder stage 3 (remat)", make)

    if "grad_heads" in probes:
        def make():
            m, p = model_and_params()

            def f(params, xx, aa):
                outs = m.apply({"params": params}, xx, aa,
                               dropout_rate=0.1, train=True,
                               rngs={"dropout": jax.random.PRNGKey(1)})
                return sum(jnp.sum(o) for o in outs)

            x = jax.ShapeDtypeStruct((B, S, S, S, 1), jnp.float32)
            af = jax.ShapeDtypeStruct((B, S, S, S, 24), jnp.float32)
            return (jax.grad(f), (p, x, af))

        _compile("grad full model (remat)", make)

    if "grad_model" in probes or "step" in probes:
        from mica_tpu.train.loss import task_lambdas
        from mica_tpu.train.trainer import Trainer

        trainer = Trainer(base_filters=64, dtype=jnp.bfloat16,
                          use_mesh=False, use_augmentation=True, remat=True,
                          remat_scope="blocks")
        state = trainer.init_state((1, S, S, S, 1))
        step = trainer.train_step_for_epoch(0)
        lambdas = jnp.asarray(task_lambdas(0), jnp.float32)

        def make():
            b = tuple(jax.ShapeDtypeStruct(s, d) for s, d in (
                ((B, S, S, S), jnp.float32),
                ((B, 24, S, S, S), jnp.float32),
                ((B, S, S, S), jnp.int32),
                ((B, S, S, S), jnp.int32),
                ((B, S, S, S), jnp.int32),
            ))
            key = jax.ShapeDtypeStruct((2,), jnp.uint32)
            return (step, (state, b, lambdas, key))

        _compile("full train step", make)

    if "micro" in probes or "time_micro" in probes or "micro_noaug" in probes:
        from mica_tpu.train.loss import task_lambdas
        from mica_tpu.train.trainer import Trainer

        use_aug = "micro_noaug" not in probes
        impl = "scan" if "scan" in sys.argv else "unroll"
        micro = 8 if B % 8 == 0 else (6 if B % 6 == 0 else B // 2)
        trainer = Trainer(base_filters=64, dtype=jnp.bfloat16,
                          use_mesh=False, use_augmentation=use_aug,
                          remat=True, remat_scope="blocks",
                          microbatch=micro, microbatch_impl=impl)
        state = trainer.init_state((1, S, S, S, 1))
        step = trainer.train_step_for_epoch(0)
        lambdas = jnp.asarray(task_lambdas(0), jnp.float32)
        from mica_tpu.train.data import synthetic_batch

        bnp = synthetic_batch(batch_size=B, size=S)
        bdev = tuple(jnp.asarray(b) for b in bnp)
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        try:
            state, metrics = step(state, bdev, lambdas, key)
            jax.block_until_ready(metrics["total_loss"])
            loss0 = float(np.asarray(metrics["total_loss"]))
            print(f"  microbatch {B}={B//micro}x{micro}          : COMPILES+RUNS "
                  f"({time.time() - t0:.0f}s, loss {loss0:.3f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  microbatch {B}={B//micro}x{micro}          : FAILS — "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)
            traceback.print_exc()
            return
        if "time_micro" in probes:
            iters = 3
            t0 = time.time()
            for _ in range(iters):
                state, metrics = step(state, bdev, lambdas, key)
            jax.block_until_ready(metrics["total_loss"])
            _ = float(np.asarray(metrics["total_loss"]))
            dt = (time.time() - t0) / iters
            print(f"  batch {B} ({B//micro}x{micro} microbatch): {dt:.3f} s/step = "
                  f"{B / dt:.2f} samples/s/chip "
                  f"({3 * 7.35 * B / dt:.1f} model TFLOP/s)", flush=True)


if __name__ == "__main__":
    main()
