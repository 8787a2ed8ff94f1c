"""In-situ timing of the engine's three programs on the bench workload.

Times gather / model / scatter chains separately (forced readback) on the
exact dense 256-cube configuration bench.py measures, to locate the
~1.3 s/map gap between 27 x model-step and measured inference_s.

Run alone on the TPU (no concurrent device users).
"""

import time

import numpy as np


def force(r):
    import jax

    jax.block_until_ready(r)
    return np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mica_tpu.infer.engine import SlidingWindowPredictor, pack_af_encoding
    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA
    from mica_tpu.ops.window import window_starts

    rng = np.random.default_rng(0)
    shape = (256, 256, 256)
    volume = rng.random(shape, dtype=np.float32)
    af = (rng.random((24,) + shape) < 0.01).astype(np.int8)

    model = MICA(base=64, dtype=jnp.bfloat16)
    params = init_params_fast(
        model,
        (jnp.zeros((1, 64, 64, 64, 1), jnp.float32),
         jnp.zeros((1, 64, 64, 64, 24), jnp.float32)),
    )

    pred = SlidingWindowPredictor(params, batch_size=8, dtype=jnp.bfloat16, chunk=1)

    # full predict (warm + timed) for the baseline number
    pred.predict_volume(volume, af, keep_on_device=True)
    t0 = time.time()
    out = pred.predict_volume(volume, af, keep_on_device=True)
    force(out["backbone_probability"])
    full_s = time.time() - t0
    print(f"predict_volume end-to-end: {full_s:.3f}s "
          f"(inference {pred.timing['inference']:.3f}s, "
          f"setup {pred.timing['setup']:.3f}s)")

    # rebuild the internal pieces exactly as predict_volume does
    core_n, halo, win = pred.core, pred.halo, pred.window
    nb = [(-(-s // core_n)) for s in shape]
    padded_shape = tuple(n * core_n for n in nb)
    pads = [(halo, (padded_shape[a] - core_n) + win - halo - shape[a])
            for a in range(3)]
    np_padded = np.pad(volume, pads)
    np_af = np.pad(pack_af_encoding(af), pads)

    t0 = time.time()
    padded_map = jnp.asarray(np_padded)
    padded_af = jnp.asarray(np_af)
    force(padded_map)
    print(f"volume uploads: {time.time()-t0:.3f}s "
          f"({(np_padded.nbytes + np_af.nbytes)/1e6:.0f} MB)")

    starts = window_starts(shape, core_n).astype(np.int32)
    bsz = 8
    n_batches = len(starts) // bsz
    starts_dev = jnp.asarray(starts)

    gather = pred._build_gather(True)
    model_step = pred._build_model_step(True)
    scatter = pred._build_scatter()

    # warm each
    wins, afs, batch = gather(padded_map, padded_af, starts_dev, 0)
    cores = model_step(pred.params, wins, afs, 1)
    acc = (
        jnp.zeros(padded_shape, jnp.float32),
        jnp.zeros(padded_shape, jnp.float32),
        jnp.zeros(padded_shape + (20,), jnp.float32),
        jnp.zeros((1, 1, 1), jnp.float32),
    )
    acc = scatter(acc, cores, batch, 0, 8)
    force(acc[0])

    # gather chain
    t0 = time.time()
    for i in range(n_batches):
        wins, afs, batch = gather(padded_map, padded_af, starts_dev, i * bsz)
    force(wins)
    t_gather = time.time() - t0
    print(f"gather x{n_batches}: {t_gather:.3f}s ({t_gather/n_batches*1e3:.1f} ms/call)")

    # model chain (reuse one gathered batch)
    t0 = time.time()
    for i in range(n_batches):
        cores = model_step(pred.params, wins, afs, 1)
    force(cores)
    t_model = time.time() - t0
    print(f"model  x{n_batches}: {t_model:.3f}s ({t_model/n_batches*1e3:.1f} ms/call)")

    # scatter chain (donated accumulators, fixed cores)
    t0 = time.time()
    for i in range(n_batches):
        acc = scatter(acc, cores, batch, 0, 8)
    force(acc[0])
    t_scatter = time.time() - t0
    print(f"scatter x{n_batches}: {t_scatter:.3f}s ({t_scatter/n_batches*1e3:.1f} ms/call)")

    # interleaved chain (the real loop shape, no empty-window work)
    t0 = time.time()
    for i in range(n_batches):
        wins, afs, batch = gather(padded_map, padded_af, starts_dev, i * bsz)
        cores = model_step(pred.params, wins, afs, 1)
        acc = scatter(acc, cores, batch, 0, 8)
    force(acc[0])
    t_all = time.time() - t0
    print(f"interleaved x{n_batches}: {t_all:.3f}s "
          f"(sum of chains {t_gather+t_model+t_scatter:.3f}s)")

    # A/B: model step without the lane-packed small-Cout convs
    import os

    os.environ["MICA_NO_PACKED"] = "1"
    pred2 = SlidingWindowPredictor(params, batch_size=8, dtype=jnp.bfloat16, chunk=1)
    model_step2 = pred2._build_model_step(True)
    cores = model_step2(pred2.params, wins, afs, 1)
    force(cores)
    t0 = time.time()
    for i in range(n_batches):
        cores = model_step2(pred2.params, wins, afs, 1)
    force(cores)
    t2 = time.time() - t0
    print(f"model (no packed convs) x{n_batches}: {t2:.3f}s "
          f"({t2/n_batches*1e3:.1f} ms/call)")
    del os.environ["MICA_NO_PACKED"]


if __name__ == "__main__":
    main()
