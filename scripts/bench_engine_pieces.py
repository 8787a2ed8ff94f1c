"""Decompose the dense-map engine loop: model chain vs gather vs scatter.

Times (a) the model_step chain alone (27 chunk-8 dispatches back to
back, block at end), (b) the gather chain, (c) the scatter chain,
(d) the real interleaved loop — so the residual loop overhead above the
model chain is measured, not guessed.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_engine_pieces.py
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
    map_shape = (256, 256, 256)
    volume = rng.random(map_shape, dtype=np.float32)
    af = (rng.random((24,) + map_shape) < 0.01).astype(np.int8)

    model = MICA(base=64, dtype=jnp.bfloat16)
    params = init_params_fast(
        model,
        (jnp.zeros((1, 64, 64, 64, 1), jnp.float32),
         jnp.zeros((1, 64, 64, 64, 24), jnp.float32)),
    )
    pred = SlidingWindowPredictor(params, batch_size=8, dtype=jnp.bfloat16)
    # full predict once: warms every program
    out = pred.predict_volume(volume, af, keep_on_device=True)
    jax.block_until_ready(out["backbone_probability"])
    print("timing after warm run:", {k: round(v, 3) if isinstance(v, float)
                                     else v for k, v in pred.timing.items()})
    del out

    # rebuild the loop pieces exactly as predict_volume does
    from mica_tpu.infer.engine import (window_counts, window_starts,
                                       pad_to_multiple)
    core_n, halo, win = pred.core, pred.halo, pred.window
    shape = map_shape
    nb = list(window_counts(shape, core_n))
    padded_shape = tuple(n * core_n for n in nb)
    pads = [(halo, (padded_shape[a] - core_n) + win - halo - shape[a])
            for a in range(3)]
    np_padded = np.pad(volume, pads)
    padded_map = jnp.asarray(np_padded)
    from mica_tpu.infer.engine import pack_af_encoding
    np_af = np.pad(pack_af_encoding(af), pads)
    padded_af = jnp.asarray(np_af)
    starts = window_starts(shape, core_n).astype(np.int32)
    n_compute = starts.shape[0]
    bsz, C = pred.batch_size, pred.chunk
    nwin = C * bsz
    n_pad = (-n_compute) % nwin
    if n_pad:
        starts = np.concatenate([starts, np.repeat(starts[-1:], n_pad, 0)])
    starts_dev = jnp.asarray(starts)
    gather = pred._build_gather(True)
    scatter = pred._build_scatter()
    model_step = pred._build_model_step(True, full=False)
    z = pred._get_zero_cores(True, np_af.ndim, False)
    z_bb, z_ca, z_aa = (zz[0, 0] for zz in z)
    vols = pred._build_tile_init(padded_shape)(z_bb, z_ca, z_aa)
    jax.block_until_ready(padded_map)
    _ = np.asarray(padded_map[0, 0, 0])

    n_dispatch = starts.shape[0] // nwin

    def fence(x):
        jax.block_until_ready(x)
        leaf = jax.tree_util.tree_leaves(x)[0]
        _ = np.asarray(leaf.ravel()[0])

    # (b) gather chain (keep only the last result alive)
    t0 = time.time()
    for ofs in range(0, starts.shape[0], nwin):
        last = gather(padded_map, padded_af, starts_dev, ofs)
    fence(last)
    t_gather = time.time() - t0
    wins0, afs0, batch0 = last

    # (a) model chain alone (same windows each time — shapes identical)
    t0 = time.time()
    res = None
    for i in range(n_dispatch):
        n_valid = max(0, min(nwin, n_compute - i * nwin))
        res = model_step(pred.params, wins0, afs0, -(-n_valid // bsz))
    fence(res)
    t_model = time.time() - t0

    # (c) scatter chain
    cores0 = res
    t0 = time.time()
    v = vols
    for i in range(n_dispatch):
        n_valid = max(0, min(nwin, n_compute - i * nwin))
        v = scatter(v, cores0, batch0, 0, n_valid)
    fence(v)
    t_scatter = time.time() - t0

    del v, res, cores0, wins0, afs0, batch0, last
    import gc

    gc.collect()

    # (d) interleaved loop (fresh vols: the scatter donated the old ones)
    vols = pred._build_tile_init(padded_shape)(z_bb, z_ca, z_aa)
    fence(vols)
    t0 = time.time()
    for ofs in range(0, starts.shape[0], nwin):
        n_valid = max(0, min(nwin, n_compute - ofs))
        wins, afs, batch = gather(padded_map, padded_af, starts_dev, ofs)
        cores = model_step(pred.params, wins, afs, -(-n_valid // bsz))
        vols = scatter(vols, cores, batch, 0, n_valid)
    fence(vols)
    t_loop = time.time() - t0

    n_chunks_total = n_compute // bsz
    print(f"windows {n_compute}, dispatches {n_dispatch}, "
          f"chunks {n_chunks_total}")
    print(f"gather chain : {t_gather:7.3f} s  "
          f"({t_gather / n_dispatch * 1e3:6.1f} ms/dispatch)")
    print(f"model chain  : {t_model:7.3f} s  "
          f"({t_model / n_chunks_total * 1e3:6.1f} ms/chunk-of-8)")
    print(f"scatter chain: {t_scatter:7.3f} s  "
          f"({t_scatter / n_dispatch * 1e3:6.1f} ms/dispatch)")
    print(f"full loop    : {t_loop:7.3f} s  (pieces sum "
          f"{t_gather + t_model + t_scatter:7.3f} s)")


if __name__ == "__main__":
    main()
