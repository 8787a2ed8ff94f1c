"""Hardware A/B of gather/scatter reformulations for the engine loop.

The measured loop anatomy (PERFORMANCE.md): the model chain alone runs
59.2 ms/window chained but the interleaved loop runs 61.6 — the gather
(340 ms/dispatch) and scatter (351 ms/dispatch) programs are only
partially hidden, and both run ~100x above their DMA floor:

  * gather: 128 independent 3-D ``dynamic_slice``s whose innermost
    contiguous run is 256 B (64 voxels * f32) — tiny-burst HBM reads.
    Candidate fix: 3-stage sliced copy per window (x-slab -> y -> z)
    with optimization_barriers so each stage materializes a buffer whose
    slices are contiguous at full-burst granularity.
  * scatter: a 64-iteration ``lax.scan`` of read-modify-write
    ``dynamic_update_slice``s into the big accumulators (192 B bursts).
    Candidate fix: write cores into a ``(n_windows, 48,48,48)`` staging
    array at their WINDOW INDEX (one contiguous 442 KB write each), and
    reorder block-layout -> volume once per map with a single
    transpose+reshape (cores tile the volume exactly in core blend).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_gather_scatter.py
"""

import time

import numpy as np


def fence(x):
    import jax

    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.ravel()[0])


def timeit(fn, *args, reps=5):
    out = fn(*args)
    fence(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        fence(out)
        best = min(best, time.time() - t0)
    return best, out


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("backend:", jax.default_backend(), jax.devices())

    rng = np.random.default_rng(0)
    P = 288  # padded 256-cube (6 cores of 48 + halo margins)
    w, core, halo = 64, 48, 8
    n = 64  # windows per dispatch (chunk 8 x batch 8)

    padded_map = jnp.asarray(rng.random((P, P, P), np.float32))
    padded_af = jnp.asarray(
        (rng.random((P, P, P)) * 2**24).astype(np.uint32))
    # a full 216-window start table (6x6x6 lattice, +halo offset omitted:
    # starts address the padded frame directly as in the engine)
    g = np.arange(6, dtype=np.int32) * core
    starts_np = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                         -1).reshape(-1, 3)
    starts_np = starts_np[:n]
    all_starts = jnp.asarray(starts_np)

    # ---------------- gather A: current (unrolled dynamic_slice) --------
    def gather_current(pm, pa, st, ofs):
        starts = lax.dynamic_slice(st, (ofs, 0), (n, 3))

        def one(s):
            win = lax.dynamic_slice(pm, (s[0], s[1], s[2]), (w, w, w))
            af = lax.dynamic_slice(pa, (s[0], s[1], s[2]), (w, w, w))
            return win, af

        pairs = [one(starts[b]) for b in range(n)]
        wins = jnp.stack([p[0] for p in pairs])
        afs = jnp.stack([p[1] for p in pairs])
        return wins, afs

    # ---------------- gather B: 3-stage contiguous copies ---------------
    def gather_staged(pm, pa, st, ofs):
        starts = lax.dynamic_slice(st, (ofs, 0), (n, 3))

        def one(s):
            outs = []
            for vol in (pm, pa):
                slab = lax.dynamic_slice(vol, (s[0], 0, 0), (w, P, P))
                slab = lax.optimization_barrier(slab)
                slab = lax.dynamic_slice(slab, (0, s[1], 0), (w, w, P))
                slab = lax.optimization_barrier(slab)
                outs.append(
                    lax.dynamic_slice(slab, (0, 0, s[2]), (w, w, w)))
            return tuple(outs)

        pairs = [one(starts[b]) for b in range(n)]
        wins = jnp.stack([p[0] for p in pairs])
        afs = jnp.stack([p[1] for p in pairs])
        return wins, afs

    jg_a = jax.jit(gather_current)
    jg_b = jax.jit(gather_staged)
    ta, out_a = timeit(jg_a, padded_map, padded_af, all_starts, 0)
    tb, out_b = timeit(jg_b, padded_map, padded_af, all_starts, 0)
    da = float(jnp.max(jnp.abs(out_a[0] - out_b[0])))
    print(f"gather  current {ta * 1e3:7.1f} ms   staged {tb * 1e3:7.1f} ms"
          f"   maxdiff {da}")
    del out_a, out_b

    # ---------------- scatter A: current (scan of RMW updates) ----------
    acc_shape = (P, P, P)
    n_aa = 20
    cores_bb = jnp.asarray(rng.random((n, core, core, core), np.float32))
    cores_ca = jnp.asarray(rng.random((n, core, core, core), np.float32))
    cores_aa = jnp.asarray(
        rng.random((n, core, core, core, n_aa), np.float32))
    widx = jnp.asarray(np.arange(n, dtype=np.int32))  # window indices

    def scatter_current(vols, bb_c, ca_c, aa_c, st, n_valid):
        def body(vols, xs):
            s, bb1, ca1, aa1, i = xs
            bb_v, ca_v, aa_v = vols
            valid = i < n_valid
            pos = (s[0], s[1], s[2])
            old = lax.dynamic_slice(bb_v, pos, bb1.shape)
            bb_v = lax.dynamic_update_slice(
                bb_v, jnp.where(valid, bb1, old), pos)
            old = lax.dynamic_slice(ca_v, pos, ca1.shape)
            ca_v = lax.dynamic_update_slice(
                ca_v, jnp.where(valid, ca1, old), pos)
            old = lax.dynamic_slice(aa_v, pos + (0,), aa1.shape)
            aa_v = lax.dynamic_update_slice(
                aa_v, jnp.where(valid, aa1, old), pos + (0,))
            return (bb_v, ca_v, aa_v), None

        # NOTE: scan over the runtime `st` argument (an earlier revision
        # scanned a trace-time-constant copy of starts_np, which let XLA
        # specialize the update offsets statically — not what the engine
        # program does; the variants harness confirmed the timing is the
        # same either way, ~122 ms)
        xs = (st, bb_c, ca_c, aa_c, jnp.arange(n, dtype=jnp.int32))
        vols, _ = lax.scan(body, vols, xs)
        return vols

    def time_donated(fn, vols, *args, reps=5):
        # donation consumes the accumulator: chain output -> input
        vols = fn(vols, *args)
        fence(vols)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            vols = fn(vols, *args)
            fence(vols)
            best = min(best, time.time() - t0)
        return best, vols

    vols0 = (jnp.zeros(acc_shape, jnp.float32),
             jnp.zeros(acc_shape, jnp.float32),
             jnp.zeros(acc_shape + (n_aa,), jnp.float32))
    js_a = jax.jit(scatter_current, donate_argnums=(0,))
    ta, vols_out = time_donated(js_a, vols0, cores_bb, cores_ca, cores_aa,
                                jnp.asarray(starts_np), n)
    del vols_out

    # ---------------- scatter B: block-layout staging + final reorder ---
    NB = 6  # blocks per axis

    def scatter_block(stage, bb_c, ca_c, aa_c, wi, n_valid):
        bb_s, ca_s, aa_s = stage

        def body(stage, xs):
            i_w, bb1, ca1, aa1, i = xs
            bb_s, ca_s, aa_s = stage
            valid = i < n_valid
            old = lax.dynamic_slice(
                bb_s, (i_w, 0, 0, 0), (1,) + bb1.shape)
            bb_s = lax.dynamic_update_slice(
                bb_s, jnp.where(valid, bb1[None], old), (i_w, 0, 0, 0))
            old = lax.dynamic_slice(
                ca_s, (i_w, 0, 0, 0), (1,) + ca1.shape)
            ca_s = lax.dynamic_update_slice(
                ca_s, jnp.where(valid, ca1[None], old), (i_w, 0, 0, 0))
            old = lax.dynamic_slice(
                aa_s, (i_w, 0, 0, 0, 0), (1,) + aa1.shape)
            aa_s = lax.dynamic_update_slice(
                aa_s, jnp.where(valid, aa1[None], old), (i_w, 0, 0, 0, 0))
            return (bb_s, ca_s, aa_s), None

        xs = (wi, bb_c, ca_c, aa_c, jnp.arange(n, dtype=jnp.int32))
        stage, _ = lax.scan(body, (bb_s, ca_s, aa_s), xs)
        return stage

    def reorder(stage):
        bb_s, ca_s, aa_s = stage
        V = NB * core

        def to_vol(s):
            extra = s.shape[4:]
            s = s.reshape((NB, NB, NB, core, core, core) + extra)
            perm = (0, 3, 1, 4, 2, 5) + tuple(
                6 + i for i in range(len(extra)))
            return s.transpose(perm).reshape((V, V, V) + extra)

        return to_vol(bb_s), to_vol(ca_s), to_vol(aa_s)

    n_windows = NB ** 3
    stage0 = (jnp.zeros((n_windows, core, core, core), jnp.float32),
              jnp.zeros((n_windows, core, core, core), jnp.float32),
              jnp.zeros((n_windows, core, core, core, n_aa), jnp.float32))
    js_b = jax.jit(scatter_block, donate_argnums=(0,))
    tb, stage_out = time_donated(js_b, stage0, cores_bb, cores_ca, cores_aa,
                                 widx, n)
    print(f"scatter current {ta * 1e3:7.1f} ms   block {tb * 1e3:7.1f} ms",
          flush=True)
    del cores_bb, cores_ca, cores_aa
    import gc

    gc.collect()

    def to_vol(s):
        V = NB * core
        extra = s.shape[4:]
        s = s.reshape((NB, NB, NB, core, core, core) + extra)
        perm = (0, 3, 1, 4, 2, 5) + tuple(6 + i for i in range(len(extra)))
        return s.transpose(perm).reshape((V, V, V) + extra)

    jr1 = jax.jit(to_vol)
    bb_s, ca_s, aa_s = stage_out
    t_bb, _v = timeit(jr1, bb_s)
    del _v
    t_aa, _v = timeit(jr1, aa_s)
    print(f"final reorder (once per map): bb {t_bb * 1e3:6.1f} ms   "
          f"aa {t_aa * 1e3:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
