"""Sliding-window inference engine, fully on-device and SPMD-shardable.

Re-design of the reference predictor (utils/predict.py:307-512).  The
reference writes one ``.npz`` per window to disk and re-reads them all to
paste central cores into numpy volumes; here the whole map stays resident
in HBM and each dispatch step

  1. slices a CHUNK of ``chunk * batch`` 64-cube windows (density +
     24-channel AF3 encoding) out of the padded volumes with
     ``dynamic_slice`` (no host traffic),
  2. runs the MICA forward pass over the chunk (bfloat16 on the MXU by
     default), one batch at a time inside a single program via a bounded
     ``fori_loop`` whose trip count is the number of *valid* batches — so
     a partial tail chunk costs only the batches it actually contains,
  3. applies the softmax postprocessing (drop the "neighbor" class from the
     backbone/CA logits and keep the atom-class probability; 20-way amino
     acid probabilities — predict.py:342-349),
  4. scatters each window's central 48-cube core into the per-quantity
     output volumes with ``dynamic_update_slice`` (cores tile the volume,
     so writes never overlap).

Chunking exists because dispatch latency is real: on a tunneled host each
program dispatch costs ~16 ms of RPC, and a 256-cube map at batch 8 used
to issue ~81 dispatches (~1.3 s/map of pure loop overhead).  With
``chunk=8`` the same map is ~12 dispatches.

The pipeline is split into three jit programs: a cheap window gather and a
cheap core scatter (re-specialized per map shape) around the expensive
model step whose shapes depend only on (chunk, batch, window) — so the
heavy XLA compile happens once ever per configuration and is served from
the persistent compilation cache across maps and processes.

All-zero windows (no density, no AF3 atoms) produce identical outputs, so
in core-blend mode the accumulator volumes are *initialized* as a tiling
of the cached zero-window core and only nonempty windows are ever
gathered/computed/scattered — the empty regions are correct by
construction and cost zero dispatches.

Multi-chip: the window batch is sharded over the mesh's ``data`` axis; the
core scatter produces replicated outputs, so XLA inserts the ICI
all-gather that replaces the reference's serial paste-back loop.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.mica import MICA
from ..ops.window import CORE, HALO, window_counts, window_starts
from ..parallel.mesh import DATA_AXIS, make_mesh, pad_to_multiple

NUM_AA = 20
NUM_AF_CHANNELS = 24


def _heavy_compile_options() -> Optional[dict]:
    """Compiler options for the heavy model step.

    A hardware A/B on v5e (scripts/bench_compiler_options.py) measured the
    conv emitter ~1.5% faster with the scoped-VMEM budget raised from the
    16 MB default to 32 MB (60.82 -> 59.94 ms/window; 64 MB and 100 MB are
    no better and compile 2-4x slower).  TPU-only: the flag is unknown to
    the CPU/GPU compilers and would abort compilation there.
    """
    if jax.default_backend() != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": "32768"}


def pack_af_encoding(af: np.ndarray) -> np.ndarray:
    """Pack a binary (24, X, Y, Z) AF3 encoding into uint32 bitfields.

    Cuts the host->device transfer 8x (one uint32 per voxel instead of 24
    bytes); the model step unpacks on device with shift-and-mask.
    """
    af = np.asarray(af)
    packed = np.zeros(af.shape[1:], np.uint32)
    for c in range(af.shape[0]):
        packed |= (af[c] > 0).astype(np.uint32) << np.uint32(c)
    return packed


def unpack_af_bits(packed: "jnp.ndarray", dtype=jnp.float32) -> "jnp.ndarray":
    """(..., ) uint32 -> (..., 24) float channels-last on device."""
    shifts = jnp.arange(NUM_AF_CHANNELS, dtype=jnp.uint32)
    bits = (packed[..., None] >> shifts) & jnp.uint32(1)
    return bits.astype(dtype)


def auto_batch_size(max_batch: int = 8, device=None) -> int:
    """Memory-derived batch size, capped at the measured-fastest batch
    (reference predict.py:149-174 picks the largest batch that FITS; on
    this platform bigger is measurably slower, so the cap is a perf
    rule, not just a memory one).

    Measured on v5e (scripts/bench_batch_cliff.py, 2026-08-21, constant
    48-window workload, ms/window): batch 8 + wino 55.8, batch 8 direct
    59.9, batch 12 direct 79.6, batch 16 direct 59.9.  Batches >8
    exceed the Winograd kernel's validated row size (R = W*B > 512
    crashes the XLA TPU compile helper, so the gate falls back to
    direct convs) and are never faster even ignoring wino — so a
    big-HBM host must NOT auto-select them.

    The full bf16 network peaks around ~1.5 GB of live activations per
    64-cube window; leave headroom for the output volumes.
    """
    try:
        device = device or jax.devices()[0]
        stats = device.memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit:
            per_window = 1.5 * 1024**3
            usable = 0.7 * limit
            return int(max(1, min(max_batch, usable // per_window)))
    except Exception:
        pass
    return max_batch


# Measured per-geometry model-step FLOP-rate penalties on v5e (bf16,
# scripts/ab_step.py, 2026-08-17): computed-voxel throughput vs the 64-cube
# batch-8 baseline (4.17M computed voxels/s).  Bigger single windows lose
# MXU/fusion efficiency through XLA — window 80 runs at 47%, window 128 at
# 69% — which, combined with lattice padding, makes the reference's 64/48
# geometry optimal at every realistic map size ON THIS PLATFORM.  The
# engine stays geometry-generic; the table keeps "auto" honest.
_GEOMETRY_RATE_PENALTY = {48: 1.0, 64: 2.13, 112: 1.45}


def best_core(shape, halo: int = HALO,
              candidates=(48, 64, 112),
              max_batch: int = 8) -> Tuple[int, int]:
    """Window geometry minimizing *time* for a given map shape.

    Cost model: computed voxels — ``prod(ceil(s/core)) * window^3``, i.e.
    halo overlap x lattice padding (up to 3.4x the map's own voxels at the
    fixed 64/48 reference geometry) — times the measured per-geometry rate
    penalty (``_GEOMETRY_RATE_PENALTY``).  Candidates without a measured
    rate are skipped.

    Returns ``(core, batch)`` with the batch scaled so the activation
    footprint matches ``max_batch`` 64-cubes.  NOTE: InstanceNorm
    statistics are per-window, so predictions from a non-default geometry
    differ slightly from the reference's fixed 64/48 decomposition —
    callers wanting bitwise reference parity must keep (48, 8).
    """
    best = None
    for core in candidates:
        if core not in _GEOMETRY_RATE_PENALTY:
            continue
        win = core + 2 * halo
        n = 1
        for s in shape:
            n *= -(-s // core)
        cost = n * win ** 3 * _GEOMETRY_RATE_PENALTY[core]
        if best is None or cost < best[0]:
            batch = max(1, int(max_batch * 64 ** 3 / win ** 3))
            best = (cost, core, batch)
    return best[1], best[2]


def _window_nonempty(padded: np.ndarray, counts, core: int, halo: int) -> np.ndarray:
    """Vectorized per-window occupancy flags over a halo-padded volume.

    Replaces the serial per-window ``blk.any()`` scan (a 1024-cube map is
    ~10k windows x 64^3 reads on one host core) with one blockwise
    reduction + a separable running max over the window footprint.

    ``padded`` is the engine's padded array — 3D density / packed-uint32
    AF, or 4D channels-last float AF; windows start at multiples of
    ``core`` and span ``core + 2*halo``.  Returns flattened
    ``prod(counts)`` bools in ``window_starts`` order (x-major).
    """
    win = core + 2 * halo
    g = int(np.gcd(core, 2 * halo)) if halo else core
    a = padded
    if a.ndim == 4:
        a = (a != 0).any(axis=-1)
    occ = a != 0
    gx, gy, gz = (s // g for s in occ.shape)
    r = occ[: gx * g, : gy * g, : gz * g].reshape(
        gx, g, gy, g, gz, g
    ).any(axis=(1, 3, 5))
    wb, sb = win // g, core // g
    out = r
    for ax, n in enumerate(counts):
        idx = sb * np.arange(n)
        out = np.maximum.reduce(
            [np.take(out, idx + k, axis=ax) for k in range(wb)]
        )
    return out.reshape(-1)


def postprocess_logits(bb: jnp.ndarray, ca: jnp.ndarray, aa: jnp.ndarray):
    """Window-level postprocessing (channels-last logits).

    Returns (bb_prob, ca_prob, aa_prob) with shapes (..., 1/1/20).
    bb/ca: softmax over classes {0, 2, 3} (class 1 = "neighbor shell"
    dropped), keeping P(atom class 3).  aa: softmax over classes 1..20.
    """
    # channel-sliced 3-class softmax: P(atom) = e3 / (e0 + e2 + e3).
    # Same math as softmax(concat([x0], [x2, x3]))[..., 2], but without
    # materializing the 4->3 concat — the concat forced ~8 ms/step of
    # layout copies on the f32 logit tensors (trace 2026-08-17)
    def p_atom(x):
        x0, x2, x3 = x[..., 0], x[..., 2], x[..., 3]
        m = jnp.maximum(jnp.maximum(x0, x2), x3)
        e0, e2, e3 = jnp.exp(x0 - m), jnp.exp(x2 - m), jnp.exp(x3 - m)
        return e3 / (e0 + e2 + e3)

    bb_prob = p_atom(bb)[..., None]
    ca_prob = p_atom(ca)[..., None]
    aa_prob = jax.nn.softmax(aa[..., 1:], axis=-1)
    return bb_prob, ca_prob, aa_prob


class SlidingWindowPredictor:
    """Batched sliding-window predictor for arbitrary-size volumes."""

    def __init__(
        self,
        params,
        batch_size: int = 8,
        dtype=jnp.bfloat16,
        base_filters: int = 64,
        mesh=None,
        use_mesh: bool = False,
        core: int = CORE,
        halo: int = HALO,
        blend: str = "core",
        shard_volumes: bool = False,
        chunk: int = 8,
    ):
        """``blend``: 'core' pastes each window's halo-stripped core
        (reference semantics, predict.py:496-501); 'average' accumulates
        the FULL window prediction with uniform weights and divides — the
        overlap-averaged upgrade, smoother at window seams.

        ``shard_volumes``: shard the output accumulator volumes along the
        leading spatial axis over the mesh instead of replicating them
        (memory-scalable inference: a 512-cube map's 20-channel AA volume
        is ~10.7 GB replicated, ~1.3 GB/chip sharded on 8 devices).  The
        X core-count is padded to a mesh multiple so every window core
        lands wholly inside one device's slab; each device masks and
        writes only its own cores (the batch of cores is all-gathered —
        they are small).  Requires a mesh and blend='core' (full-window
        averaging crosses slab boundaries).

        ``chunk``: batches per dispatch — each gather/model/scatter call
        processes ``chunk * batch_size`` windows, amortizing per-dispatch
        RPC latency (~16 ms on tunneled hosts).  The model program's trip
        count is dynamic, so partial tail chunks compute only their valid
        batches."""
        if blend not in ("core", "average"):
            raise ValueError(f"unknown blend mode {blend!r}")
        from ..utils.jaxcache import ensure_compilation_cache

        ensure_compilation_cache()  # model-step compiles are ~60 s; serve
        # repeats from the on-disk cache across processes
        self.blend = blend
        self.shard_volumes = bool(shard_volumes)
        self.model = MICA(base=base_filters, dtype=dtype)
        self.params = params
        self.core = int(core)
        self.halo = int(halo)
        self.window = self.core + 2 * self.halo
        self.batch_size = int(batch_size)
        self.chunk = max(1, int(chunk))
        self.mesh = mesh if mesh is not None else (make_mesh() if use_mesh else None)
        if self.shard_volumes and (self.mesh is None or self.blend != "core"):
            raise ValueError("shard_volumes requires a mesh and blend='core'")
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            self.batch_size = pad_to_multiple(self.batch_size, n_dev)
        # validate + A/B the depthwise-conv formulations for this model's
        # widths at this window size BEFORE any model program is traced
        # (the gate in models/mica.py consults the per-width registry at
        # trace time).  bf16 only: float32 mode is the reference-parity
        # path and keeps XLA's reduction order.  No-ops off-TPU and under
        # an explicit MICA_PALLAS_DW override; measurement cost is paid
        # once per platform+shape (disk-cached decision).
        self.dw_autotune: Dict = {"path": "xla", "autotuned": False}
        if dtype == jnp.bfloat16:
            from ..ops.depthwise_pallas import pick_depthwise_path

            self.dw_autotune = pick_depthwise_path(
                widths=(base_filters, 2 * base_filters, 4 * base_filters),
                spatial=self.window)
        self.timing: Dict[str, float] = {}
        self._model_step = {}
        self._gather = {}
        self._scatter = {}
        self._scatter_sharded = {}
        self._tile_init = {}
        self._zero_cores = {}
        self._shardings = None
        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            cshard = NamedSharding(self.mesh, P(None, DATA_AXIS))
            self._shardings = (repl, cshard)

    # ------------------------------------------------------------------
    # jit pieces
    # ------------------------------------------------------------------
    def _build_model_step(self, with_af: bool, full: Optional[bool] = None):
        """Heavy step: (chunk, B, w, w, w) windows (+ packed uint32 AF
        windows) -> (chunk, B) core probability blocks (or full-window
        blocks when ``full``), computing only the first ``n_chunks``
        batches (bounded ``fori_loop`` with a dynamic trip count — one
        compiled program serves every tail size).

        Shapes depend only on (chunk, batch, window) — compiled once,
        served from the persistent cache for every map afterwards.  The
        24-channel AF encoding arrives as uint32 bitfields and is unpacked
        INSIDE this program, so the float windows never round-trip through
        HBM between the gather and the model.
        """
        if full is None:
            full = self.blend == "average"
        key = (with_af, full)
        if key in self._model_step:
            return self._model_step[key]
        model, core_n, halo = self.model, self.core, self.halo
        C, bsz, win = self.chunk, self.batch_size, self.window
        S = win if full else core_n

        def fwd(params, windows, af_packed):
            if af_packed is None:
                af = None
            elif af_packed.dtype == jnp.uint32:
                af = unpack_af_bits(af_packed, windows.dtype)
            else:  # float encodings (e.g. trilinear splat) pass through
                af = af_packed.astype(windows.dtype)
            # slice logits to the core BEFORE the softmax postprocess:
            # softmax is pointwise over the channel axis, so this is exact,
            # and it cuts the f32 postprocess work 64^3 -> 48^3 (0.42x).
            # The aa head slices INSIDE the model (before its 1x1 final
            # conv — also exact) so the 21-channel f32 logit tensor never
            # exists at 64^3; bb/ca must come out full-window (they feed
            # the cascade correction convs) and are sliced here.
            sl = slice(None) if full else slice(halo, halo + core_n)
            bb, ca, aa = model.apply(
                {"params": params}, windows, af,
                out_slice=None if full else sl,
            )
            bb = bb[:, sl, sl, sl, :]
            ca = ca[:, sl, sl, sl, :]
            bb_p, ca_p, aa_p = postprocess_logits(bb, ca, aa)
            return (bb_p[..., 0], ca_p[..., 0], aa_p)

        def step(params, windows, af_packed, n_chunks):
            acc = (
                jnp.zeros((C, bsz, S, S, S), jnp.float32),
                jnp.zeros((C, bsz, S, S, S), jnp.float32),
                jnp.zeros((C, bsz, S, S, S, NUM_AA), jnp.float32),
            )

            def body(i, acc):
                wb = jax.lax.dynamic_index_in_dim(windows, i, 0, keepdims=False)
                ab = (
                    None
                    if af_packed is None
                    else jax.lax.dynamic_index_in_dim(af_packed, i, 0, keepdims=False)
                )
                bb, ca, aa = fwd(params, wb, ab)
                return (
                    jax.lax.dynamic_update_index_in_dim(acc[0], bb, i, 0),
                    jax.lax.dynamic_update_index_in_dim(acc[1], ca, i, 0),
                    jax.lax.dynamic_update_index_in_dim(acc[2], aa, i, 0),
                )

            return jax.lax.fori_loop(0, n_chunks, body, acc)

        opts = _heavy_compile_options()
        if self._shardings is not None:
            repl, cshard = self._shardings
            fn = jax.jit(
                step,
                in_shardings=(repl, cshard, cshard if with_af else None, repl),
                out_shardings=(cshard, cshard, cshard),
                compiler_options=opts,
            )
        else:
            fn = jax.jit(step, compiler_options=opts)
        self._model_step[key] = fn
        return fn

    def _build_gather(self, with_af: bool, n_chunks: Optional[int] = None):
        """Cheap window gather; the jit wrapper is cached on self so repeat
        calls on the same map shape hit jax's shape-keyed trace cache
        instead of re-tracing a fresh closure every predict_volume.

        Takes the full device-resident ``starts`` array plus a scalar
        offset (one host->device upload per map, not one per batch),
        gathers ``chunk * batch`` windows and returns them shaped
        (chunk, batch, ...) with AF windows still bit-packed (the model
        step unpacks).

        ``n_chunks`` < chunk specializes the program to a tail dispatch:
        only ``n_chunks * batch`` windows are actually sliced (each
        ~0.8 ms of device time — the dominant cost of this program) and
        the uncomputed chunks are zero-filled so the output shape still
        matches the (chunk-invariant) model program.  The model's bounded
        fori_loop never reads the zero-filled chunks."""
        C, bsz = self.chunk, self.batch_size
        nc = C if n_chunks is None else int(n_chunks)
        key = (with_af, nc)
        if key in self._gather:
            return self._gather[key]
        w = self.window
        n = nc * bsz

        def gather(padded_map, padded_af, all_starts, ofs):
            starts = jax.lax.dynamic_slice(all_starts, (ofs, 0), (n, 3))

            # unrolled true dynamic_slice per window: vmap would rewrite
            # the slice into one big gather op, which lowers to scalar
            # indexing on TPU — measured 46 ms/call vs ~2 ms for the
            # unrolled DMA copies (scripts/profile_engine.py)
            def one(start):
                win = jax.lax.dynamic_slice(
                    padded_map, (start[0], start[1], start[2]), (w, w, w)
                )
                if padded_af is None:
                    return win, None
                if padded_af.ndim == 4:  # float channels-last encodings
                    af = jax.lax.dynamic_slice(
                        padded_af, (start[0], start[1], start[2], 0),
                        (w, w, w, padded_af.shape[3]),
                    )
                else:
                    af = jax.lax.dynamic_slice(
                        padded_af, (start[0], start[1], start[2]), (w, w, w)
                    )
                return win, af

            pairs = [one(starts[b]) for b in range(n)]
            # zero-fill the chunks the model will not compute INSIDE the
            # single stack op (a post-hoc jnp.pad costs a second
            # full-tensor copy at this platform's slow data-movement
            # rates) so the model program — compiled once for the full
            # chunk count — sees its usual shape
            n_fill = (C - nc) * bsz
            zero_w = jnp.zeros_like(pairs[0][0])
            wins = jnp.stack(
                [p[0] for p in pairs] + [zero_w] * n_fill
            ).reshape(C, bsz, w, w, w)
            afs = None
            if pairs[0][1] is not None:
                zero_a = jnp.zeros_like(pairs[0][1])
                afs = jnp.stack([p[1] for p in pairs] + [zero_a] * n_fill)
                afs = afs.reshape((C, bsz) + afs.shape[1:])
            return wins[..., None], afs, starts

        if self._shardings is not None:
            repl, cshard = self._shardings
            fn = jax.jit(
                gather,
                in_shardings=(repl, repl if with_af else None, repl, repl),
                out_shardings=(cshard, cshard if with_af else None, repl),
            )
        else:
            fn = jax.jit(gather)
        self._gather[key] = fn
        return fn

    def _build_scatter(self, full_in: bool = False,
                       n_chunks: Optional[int] = None):
        """Cheap core scatter (replicated outputs); jit wrapper cached.

        ``n_chunks`` specializes the scan to the dispatch's computed
        chunks only (each update is ~1.7 ms of device time, so a 5-chunk
        tail dispatch pays 40 updates, not 64).

        Core blend writes BLINDLY — no read-modify-write masking: every
        scanned entry was computed by the model, and the tail-padding
        entries inside the last computed chunk are gathered REPEATS of
        the last real window, so their outputs are bitwise duplicates
        and overwriting with them is exact.  Average blend must keep the
        validity weights (a duplicate may not accumulate twice).

        ``full_in``: the incoming blocks are FULL windows (the model step
        ran with ``full=True``, e.g. for reference-layout artifact dumps);
        in 'core' blend the core is sliced off here before the paste."""
        C, bsz = self.chunk, self.batch_size
        nc = C if n_chunks is None else int(n_chunks)
        key = (full_in, nc)
        if key in self._scatter:
            return self._scatter[key]
        core_n, halo = self.core, self.halo
        average = self.blend == "average"
        n = nc * bsz

        def scatter(vols, cores, all_starts, ofs, n_valid):
            starts = jax.lax.dynamic_slice(all_starts, (ofs, 0), (n, 3))
            bb_c, ca_c, aa_c = cores
            bb_c = bb_c[:nc].reshape((n,) + bb_c.shape[2:])
            ca_c = ca_c[:nc].reshape((n,) + ca_c.shape[2:])
            aa_c = aa_c[:nc].reshape((n,) + aa_c.shape[2:])
            if full_in and not average:
                c = slice(halo, halo + core_n)
                bb_c = bb_c[:, c, c, c]
                ca_c = ca_c[:, c, c, c]
                aa_c = aa_c[:, c, c, c, :]

            def body(vols, xs):
                s, bb1, ca1, aa1, i = xs
                bb_v, ca_v, aa_v, cnt_v = vols
                pos = (s[0], s[1], s[2])
                if average:
                    # accumulate full windows at (start - halo) in the
                    # halo-padded accumulator frame (see predict_volume).
                    # Invalid entries (tail padding — repeats of the last
                    # window) get weight 0.
                    wgt = (i < n_valid).astype(jnp.float32)
                    blk = jax.lax.dynamic_slice(bb_v, pos, bb1.shape) + wgt * bb1
                    bb_v = jax.lax.dynamic_update_slice(bb_v, blk, pos)
                    blk = jax.lax.dynamic_slice(ca_v, pos, ca1.shape) + wgt * ca1
                    ca_v = jax.lax.dynamic_update_slice(ca_v, blk, pos)
                    blk = jax.lax.dynamic_slice(aa_v, pos + (0,), aa1.shape) + wgt * aa1
                    aa_v = jax.lax.dynamic_update_slice(aa_v, blk, pos + (0,))
                    blk = jax.lax.dynamic_slice(cnt_v, pos, bb1.shape) + wgt
                    cnt_v = jax.lax.dynamic_update_slice(cnt_v, blk, pos)
                else:
                    bb_v = jax.lax.dynamic_update_slice(bb_v, bb1, pos)
                    ca_v = jax.lax.dynamic_update_slice(ca_v, ca1, pos)
                    aa_v = jax.lax.dynamic_update_slice(aa_v, aa1, pos + (0,))
                return (bb_v, ca_v, aa_v, cnt_v), None

            xs = (starts, bb_c, ca_c, aa_c, jnp.arange(n, dtype=jnp.int32))
            vols, _ = jax.lax.scan(body, vols, xs)
            return vols

        if self._shardings is not None:
            repl, cshard = self._shardings
            fn = jax.jit(
                scatter,
                in_shardings=((repl,) * 4, (cshard,) * 3, repl, repl, repl),
                out_shardings=(repl,) * 4,
                donate_argnums=(0,),
            )
        else:
            fn = jax.jit(scatter, donate_argnums=(0,))
        self._scatter[key] = fn
        return fn

    def _build_scatter_sharded(self, x_local: int):
        """Core scatter into X-sharded accumulators via shard_map.

        Each device owns a contiguous ``x_local``-plane slab of the padded
        volume; cores are 48-aligned and ``x_local`` is a multiple of the
        core size, so every core belongs to exactly one device.  Each
        device scans the (replicated) chunk of cores and writes the ones
        whose X start falls in its slab — foreign or invalid cores are
        masked by re-writing the existing block.
        """
        if x_local in self._scatter_sharded:
            return self._scatter_sharded[x_local]
        core_n, mesh = self.core, self.mesh
        n = self.chunk * self.batch_size

        def scatter_local(vols, cores, all_starts, ofs, n_valid):
            bb_cs, ca_cs, aa_cs = cores
            bb_cs = bb_cs.reshape((n,) + bb_cs.shape[2:])
            ca_cs = ca_cs.reshape((n,) + ca_cs.shape[2:])
            aa_cs = aa_cs.reshape((n,) + aa_cs.shape[2:])
            x_off = jax.lax.axis_index(DATA_AXIS).astype(jnp.int32) * x_local
            starts = jax.lax.dynamic_slice(all_starts, (ofs, 0), (n, 3))

            def body(vols, xs):
                s, bb1, ca1, aa1, i = xs
                bb_v, ca_v, aa_v, cnt_v = vols
                lx = s[0] - x_off
                mine = (lx >= 0) & (lx < x_local) & (i < n_valid)
                pos = jnp.clip(lx, 0, x_local - core_n)
                old = jax.lax.dynamic_slice(bb_v, (pos, s[1], s[2]), bb1.shape)
                bb_v = jax.lax.dynamic_update_slice(
                    bb_v, jnp.where(mine, bb1, old), (pos, s[1], s[2]))
                old = jax.lax.dynamic_slice(ca_v, (pos, s[1], s[2]), ca1.shape)
                ca_v = jax.lax.dynamic_update_slice(
                    ca_v, jnp.where(mine, ca1, old), (pos, s[1], s[2]))
                old = jax.lax.dynamic_slice(
                    aa_v, (pos, s[1], s[2], 0), aa1.shape)
                aa_v = jax.lax.dynamic_update_slice(
                    aa_v, jnp.where(mine, aa1, old), (pos, s[1], s[2], 0))
                return (bb_v, ca_v, aa_v, cnt_v), None

            xs = (starts, bb_cs, ca_cs, aa_cs, jnp.arange(n, dtype=jnp.int32))
            vols, _ = jax.lax.scan(body, vols, xs)
            return vols

        x4 = P(DATA_AXIS, None, None, None)
        x3 = P(DATA_AXIS, None, None)
        vol_specs = (x3, x3, x4, P())
        fn = jax.jit(
            jax.shard_map(
                scatter_local, mesh=mesh,
                in_specs=(vol_specs, (P(), P(), P()), P(), P(), P()),
                out_specs=vol_specs,
                check_vma=False,
            ),
            donate_argnums=(0,),
        )
        self._scatter_sharded[x_local] = fn
        return fn

    def _build_tile_init(self, padded_shape):
        """Accumulator init as a tiling of the zero-window core (core
        blend): every core position starts out holding the all-zero
        window's prediction, so empty windows never need to be computed
        or scattered — nonempty cores simply overwrite their slots.

        Pure broadcast+reshape — a few ms of HBM writes, compiled per
        padded shape."""
        key = padded_shape
        if key in self._tile_init:
            return self._tile_init[key]
        core_n = self.core
        reps = tuple(p // core_n for p in padded_shape)

        def tile(z_bb, z_ca, z_aa):
            def t3(c):
                b = jnp.broadcast_to(
                    c[None, :, None, :, None, :],
                    (reps[0], core_n, reps[1], core_n, reps[2], core_n),
                )
                return b.reshape(padded_shape)

            aa = jnp.broadcast_to(
                z_aa[None, :, None, :, None, :, :],
                (reps[0], core_n, reps[1], core_n, reps[2], core_n, NUM_AA),
            ).reshape(padded_shape + (NUM_AA,))
            return t3(z_bb), t3(z_ca), aa, jnp.zeros((1, 1, 1), jnp.float32)

        if self.shard_volumes:
            xs3 = NamedSharding(self.mesh, P(DATA_AXIS))
            xs4 = NamedSharding(self.mesh, P(DATA_AXIS, None, None, None))
            repl = self._shardings[0]
            fn = jax.jit(tile, out_shardings=(xs3, xs3, xs4, repl))
        elif self._shardings is not None:
            repl = self._shardings[0]
            fn = jax.jit(tile, out_shardings=(repl,) * 4)
        else:
            fn = jax.jit(tile)
        self._tile_init[key] = fn
        return fn

    def _get_zero_cores(self, with_af: bool, af_ndim, full_out: bool):
        """(chunk, batch) blocks for the all-zero window, cached across
        maps — same params, same all-zero input.  Only chunk 0 is
        computed (n_chunks=1); every window in a batch is identical, so
        position [0, 0] is the canonical zero block."""
        zkey = (with_af, af_ndim, full_out)
        z = self._zero_cores.get(zkey)
        if z is None:
            C, bsz, win = self.chunk, self.batch_size, self.window
            zero_wins = jnp.zeros((C, bsz, win, win, win, 1), jnp.float32)
            if not with_af:
                zero_afs = None
            elif af_ndim == 4:
                zero_afs = jnp.zeros(
                    (C, bsz, win, win, win, NUM_AF_CHANNELS), jnp.float32)
            else:
                zero_afs = jnp.zeros((C, bsz, win, win, win), jnp.uint32)
            model_step = self._build_model_step(with_af, full=full_out)
            z = model_step(self.params, zero_wins, zero_afs, 1)
            self._zero_cores[zkey] = z
        return z

    # ------------------------------------------------------------------
    def predict_volume(
        self,
        volume: np.ndarray,
        af_encoding: Optional[np.ndarray] = None,
        keep_on_device: bool = False,
        dump_windows_dir: Optional[str] = None,
        dump_format: str = "compact",
    ) -> Dict[str, np.ndarray]:
        """Predict BB/CA/AA volumes for a normalized ``volume[x,y,z]``.

        ``af_encoding`` is (24, X, Y, Z) (binary) or None.

        ``dump_windows_dir``/``dump_format``: per-window artifact dumps.
        ``"compact"`` writes one npz per window (core blocks, debug use);
        ``"reference"`` reproduces the reference's per-grid artifact layout
        (predict.py:353-371) for drop-in interop with external consumers:
        four files ``grid_i{i}_j{j}_k{k}_<quantity>.npz`` per window, each
        with the FULL-window ``data`` (channels-first for the 20-way AA
        probabilities, plus the per-window argmax prediction) and the
        ``metadata`` dict (i/j/k, di/dj/dk core extents, orig_shape,
        filename) its ``reconstruct_volume`` (predict.py:439-512) expects.

        Returns the reference's four quantities (predict.py:526-531):
        ``backbone_probability``, ``carbon_alpha_probability`` (X,Y,Z),
        ``amino_acid_probability`` (20,X,Y,Z), ``amino_acid_prediction``
        (X,Y,Z; argmax 0..19).
        """
        if dump_format not in ("compact", "reference"):
            raise ValueError(f"unknown dump_format {dump_format!r}")
        dump_reference = dump_windows_dir is not None and dump_format == "reference"
        if dump_reference and self.shard_volumes:
            raise ValueError("reference-layout dumps need replicated outputs")
        t0 = time.time()
        core_n, halo, win = self.core, self.halo, self.window
        shape = tuple(volume.shape)
        nb = list(window_counts(shape, core_n))
        if self.shard_volumes:
            # pad the X core-count to a mesh multiple so each device owns
            # an equal slab and every core lands wholly inside one slab
            nb[0] = pad_to_multiple(nb[0], self.mesh.devices.size)
        padded_shape = tuple(n * core_n for n in nb)

        # pad so the last window [start, start+window) fits:
        # start_max = padded_shape - core
        pads = [
            (halo, (padded_shape[a] - core_n) + win - halo - shape[a]) for a in range(3)
        ]
        np_padded = np.pad(np.asarray(volume, np.float32), pads)
        padded_map = jnp.asarray(np_padded)
        padded_af = None
        np_af = None
        with_af = af_encoding is not None
        if with_af:
            if af_encoding.ndim == 3 and af_encoding.dtype == np.uint32:
                np_af = np.pad(af_encoding, pads)
            else:
                af_arr = np.asarray(af_encoding)
                # one linear pass — np.unique is a full sort of the 400M-
                # element array (~17 s of the measured 23 s setup)
                if af_arr.dtype.kind in "iub":
                    binary = af_arr.min() >= 0 and af_arr.max() <= 1
                else:
                    binary = bool(((af_arr == 0) | (af_arr == 1)).all())
                if binary:
                    np_af = np.pad(pack_af_encoding(af_arr), pads)
                else:
                    # fractional encodings (trilinear splat) cannot be
                    # bit-packed without silently binarizing them — ship
                    # them channels-last in float
                    np_af = np.pad(
                        np.moveaxis(af_arr.astype(np.float32), 0, -1),
                        pads + [(0, 0)],
                    )
            padded_af = jnp.asarray(np_af)

        starts = window_starts(shape, core_n).astype(np.int32)
        n_windows = starts.shape[0]

        # All-zero windows (no density, no AF3 atoms) are identical inputs
        # and therefore produce identical outputs — real maps are
        # typically 40-60% empty windows.  In core blend the accumulators
        # are tile-initialized with the zero-window core, so empties cost
        # nothing; in average blend the cached zero block is scattered.
        counts = window_counts(shape, core_n)
        nonempty = _window_nonempty(np_padded, counts, core_n, halo)
        if with_af:
            nonempty |= _window_nonempty(np_af, counts, core_n, halo)
        empty = ~nonempty
        compute_starts = starts[~empty]
        empty_starts = starts[empty]
        self.timing["n_empty"] = int(empty.sum())

        starts = compute_starts
        n_compute = starts.shape[0]
        bsz, C = self.batch_size, self.chunk
        nwin = C * bsz
        n_pad = (-n_compute) % nwin
        if n_pad:
            # INVARIANT the blind-write core scatter depends on: padding
            # entries MUST repeat the last real start, so a computed
            # padding window's output is a bitwise duplicate and blind
            # overwrite is exact (_build_scatter).  n_compute > 0 here
            # (n_pad is 0 when n_compute is 0).
            assert n_compute > 0
            starts = np.concatenate(
                [starts, np.repeat(starts[-1:], n_pad, axis=0)])

        average = self.blend == "average"
        acc_shape = tuple(np_padded.shape) if average else padded_shape

        full_out = average or dump_reference
        gather = self._build_gather(with_af)
        if self.shard_volumes:
            scatter = self._build_scatter_sharded(
                padded_shape[0] // self.mesh.devices.size
            )
        else:
            scatter = self._build_scatter(full_in=dump_reference and not average)
        model_step = self._build_model_step(with_af, full=full_out)

        need_zero = (not average) or len(empty_starts)
        z_cores = (
            self._get_zero_cores(with_af, None if np_af is None else np_af.ndim,
                                 full_out)
            if need_zero else None
        )

        if average:
            vols = (
                jnp.zeros(acc_shape, jnp.float32),
                jnp.zeros(acc_shape, jnp.float32),
                jnp.zeros(acc_shape + (NUM_AA,), jnp.float32),
                jnp.zeros(acc_shape, jnp.float32),
            )
            if self._shardings is not None:
                vols = jax.device_put(vols, self._shardings[0])
        else:
            # tile-init with the zero-window core: empty windows are
            # correct by construction and never dispatched
            z_bb, z_ca, z_aa = (z[0, 0] for z in z_cores)
            if full_out:  # full windows -> slice the core
                c = slice(halo, halo + core_n)
                z_bb, z_ca, z_aa = z_bb[c, c, c], z_ca[c, c, c], z_aa[c, c, c, :]
            vols = self._build_tile_init(padded_shape)(z_bb, z_ca, z_aa)
        if self.shard_volumes:
            # per-device accumulator footprint (scale tests assert this
            # stays ~1/n_dev of the replicated total)
            self.timing["acc_bytes_per_device"] = sum(
                max(s.data.nbytes for s in v.addressable_shards)
                for v in vols
            )
        # The jnp.asarray uploads above are asynchronous: without a fence
        # the first gather of the compute loop WAITS on the host->device
        # transfer and the upload time (~2 s for a 256-cube map + packed
        # AF over the tunneled host's ~60 MB/s link; microseconds on a
        # local PCIe host) is silently booked against the inference loop.
        # Fence here so "setup" owns data movement and "inference" owns
        # compute, matching the reference's data_loading/inference split
        # (predict.py timing_stats).  A 1-voxel readback is required on
        # top of block_until_ready, which can return early on tunneled
        # platforms.
        jax.block_until_ready(padded_map)
        _ = np.asarray(padded_map[0, 0, 0])
        if padded_af is not None:
            jax.block_until_ready(padded_af)
            _ = np.asarray(padded_af.reshape(-1)[0])
        # window-start table upload is data movement too (a ~16 ms RPC on
        # the tunneled host) — fence it into setup with the volumes
        starts_dev = jnp.asarray(starts) if starts.shape[0] else None
        if starts_dev is not None:
            jax.block_until_ready(starts_dev)
        self.timing["setup"] = time.time() - t0

        dump_dir = None
        if dump_windows_dir is not None:
            import pathlib

            dump_dir = pathlib.Path(dump_windows_dir)
            dump_dir.mkdir(parents=True, exist_ok=True)

        def dump(cores, batch_starts, n_valid):
            bb_c, ca_c, aa_c = (
                np.asarray(c).reshape((-1,) + c.shape[2:]) for c in cores
            )
            for b in range(n_valid):
                s = batch_starts[b]
                i, j, k = (int(v) for v in s)
                if not dump_reference:
                    np.savez_compressed(
                        dump_dir / f"win_i{i}_j{j}_k{k}.npz",
                        backbone=bb_c[b], carbon_alpha=ca_c[b],
                        amino_acid=aa_c[b], start=np.asarray(s),
                    )
                    continue
                # reference per-grid artifact layout (predict.py:353-371):
                # full-window data + the grid metadata reconstruct_volume
                # (predict.py:439-512) reads back
                stem = f"grid_i{i}_j{j}_k{k}"
                aa_first = np.moveaxis(aa_c[b], -1, 0)
                quantities = {
                    "backbone_probability": bb_c[b],
                    "carbon_alpha_probability": ca_c[b],
                    "amino_acid_probability": aa_first,
                    "amino_acid_prediction": np.argmax(aa_first, axis=0),
                }
                meta = {
                    "i": i, "j": j, "k": k,
                    "di": int(min(core_n, shape[0] - i)),
                    "dj": int(min(core_n, shape[1] - j)),
                    "dk": int(min(core_n, shape[2] - k)),
                    "orig_shape": np.asarray(shape),
                    "filename": stem,
                }
                for key, data in quantities.items():
                    np.savez(dump_dir / f"{stem}_{key}.npz",
                             data=data, metadata=meta)

        t1 = time.time()
        for ofs in range(0, starts.shape[0], nwin):
            n_valid = max(0, min(nwin, n_compute - ofs))
            n_chunks = -(-n_valid // bsz)
            if self.shard_volumes:
                # the shard_map scatter is compiled for full chunks only
                g = gather
                s = scatter
            else:
                # tail dispatches use length-specialized gather/scatter
                # programs: only the computed chunks are sliced/pasted
                g = self._build_gather(with_af, n_chunks)
                s = self._build_scatter(dump_reference and not average,
                                        n_chunks)
            wins, afs, batch = g(padded_map, padded_af, starts_dev, ofs)
            cores = model_step(self.params, wins, afs, n_chunks)
            vols = s(vols, cores, batch, 0, n_valid)
            if dump_dir is not None:
                dump(cores, starts[ofs : ofs + nwin], n_valid)

        n_empty = len(empty_starts)
        if n_empty and average:
            # scatter the cached zero block into every empty position
            # (identical inputs -> identical outputs), chunked
            z_bcast = tuple(jnp.broadcast_to(z[0:1, 0:1], z.shape)
                            for z in z_cores)
            n_pad_e = (-n_empty) % nwin
            if n_pad_e:
                empty_starts = np.concatenate(
                    [empty_starts,
                     np.repeat(empty_starts[-1:], n_pad_e, axis=0)]
                )
            empty_dev = jnp.asarray(empty_starts)
            for ofs in range(0, len(empty_starts), nwin):
                n_valid = max(0, min(nwin, n_empty - ofs))
                vols = scatter(vols, z_bcast, empty_dev, ofs, n_valid)
        if n_empty and dump_dir is not None:
            # identical outputs for identical (all-zero) inputs: the
            # representative blocks stand in for each window — host-side
            # only, no device work
            z_rep = tuple(jnp.broadcast_to(z[0:1, 0:1], z.shape)
                          for z in z_cores)
            for ofs in range(0, n_empty, nwin):
                n_valid = max(0, min(nwin, n_empty - ofs))
                dump(z_rep, empty_starts[ofs : ofs + nwin], n_valid)
        jax.block_until_ready(vols)
        # force true completion with a 1-voxel readback: on tunneled
        # platforms block_until_ready can return before execution finishes
        _ = np.asarray(vols[0][0, 0, 0])
        self.timing["inference"] = time.time() - t1
        self.timing["n_windows"] = n_windows

        t2 = time.time()
        bb_v, ca_v, aa_v, cnt_v = vols
        if average:
            safe = jnp.maximum(cnt_v, 1.0)
            bb_v = bb_v / safe
            ca_v = ca_v / safe
            aa_v = aa_v / safe[..., None]
            sl = tuple(slice(halo, halo + s) for s in shape)
        else:
            sl = tuple(slice(0, s) for s in shape)
        if keep_on_device:
            # leave cropping + argmax on device; no host transfer (the
            # device->host link can be the bottleneck on tunneled setups)
            self.timing["reconstruction"] = time.time() - t2
            return {
                "backbone_probability": bb_v[sl],
                "carbon_alpha_probability": ca_v[sl],
                "amino_acid_probability": jnp.moveaxis(aa_v[sl + (slice(None),)], -1, 0),
                "amino_acid_prediction": jnp.argmax(aa_v[sl + (slice(None),)], axis=-1),
            }
        bb = np.asarray(bb_v[sl])
        ca = np.asarray(ca_v[sl])
        aa = np.moveaxis(np.asarray(aa_v[sl + (slice(None),)]), -1, 0)
        aa_pred = np.argmax(aa, axis=0)
        self.timing["reconstruction"] = time.time() - t2
        return {
            "backbone_probability": bb,
            "carbon_alpha_probability": ca,
            "amino_acid_probability": aa,
            "amino_acid_prediction": aa_pred,
        }
