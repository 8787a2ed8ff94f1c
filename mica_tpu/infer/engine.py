"""Sliding-window inference engine, fully on-device and SPMD-shardable.

Re-design of the reference predictor (utils/predict.py:307-512).  The
reference writes one ``.npz`` per window to disk and re-reads them all to
paste central cores into numpy volumes; here the whole map stays resident
in HBM and each batch step

  1. slices a batch of 64-cube windows (density + 24-channel AF3 encoding)
     out of the padded volumes with ``dynamic_slice`` (no host traffic),
  2. runs the MICA forward pass (bfloat16 on the MXU by default),
  3. applies the softmax postprocessing (drop the "neighbor" class from the
     backbone/CA logits and keep the atom-class probability; 20-way amino
     acid probabilities — predict.py:342-349),
  4. scatters each window's central 48-cube core into the per-quantity
     output volumes with ``dynamic_update_slice`` (cores tile the volume,
     so writes never overlap).

The pipeline is split into three jit programs: a cheap window gather and a
cheap core scatter (re-specialized per map shape) around the expensive
model step whose shapes depend only on (batch, window) — so the heavy XLA
compile happens once ever per configuration and is served from the
persistent compilation cache across maps and processes.

Multi-chip: the window batch is sharded over the mesh's ``data`` axis; the
core scatter produces replicated outputs, so XLA inserts the ICI
all-gather that replaces the reference's serial paste-back loop.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.mica import MICA
from ..ops.window import CORE, HALO, window_counts, window_starts
from ..parallel.mesh import DATA_AXIS, make_mesh, pad_to_multiple

NUM_AA = 20
NUM_AF_CHANNELS = 24


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
    """Memory-derived batch size, capped at 8 (predict.py:149-174 analog).

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
    bb3 = jnp.concatenate([bb[..., :1], bb[..., 2:]], axis=-1)
    ca3 = jnp.concatenate([ca[..., :1], ca[..., 2:]], axis=-1)
    bb_prob = jax.nn.softmax(bb3, axis=-1)[..., 2:3]
    ca_prob = jax.nn.softmax(ca3, axis=-1)[..., 2:3]
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
        averaging crosses slab boundaries)."""
        if blend not in ("core", "average"):
            raise ValueError(f"unknown blend mode {blend!r}")
        self.blend = blend
        self.shard_volumes = bool(shard_volumes)
        self.model = MICA(base=base_filters, dtype=dtype)
        self.params = params
        self.core = int(core)
        self.halo = int(halo)
        self.window = self.core + 2 * self.halo
        self.batch_size = int(batch_size)
        self.mesh = mesh if mesh is not None else (make_mesh() if use_mesh else None)
        if self.shard_volumes and (self.mesh is None or self.blend != "core"):
            raise ValueError("shard_volumes requires a mesh and blend='core'")
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            self.batch_size = pad_to_multiple(self.batch_size, n_dev)
        self.timing: Dict[str, float] = {}
        self._model_step = {}
        self._gather = {}
        self._scatter = {}
        self._scatter_sharded = {}
        self._zero_cores = {}
        self._shardings = None
        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            bshard = NamedSharding(self.mesh, P(DATA_AXIS))
            self._shardings = (repl, bshard)

    # ------------------------------------------------------------------
    # jit pieces
    # ------------------------------------------------------------------
    def _build_model_step(self, with_af: bool, full: Optional[bool] = None):
        """Heavy step: (B,w,w,w) windows (+ packed uint32 AF windows) ->
        core probability blocks (or full-window blocks when ``full``).

        Shapes depend only on (batch, window) — compiled once, served from
        the persistent cache for every map afterwards.  The 24-channel AF
        encoding arrives as uint32 bitfields and is unpacked INSIDE this
        program, so the float windows never round-trip through HBM between
        the gather and the model.
        """
        if full is None:
            full = self.blend == "average"
        key = (with_af, full)
        if key in self._model_step:
            return self._model_step[key]
        model, core_n, halo = self.model, self.core, self.halo

        def step(params, windows, af_packed):
            if af_packed is None:
                af = None
            elif af_packed.dtype == jnp.uint32:
                af = unpack_af_bits(af_packed, windows.dtype)
            else:  # float encodings (e.g. trilinear splat) pass through
                af = af_packed.astype(windows.dtype)
            bb, ca, aa = model.apply({"params": params}, windows, af)
            bb_p, ca_p, aa_p = postprocess_logits(bb, ca, aa)
            sl = slice(None) if full else slice(halo, halo + core_n)
            return (
                bb_p[:, sl, sl, sl, 0],
                ca_p[:, sl, sl, sl, 0],
                aa_p[:, sl, sl, sl, :],
            )

        if self._shardings is not None:
            repl, bshard = self._shardings
            fn = jax.jit(
                step,
                in_shardings=(repl, bshard, bshard if with_af else None),
                out_shardings=(bshard, bshard, bshard),
            )
        else:
            fn = jax.jit(step)
        self._model_step[key] = fn
        return fn

    def _build_gather(self, with_af: bool):
        """Cheap window gather; the jit wrapper is cached on self so repeat
        calls on the same map shape hit jax's shape-keyed trace cache
        instead of re-tracing a fresh closure every predict_volume.

        Takes the full device-resident ``starts`` array plus a scalar
        offset (one host->device upload per map, not one per batch) and
        returns AF windows still bit-packed (the model step unpacks)."""
        if with_af in self._gather:
            return self._gather[with_af]
        w, bsz = self.window, self.batch_size

        def gather(padded_map, padded_af, all_starts, ofs):
            starts = jax.lax.dynamic_slice(all_starts, (ofs, 0), (bsz, 3))

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

            pairs = [one(starts[b]) for b in range(bsz)]
            wins = jnp.stack([p[0] for p in pairs])
            afs = None if pairs[0][1] is None else jnp.stack(
                [p[1] for p in pairs]
            )
            return wins[..., None], afs, starts

        if self._shardings is not None:
            repl, bshard = self._shardings
            fn = jax.jit(
                gather,
                in_shardings=(repl, repl if with_af else None, repl, repl),
                out_shardings=(bshard, bshard if with_af else None, repl),
            )
        else:
            fn = jax.jit(gather)
        self._gather[with_af] = fn
        return fn

    def _build_scatter(self, full_in: bool = False):
        """Cheap core scatter (replicated outputs); jit wrapper cached.

        ``full_in``: the incoming blocks are FULL windows (the model step
        ran with ``full=True``, e.g. for reference-layout artifact dumps);
        in 'core' blend the core is sliced off here before the paste."""
        if full_in in self._scatter:
            return self._scatter[full_in]
        core_n, halo = self.core, self.halo
        average = self.blend == "average"
        bsz = self.batch_size

        def scatter(vols, cores, all_starts, ofs, n_valid):
            starts = jax.lax.dynamic_slice(all_starts, (ofs, 0), (bsz, 3))
            bb_v, ca_v, aa_v, cnt_v = vols
            bb_c, ca_c, aa_c = cores
            if full_in and not average:
                c = slice(halo, halo + core_n)
                bb_c = bb_c[:, c, c, c]
                ca_c = ca_c[:, c, c, c]
                aa_c = aa_c[:, c, c, c, :]
            for i in range(starts.shape[0]):
                s = starts[i]
                if average:
                    # accumulate full windows at (start - halo) in the
                    # halo-padded accumulator frame (see predict_volume).
                    # Batch-padding entries (i >= n_valid, repeats of the
                    # last window) are masked to weight 0 — accumulating
                    # them would over-weight that window in seam overlaps.
                    wgt = (i < n_valid).astype(jnp.float32)
                    pos = (s[0], s[1], s[2])
                    blk = jax.lax.dynamic_slice(
                        bb_v, pos, bb_c[i].shape) + wgt * bb_c[i]
                    bb_v = jax.lax.dynamic_update_slice(bb_v, blk, pos)
                    blk = jax.lax.dynamic_slice(
                        ca_v, pos, ca_c[i].shape) + wgt * ca_c[i]
                    ca_v = jax.lax.dynamic_update_slice(ca_v, blk, pos)
                    blk = jax.lax.dynamic_slice(
                        aa_v, pos + (0,), aa_c[i].shape) + wgt * aa_c[i]
                    aa_v = jax.lax.dynamic_update_slice(aa_v, blk, pos + (0,))
                    blk = jax.lax.dynamic_slice(
                        cnt_v, pos, bb_c[i].shape) + wgt
                    cnt_v = jax.lax.dynamic_update_slice(cnt_v, blk, pos)
                else:
                    bb_v = jax.lax.dynamic_update_slice(bb_v, bb_c[i], (s[0], s[1], s[2]))
                    ca_v = jax.lax.dynamic_update_slice(ca_v, ca_c[i], (s[0], s[1], s[2]))
                    aa_v = jax.lax.dynamic_update_slice(aa_v, aa_c[i], (s[0], s[1], s[2], 0))
            return bb_v, ca_v, aa_v, cnt_v

        if self._shardings is not None:
            repl, bshard = self._shardings
            fn = jax.jit(
                scatter,
                in_shardings=((repl,) * 4, (bshard,) * 3, repl, repl, repl),
                out_shardings=(repl,) * 4,
                donate_argnums=(0,),
            )
        else:
            fn = jax.jit(scatter, donate_argnums=(0,))
        self._scatter[full_in] = fn
        return fn

    def _build_scatter_sharded(self, x_local: int):
        """Core scatter into X-sharded accumulators via shard_map.

        Each device owns a contiguous ``x_local``-plane slab of the padded
        volume; cores are 48-aligned and ``x_local`` is a multiple of the
        core size, so every core belongs to exactly one device.  Each
        device scans the (replicated) batch of cores and writes the ones
        whose X start falls in its slab — the write itself is masked by
        re-writing the existing block when the core is foreign.
        """
        if x_local in self._scatter_sharded:
            return self._scatter_sharded[x_local]
        core_n, bsz, mesh = self.core, self.batch_size, self.mesh

        def scatter_local(vols, cores, all_starts, ofs, n_valid):
            bb_v, ca_v, aa_v, cnt_v = vols
            bb_c, ca_c, aa_c = cores
            x_off = jax.lax.axis_index(DATA_AXIS).astype(jnp.int32) * x_local
            starts = jax.lax.dynamic_slice(all_starts, (ofs, 0), (bsz, 3))
            for i in range(bsz):
                s = starts[i]
                lx = s[0] - x_off
                mine = (lx >= 0) & (lx < x_local)
                pos = jnp.clip(lx, 0, x_local - core_n)
                for vi, (v, c3) in enumerate(((bb_v, bb_c), (ca_v, ca_c))):
                    old = jax.lax.dynamic_slice(
                        v, (pos, s[1], s[2]), c3[i].shape)
                    blk = jnp.where(mine, c3[i], old)
                    v = jax.lax.dynamic_update_slice(v, blk, (pos, s[1], s[2]))
                    if vi == 0:
                        bb_v = v
                    else:
                        ca_v = v
                old = jax.lax.dynamic_slice(
                    aa_v, (pos, s[1], s[2], 0), aa_c[i].shape)
                blk = jnp.where(mine, aa_c[i], old)
                aa_v = jax.lax.dynamic_update_slice(
                    aa_v, blk, (pos, s[1], s[2], 0))
            return bb_v, ca_v, aa_v, cnt_v

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
        # and therefore produce identical outputs: compute one
        # representative and broadcast its cores.  Real maps are typically
        # 40-60% empty windows, so this roughly halves the compute while
        # staying output-identical.
        counts = window_counts(shape, core_n)
        nonempty = _window_nonempty(np_padded, counts, core_n, halo)
        if with_af:
            nonempty |= _window_nonempty(np_af, counts, core_n, halo)
        empty = ~nonempty
        compute_starts = starts[~empty]
        empty_starts = starts[empty]
        self.timing["n_empty"] = int(empty.sum())

        starts = compute_starts
        bsz = self.batch_size
        n_pad = (-starts.shape[0]) % bsz
        if n_pad:
            starts = np.concatenate([starts, np.repeat(starts[-1:], n_pad, axis=0)])

        average = self.blend == "average"
        acc_shape = tuple(np_padded.shape) if average else padded_shape
        vols = (
            jnp.zeros(acc_shape, jnp.float32),
            jnp.zeros(acc_shape, jnp.float32),
            jnp.zeros(acc_shape + (NUM_AA,), jnp.float32),
            jnp.zeros(acc_shape if average else (1, 1, 1), jnp.float32),
        )
        if self.shard_volumes:
            xs = NamedSharding(self.mesh, P(DATA_AXIS))
            xs4 = NamedSharding(self.mesh, P(DATA_AXIS, None, None, None))
            vols = (
                jax.device_put(vols[0], xs),
                jax.device_put(vols[1], xs),
                jax.device_put(vols[2], xs4),
                jax.device_put(vols[3], self._shardings[0]),
            )
        elif self._shardings is not None:
            vols = jax.device_put(vols, self._shardings[0])

        gather = self._build_gather(with_af)
        full_out = average or dump_reference
        if self.shard_volumes:
            scatter = self._build_scatter_sharded(
                padded_shape[0] // self.mesh.devices.size
            )
        else:
            scatter = self._build_scatter(full_in=dump_reference and not average)
        model_step = self._build_model_step(with_af, full=full_out)
        self.timing["setup"] = time.time() - t0

        dump_dir = None
        if dump_windows_dir is not None:
            import pathlib

            dump_dir = pathlib.Path(dump_windows_dir)
            dump_dir.mkdir(parents=True, exist_ok=True)

        def dump(cores, batch_starts, n_valid):
            bb_c, ca_c, aa_c = (np.asarray(c) for c in cores)
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
        n_compute = starts.shape[0] - n_pad
        starts_dev = jnp.asarray(starts) if starts.shape[0] else None
        for ofs in range(0, starts.shape[0], bsz):
            wins, afs, batch = gather(padded_map, padded_af, starts_dev, ofs)
            cores = model_step(self.params, wins, afs)
            n_valid = max(0, min(bsz, n_compute - ofs))
            vols = scatter(vols, cores, batch, 0, jnp.int32(n_valid))
            if dump_dir is not None:
                dump(cores, starts[ofs : ofs + bsz], n_valid)

        if len(empty_starts):
            # one forward on the all-zero window, broadcast into every
            # empty position (identical inputs -> identical outputs);
            # cached across maps — same params, same all-zero input
            zkey = (with_af, None if np_af is None else np_af.ndim, full_out)
            z_cores = self._zero_cores.get(zkey)
            if z_cores is None:
                zero_wins = jnp.zeros((bsz, win, win, win, 1), jnp.float32)
                if not with_af:
                    zero_afs = None
                elif np_af.ndim == 4:
                    zero_afs = jnp.zeros(
                        (bsz, win, win, win, np_af.shape[3]), jnp.float32)
                else:
                    zero_afs = jnp.zeros((bsz, win, win, win), jnp.uint32)
                z_cores = model_step(self.params, zero_wins, zero_afs)
                self._zero_cores[zkey] = z_cores
            n_empty = len(empty_starts)
            n_pad_e = (-n_empty) % bsz
            if n_pad_e:
                empty_starts = np.concatenate(
                    [empty_starts,
                     np.repeat(empty_starts[-1:], n_pad_e, axis=0)]
                )
            empty_dev = jnp.asarray(empty_starts)
            for ofs in range(0, len(empty_starts), bsz):
                n_valid = max(0, min(bsz, n_empty - ofs))
                vols = scatter(vols, z_cores, empty_dev, ofs,
                               jnp.int32(n_valid))
                if dump_dir is not None:
                    # identical outputs for identical (all-zero) inputs:
                    # the representative blocks stand in for each window
                    dump(z_cores, empty_starts[ofs : ofs + bsz], n_valid)
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
