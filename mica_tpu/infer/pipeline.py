"""Map-level preprocessing + prediction pipeline.

Covers the reference's ``getData`` + ``nnPred`` stages (modeler.py:673-760):
read the density map, resample to 1 Å, normalize to [0, 1], rasterize the
docked AF3 structure into the 24-channel encoding, run the sliding-window
predictor, and return the four prediction volumes — all in memory (the
reference round-trips every intermediate through per-channel MRCs and
per-window npz files; here nothing touches disk unless explicitly saved).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..io import mrc as mrc_io
from ..io import pdb as pdb_io
from ..ops.normalize import normalize_map
from ..ops.rasterize import rasterize_af3_encoding
from ..ops.resample import resample_to_voxel_size
from .engine import SlidingWindowPredictor

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class PreparedMap:
    """A normalized, 1 Å, canonical-XYZ density volume plus geometry."""

    volume: np.ndarray  # (X, Y, Z) float32 in [0, 1]
    offset: np.ndarray  # nstart offset per canonical axis (voxels)
    origin: np.ndarray  # header origin (Angstroms, XYZ)
    voxel_size: float  # target voxel size (1.0)
    source_path: Optional[str] = None

    def voxel_to_world(self, indices: np.ndarray) -> np.ndarray:
        from ..ops.rasterize import voxel_to_world

        return voxel_to_world(indices, self.origin, self.voxel_size, self.offset)

    def world_to_voxel(self, coords: np.ndarray) -> np.ndarray:
        from ..ops.rasterize import world_to_voxel

        return world_to_voxel(coords, self.origin, self.voxel_size, self.offset)


def prepare_map(
    map_path: str,
    target_voxel_size: float = 1.0,
) -> PreparedMap:
    """Read an MRC map, resample to ``target_voxel_size`` Å and normalize.

    Equivalent of preprocessing.py:80-148 + the axis canonicalization of
    create_grids.py:119-122, fused into one device computation.
    """
    t0 = time.time()
    from ..utils.jaxcache import ensure_compilation_cache

    ensure_compilation_cache()  # resample/normalize are shape-specialized
    # device programs; repeats of a map shape come from the disk cache
    vol = mrc_io.read_mrc(map_path)
    xyz, offset = vol.to_xyz()
    # spacing per canonical axis (crystal X/Y/Z)
    vs = vol.voxel_size

    resampled = resample_to_voxel_size(
        np.ascontiguousarray(xyz, np.float32), vs, target_voxel_size
    )
    normalized = np.asarray(normalize_map(resampled))
    logger.info(
        "prepared map %s: %s -> %s @ %.2f A in %.2fs",
        Path(map_path).name, xyz.shape, normalized.shape, target_voxel_size,
        time.time() - t0,
    )
    # nstart offsets were expressed in original voxels; after resampling to
    # 1 A they are Angstrom offsets (the reference preserves them verbatim,
    # preprocessing.py:145-147)
    return PreparedMap(
        volume=normalized,
        offset=np.asarray(offset, np.float64),
        origin=vol.origin_xyz,
        voxel_size=float(target_voxel_size),
        source_path=str(map_path),
    )


def build_af3_encoding(
    prepared: PreparedMap,
    docked_pdb_path: str,
    mode: str = "nearest",
) -> np.ndarray:
    """Rasterize the combined docked AF3 model onto the prepared map grid."""
    atoms = pdb_io.parse_pdb(docked_pdb_path)
    return rasterize_af3_encoding(
        atoms,
        prepared.volume.shape,
        origin=prepared.origin,
        voxel_size=prepared.voxel_size,
        nstart=prepared.offset,
        mode=mode,
    )


def save_normalized_map(prepared: PreparedMap, out_path: str) -> None:
    """Persist the normalized volume as MRC (sections=Z, rows=Y, cols=X)."""
    data = np.transpose(prepared.volume, (2, 1, 0)).astype(np.float32)
    mrc_io.write_mrc(
        out_path,
        data,
        voxel_size=prepared.voxel_size,
        origin=tuple(prepared.origin),
        nstart=tuple(int(v) for v in prepared.offset),
    )


def predict_map(
    map_path: str,
    params,
    docked_pdb_path: Optional[str] = None,
    batch_size: int = 0,
    dtype=None,
    mesh=None,
    base_filters: int = 64,
    core: int = 48,
    halo: int = 8,
    dump_windows_dir: Optional[str] = None,
    dump_format: str = "compact",
    predictor=None,
) -> Dict[str, np.ndarray]:
    """End-to-end: map file (+ optional docked AF3 model) -> prediction volumes.

    ``predictor`` reuses an existing :class:`SlidingWindowPredictor`
    (its compiled model program is map-size independent), so a batch of
    maps pays the heavy compile once; the returned dict carries the
    predictor under ``"predictor"`` for exactly that reuse.

    ``batch_size=0`` derives the batch from device memory (the reference's
    memory heuristic, predict.py:149-174).  ``core=0`` picks the window
    geometry minimizing computed voxels for this map (``best_core``; the
    per-window InstanceNorm stats then differ slightly from the reference's
    fixed 64/48 decomposition).  ``dump_windows_dir`` writes one
    ``.npz`` per window with the post-processed core blocks — a debugging /
    parity-triage aid mirroring the reference's per-grid artifacts
    (predict.py:353-371); ``dump_format="reference"`` reproduces the
    reference's exact per-grid artifact layout for external consumers."""
    import jax.numpy as jnp

    from .engine import auto_batch_size, best_core

    prepared = prepare_map(map_path)
    if predictor is not None:
        # a reused predictor's geometry is fixed (its compiled programs
        # depend on core/halo/batch); per-map auto-geometry would silently
        # diverge from it
        core, halo = predictor.core, predictor.halo
        batch_size = predictor.batch_size
    else:
        batch_size = batch_size or auto_batch_size()
        if core == 0:
            core, batch_size = best_core(prepared.volume.shape, halo,
                                         max_batch=batch_size)
    encoding = None
    if docked_pdb_path is not None:
        # an explicitly requested docked model must exist: silently
        # degrading to density-only prediction returns materially
        # different volumes with nothing distinguishing the two runs
        if not Path(docked_pdb_path).exists():
            raise FileNotFoundError(
                f"docked AF3 model not found: {docked_pdb_path}")
        encoding = build_af3_encoding(prepared, docked_pdb_path)

    if predictor is None:
        predictor = SlidingWindowPredictor(
            params,
            batch_size=batch_size,
            dtype=dtype if dtype is not None else jnp.bfloat16,
            mesh=mesh,
            base_filters=base_filters,
            core=core,
            halo=halo,
        )
    out = predictor.predict_volume(
        prepared.volume, encoding, dump_windows_dir=dump_windows_dir,
        dump_format=dump_format,
    )
    out["prepared_map"] = prepared
    out["predictor"] = predictor
    out["timing"] = dict(predictor.timing)
    return out
