"""Training data pipeline.

Three data paths:

  * :class:`NpzGridsDataset` — drop-in reader for the reference's on-disk
    ``Grids`` layout (``normalized_maps/<id>/grid_*.npz`` with sibling
    ``BB_masks`` / ``CA_masks`` / ``AA_masks`` / 24 ``<type>_encodings``
    directories resolved by path substitution, dataset.py:136-155), so
    datasets prepared for the reference train here unchanged.
  * :func:`build_training_grids` — array-native generation straight from a
    (map, model PDB) pair: prepare map -> rasterize masks + encodings ->
    window everything -> keep windows whose density max >= 0.01 (the filter
    that defines the reference training set,
    create_grids_for_normalized_map.py:78).  Replaces the reference's
    10-step shell pipeline (create_training_data.sh:48-59).
  * :func:`synthetic_batch` — deterministic fake data for tests/benchmarks.

Augmentation and AF3 blanking happen on device inside the train step
(mica_tpu.train.trainer), not here — the loader only moves bytes.
"""

from __future__ import annotations

import dataclasses
from glob import glob
from pathlib import Path
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

from ..io import pdb as pdb_io
from ..ops import masks as mask_ops
from ..ops import window as window_ops
from ..ops.rasterize import CHANNEL_NAMES, rasterize_af3_encoding

Batch = Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]


class NpzGridsDataset:
    """Reads the reference's pre-generated training grids."""

    def __init__(self, grid_paths: Sequence[str]):
        self.paths = list(grid_paths)

    @classmethod
    def from_root(cls, root: str) -> "NpzGridsDataset":
        paths = sorted(glob(str(Path(root) / "normalized_maps" / "*" / "*.npz")))
        return cls(paths)

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, i: int):
        p = self.paths[i]
        density = np.load(p)["grid"].astype(np.float32)
        bb = np.load(p.replace("normalized_maps", "BB_masks"))["grid"].astype(np.int32)
        ca = np.load(p.replace("normalized_maps", "CA_masks"))["grid"].astype(np.int32)
        aa = np.load(p.replace("normalized_maps", "AA_masks"))["grid"].astype(np.int32)
        feats = [
            np.load(p.replace("normalized_maps", f"{t}_encodings"))["grid"]
            for t in CHANNEL_NAMES
        ]
        af3 = np.stack(feats, axis=0).astype(np.float32)
        return density, af3, bb, ca, aa


@dataclasses.dataclass
class ArrayDataset:
    """In-memory training windows."""

    density: np.ndarray  # (N, W, W, W) float32
    af3: np.ndarray  # (N, 24, W, W, W) uint8/float32
    bb: np.ndarray  # (N, W, W, W) int32
    ca: np.ndarray
    aa: np.ndarray

    def __len__(self) -> int:
        return len(self.density)

    def __getitem__(self, i: int):
        return (
            self.density[i].astype(np.float32),
            self.af3[i].astype(np.float32),
            self.bb[i].astype(np.int32),
            self.ca[i].astype(np.int32),
            self.aa[i].astype(np.int32),
        )

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, density=self.density, af3=self.af3.astype(np.uint8),
            bb=self.bb.astype(np.int8), ca=self.ca.astype(np.int8),
            aa=self.aa.astype(np.int8),
        )

    @classmethod
    def load(cls, path: str) -> "ArrayDataset":
        d = np.load(path)
        return cls(d["density"], d["af3"], d["bb"], d["ca"], d["aa"])


def build_training_grids(
    map_path: str,
    model_pdb_path: str,
    docked_af3_pdb_path: Optional[str] = None,
    density_threshold: float = 0.01,
) -> ArrayDataset:
    """(density map, deposited model[, docked AF3 model]) -> training windows.

    Windows are kept only when the density window max >= ``density_threshold``
    (matching the filter that defines the reference's sample set).  If no
    AF3 model is given, the deposited model doubles as the encoding source
    (the reference generates encodings from ``*af3_docked*.pdb``).
    """
    import jax.numpy as jnp

    from ..infer.pipeline import prepare_map

    prepared = prepare_map(map_path)
    geom = dict(
        origin=prepared.origin, voxel_size=prepared.voxel_size,
        nstart=prepared.offset,
    )
    atoms = pdb_io.parse_pdb(model_pdb_path)
    shape = prepared.volume.shape

    bb = mask_ops.backbone_mask(atoms, shape, **geom)
    ca = mask_ops.carbon_alpha_mask(atoms, shape, **geom)
    aa = mask_ops.amino_acid_mask(atoms, shape, **geom)

    enc_atoms = (
        pdb_io.parse_pdb(docked_af3_pdb_path)
        if docked_af3_pdb_path is not None
        else atoms
    )
    af3 = rasterize_af3_encoding(enc_atoms, shape, **geom)

    dens_w = np.asarray(window_ops.extract_windows(jnp.asarray(prepared.volume)))
    keep = dens_w.reshape(len(dens_w), -1).max(axis=1) >= density_threshold

    def win_int(vol):
        return np.asarray(
            window_ops.extract_windows(jnp.asarray(vol.astype(np.float32)))
        ).astype(np.int32)

    bb_w, ca_w, aa_w = win_int(bb), win_int(ca), win_int(aa)
    af3_w = np.stack(
        [np.asarray(window_ops.extract_windows(jnp.asarray(af3[c]))) for c in range(24)],
        axis=1,
    )
    return ArrayDataset(
        density=dens_w[keep],
        af3=af3_w[keep].astype(np.uint8),
        bb=bb_w[keep], ca=ca_w[keep], aa=aa_w[keep],
    )


def train_val_split(
    n: int, val_fraction: float = 0.2, seed: int = 42
) -> Tuple[np.ndarray, np.ndarray]:
    """Shuffled split (counterpart of train.py:33-34's 80/20, seed 42)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_val = int(round(n * val_fraction))
    return perm[n_val:], perm[:n_val]


def batch_iterator(
    dataset, batch_size: int, indices: Optional[np.ndarray] = None,
    shuffle: bool = True, seed: int = 0, drop_last: bool = True,
) -> Iterator[Batch]:
    """Yield numpy batches (density, af3, bb, ca, aa)."""
    idx = np.arange(len(dataset)) if indices is None else np.asarray(indices)
    if shuffle:
        idx = np.random.default_rng(seed).permutation(idx)
    stop = len(idx) - (len(idx) % batch_size if drop_last else 0)
    for ofs in range(0, stop, batch_size):
        chunk = idx[ofs : ofs + batch_size]
        samples = [dataset[int(i)] for i in chunk]
        yield tuple(np.stack([s[f] for s in samples]) for f in range(5))


def synthetic_batch(
    batch_size: int = 4, size: int = 64, seed: int = 0
) -> Batch:
    rng = np.random.default_rng(seed)
    density = rng.random((batch_size, size, size, size), np.float32)
    af3 = (rng.random((batch_size, 24, size, size, size)) < 0.02).astype(np.float32)
    bb = rng.integers(0, 4, (batch_size, size, size, size), np.int32)
    ca = rng.integers(0, 4, (batch_size, size, size, size), np.int32)
    aa = rng.integers(0, 21, (batch_size, size, size, size), np.int32)
    return density, af3, bb, ca, aa
